// viz_tool: file-driven harness for golden-testing the native deployment
// visualization (stereo_viz) against the Python renderers
// (tests/test_serving_viz.py).
//
// Modes:
//   viz_tool stacked <left_bgr.u8.bin> h w <disp.f32.bin> max_disp fps
//            <out.png>
//       tools/save_vid.py-parity frame (JET + FPS overlay).
//   viz_tool overlay <left_bgr.u8.bin> h w <disp.f32.bin> max_disp fx
//            baseline elapsed_ms <out.png> [record.avi]
//       reference visualize_and_record_disparity parity frame
//       (/root/reference/kitti_publisher/src/kitti_publisher_cuda_node.cpp:53-133):
//       range-masked disparity, MAGMA over the valid mask, center depth,
//       HZ overlay; optionally appends the frame to an MJPG recording.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <opencv2/opencv.hpp>

#include "stereo_viz.h"

namespace {

std::vector<char> ReadAll(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (f == nullptr) {
    std::fprintf(stderr, "viz_tool: cannot open %s\n", path);
    std::exit(3);
  }
  std::fseek(f, 0, SEEK_END);
  const long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> data(static_cast<size_t>(n));
  if (std::fread(data.data(), 1, data.size(), f) != data.size()) {
    std::fprintf(stderr, "viz_tool: short read on %s\n", path);
    std::exit(3);
  }
  std::fclose(f);
  return data;
}

cv::Mat LoadBgr(const char* path, int h, int w) {
  auto raw = ReadAll(path);
  if (raw.size() != static_cast<size_t>(h) * w * 3) {
    std::fprintf(stderr, "viz_tool: bgr size %zu != h*w*3 for %dx%d\n",
                 raw.size(), h, w);
    std::exit(3);
  }
  cv::Mat img(h, w, CV_8UC3);
  std::memcpy(img.data, raw.data(), raw.size());
  return img;
}

cv::Mat LoadDisp(const char* path, int h, int w) {
  auto raw = ReadAll(path);
  if (raw.size() != static_cast<size_t>(h) * w * sizeof(float)) {
    std::fprintf(stderr, "viz_tool: disp size %zu != h*w*4 for %dx%d\n",
                 raw.size(), h, w);
    std::exit(3);
  }
  cv::Mat disp(h, w, CV_32FC1);
  std::memcpy(disp.data, raw.data(), raw.size());
  return disp;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc == 9 && std::strcmp(argv[1], "stacked") == 0) {
    const int h = std::atoi(argv[3]), w = std::atoi(argv[4]);
    cv::Mat left = LoadBgr(argv[2], h, w);
    cv::Mat disp = LoadDisp(argv[5], h, w);
    const float max_disp = std::strtof(argv[6], nullptr);
    const double fps = std::strtod(argv[7], nullptr);
    cv::Mat frame = esmstereo::RenderStackedFrame(left, disp, max_disp,
                                                  fps);
    cv::imwrite(argv[8], frame);
    return 0;
  }
  if ((argc == 11 || argc == 12) && std::strcmp(argv[1], "overlay") == 0) {
    const int h = std::atoi(argv[3]), w = std::atoi(argv[4]);
    cv::Mat left = LoadBgr(argv[2], h, w);
    cv::Mat disp = LoadDisp(argv[5], h, w);
    const float max_disp = std::strtof(argv[6], nullptr);
    const double fx = std::strtod(argv[7], nullptr);
    const double baseline = std::strtod(argv[8], nullptr);
    const double elapsed_ms = std::strtod(argv[9], nullptr);

    // range masking + x256, as the reference node's publish path
    // (kitti_publisher_cuda_node.cpp:568-577)
    cv::Mat valid = (disp > 0.0f) & (disp < max_disp);
    cv::Mat masked = disp.clone();
    masked.setTo(0, ~valid);
    cv::Mat disp16;
    masked.convertTo(disp16, CV_16UC1, 256.0);

    cv::Mat frame = esmstereo::RenderOverlayFrame(
        left, masked, disp16, valid, elapsed_ms, fx, baseline);
    cv::imwrite(argv[10], frame);
    if (argc == 12) {
      esmstereo::VideoRecorder rec(argv[11]);
      if (!rec.Write(frame)) {
        std::fprintf(stderr, "viz_tool: cannot open recorder %s\n",
                     argv[11]);
        return 4;
      }
    }
    return 0;
  }
  std::fprintf(stderr, "usage: %s stacked|overlay ...\n", argv[0]);
  return 2;
}
