// stereo_infer: run an exported StableHLO stereo model on an image pair.
//
// TPU-native counterpart of the reference's TensorRT inference node
// (/root/reference/kitti_publisher/src/kitti_publisher_cuda_node.cpp):
//   .plan + enqueueV3  ->  .stablehlo.mlir + PJRT Execute.
//
// Usage:
//   stereo_infer --model StereoModel.stablehlo.mlir --plugin libtpu.so \
//       --left l.png --right r.png --out disp.png [--vis disp_color.png] \
//       [--height 384 --width 1248] [--fx 707.0912 --baseline 0.536] \
//       [--conf_out conf.png --conf_threshold 0.5]   (2-output engines) \
//       [--frames 50 --warmup 3]                     (steady-state timing)
//
// With a 2-output (disparity, confidence) engine the validity mask is
// range AND conf>=threshold, per the reference confidence node
// (/root/reference/kitti_publisher_conf/src/kitti_publisher_conf_cuda_node.cpp:571-575).

#include <algorithm>
#include <chrono>
#include <cstdio>
#include <string>
#include <vector>

#include <opencv2/opencv.hpp>

#include "pjrt_runner.h"
#include "stereo_pipeline.h"

namespace {

std::string ReadFile(const std::string& path) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (f == nullptr) return "";
  std::fseek(f, 0, SEEK_END);
  const long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string data(static_cast<size_t>(size), '\0');
  const size_t rd = std::fread(data.data(), 1, data.size(), f);
  std::fclose(f);
  data.resize(rd);
  return data;
}

struct Options {
  std::string model, plugin, left, right, out, vis, conf_out;
  std::string compile_options;  // file of serialized xla.CompileOptionsProto
  int height = 384, width = 1248;
  float max_disp = 192.0f;
  float conf_threshold = 0.5f;  // reference slider default range 0..1
  int frames = 0, warmup = 3;   // frames>0: steady-state timing loop
  double fx = 707.0912, baseline = 0.536;  // reference launch defaults
  std::vector<esmstereo::PjrtRunner::Option> plugin_options;
};

bool ParseArgs(int argc, char** argv, Options* o) {
  for (int i = 1; i + 1 < argc; i += 2) {
    const std::string k = argv[i], v = argv[i + 1];
    if (k == "--plugin_option") {
      const auto eq = v.find('=');
      if (eq == std::string::npos) return false;
      esmstereo::PjrtRunner::Option po;
      po.name = v.substr(0, eq);
      const std::string val = v.substr(eq + 1);
      po.is_int = !val.empty() &&
                  val.find_first_not_of("0123456789-") == std::string::npos;
      if (po.is_int) po.int_value = std::stoll(val);
      else po.str_value = val;
      o->plugin_options.push_back(std::move(po));
      continue;
    }
    if (k == "--model") o->model = v;
    else if (k == "--plugin") o->plugin = v;
    else if (k == "--left") o->left = v;
    else if (k == "--right") o->right = v;
    else if (k == "--out") o->out = v;
    else if (k == "--vis") o->vis = v;
    else if (k == "--conf_out") o->conf_out = v;
    else if (k == "--conf_threshold") o->conf_threshold = std::stof(v);
    else if (k == "--frames") o->frames = std::stoi(v);
    else if (k == "--warmup") o->warmup = std::stoi(v);
    else if (k == "--height") o->height = std::stoi(v);
    else if (k == "--width") o->width = std::stoi(v);
    else if (k == "--max_disp") o->max_disp = std::stof(v);
    else if (k == "--fx") o->fx = std::stod(v);
    else if (k == "--baseline") o->baseline = std::stod(v);
    else if (k == "--compile_options") o->compile_options = v;
    else { std::fprintf(stderr, "unknown flag %s\n", k.c_str()); return false; }
  }
  return !o->model.empty() && !o->plugin.empty() && !o->left.empty() &&
         !o->right.empty() && !o->out.empty();
}

}  // namespace

int main(int argc, char** argv) {
  Options opt;
  if (!ParseArgs(argc, argv, &opt)) {
    std::fprintf(stderr, "required: --model --plugin --left --right --out\n");
    return 2;
  }

  cv::Mat left_bgr = cv::imread(opt.left, cv::IMREAD_COLOR);
  cv::Mat right_bgr = cv::imread(opt.right, cv::IMREAD_COLOR);
  if (left_bgr.empty() || right_bgr.empty()) {
    std::fprintf(stderr, "failed to read input images\n");
    return 1;
  }
  cv::Mat left_rgb, right_rgb;
  cv::cvtColor(left_bgr, left_rgb, cv::COLOR_BGR2RGB);
  cv::cvtColor(right_bgr, right_rgb, cv::COLOR_BGR2RGB);

  esmstereo::PreprocessConfig pre;
  pre.target = {opt.height, opt.width};
  std::vector<float> left_in, right_in;
  if (!esmstereo::PreprocessImage(left_rgb.data, left_rgb.rows, left_rgb.cols,
                                  pre, &left_in) ||
      !esmstereo::PreprocessImage(right_rgb.data, right_rgb.rows,
                                  right_rgb.cols, pre, &right_in)) {
    std::fprintf(stderr, "image larger than engine shape %dx%d\n",
                 opt.height, opt.width);
    return 1;
  }

  esmstereo::PjrtRunner runner(opt.plugin, opt.plugin_options);
  if (!opt.compile_options.empty()) {
    const std::string co = ReadFile(opt.compile_options);
    if (co.empty()) {
      std::fprintf(stderr, "failed to read %s\n", opt.compile_options.c_str());
      return 1;
    }
    runner.set_compile_options(co);
  }
  if (auto e = runner.Initialize(); !e.empty()) {
    std::fprintf(stderr, "PJRT init failed: %s\n", e.c_str());
    return 1;
  }
  std::fprintf(stderr, "PJRT platform: %s\n",
               runner.platform_name().c_str());

  const std::string module = ReadFile(opt.model);
  if (module.empty()) {
    std::fprintf(stderr, "failed to read %s\n", opt.model.c_str());
    return 1;
  }
  auto t0 = std::chrono::steady_clock::now();
  if (auto e = runner.Compile(module); !e.empty()) {
    std::fprintf(stderr, "compile failed: %s\n", e.c_str());
    return 1;
  }
  auto t1 = std::chrono::steady_clock::now();
  std::fprintf(stderr, "compiled in %.1f s\n",
               std::chrono::duration<double>(t1 - t0).count());

  const std::vector<int64_t> dims = {1, opt.height, opt.width, 3};
  std::vector<esmstereo::PjrtRunner::Tensor> inputs(2);
  inputs[0].dims = dims;
  inputs[0].data = std::move(left_in);
  inputs[1].dims = dims;
  inputs[1].data = std::move(right_in);

  std::vector<esmstereo::PjrtRunner::Tensor> outputs;
  if (opt.frames > 0) {
    // Steady-state per-frame loop: the counterpart of the reference
    // node's per-frame enqueueV3 timing (:361-380). Inputs upload once;
    // "anchored" frames each include the full D2H readback, "pipelined"
    // amortises one readback over the whole chain (bench.py's
    // chained-scan rationale — on tunneled platforms only a D2H anchor
    // provably blocks, so single-execute walls are not device time).
    esmstereo::PjrtRunner::TimedStats st;
    if (auto e = runner.TimedRun(0, inputs, opt.warmup, opt.frames, &st,
                                 &outputs);
        !e.empty()) {
      std::fprintf(stderr, "timed run failed: %s\n", e.c_str());
      return 1;
    }
    std::printf(
        "{\"frames\": %d, \"warmup\": %d, "
        "\"anchored_ms_mean\": %.3f, \"anchored_ms_median\": %.3f, "
        "\"anchored_fps\": %.2f, \"pipelined_ms\": %.3f, "
        "\"pipelined_fps\": %.2f}\n",
        st.frames, opt.warmup, st.anchored_ms_mean, st.anchored_ms_median,
        1e3 / st.anchored_ms_median, st.pipelined_ms,
        1e3 / st.pipelined_ms);
  } else {
    t0 = std::chrono::steady_clock::now();
    if (auto e = runner.Execute(inputs, &outputs); !e.empty()) {
      std::fprintf(stderr, "execute failed: %s\n", e.c_str());
      return 1;
    }
    t1 = std::chrono::steady_clock::now();
    const double ms = std::chrono::duration<double>(t1 - t0).count() * 1e3;
    std::fprintf(stderr,
                 "single execute round-trip: %.2f ms (dispatch+RPC+D2H "
                 "wall — NOT steady-state; use --frames N for per-frame "
                 "timing)\n", ms);
  }

  esmstereo::PostprocessConfig post;
  post.padded = {opt.height, opt.width};
  post.original = {left_rgb.rows, left_rgb.cols};
  post.max_disp = opt.max_disp;
  std::vector<uint16_t> disp_u16;
  const bool has_conf = outputs.size() >= 2;
  std::vector<float> conf_map;
  if (has_conf) {
    // 2-output (disparity, confidence) engine
    // (export_stablehlo.py --confidence): validity = range AND
    // conf >= threshold, per the reference conf node (:571-575).
    esmstereo::PostprocessDisparityConf(
        outputs[0].data.data(), outputs[1].data.data(), opt.conf_threshold,
        post, &disp_u16, &conf_map);
  } else {
    esmstereo::PostprocessDisparity(outputs[0].data.data(), post,
                                    &disp_u16);
  }

  cv::Mat disp(left_rgb.rows, left_rgb.cols, CV_16UC1, disp_u16.data());
  cv::imwrite(opt.out, disp);
  std::fprintf(stderr, "wrote %s\n", opt.out.c_str());

  if (has_conf && !opt.conf_out.empty()) {
    // confidence as 16-bit x65535 (sigmoid output in [0,1])
    cv::Mat conf16(left_rgb.rows, left_rgb.cols, CV_16UC1);
    for (int y = 0; y < left_rgb.rows; ++y) {
      for (int x = 0; x < left_rgb.cols; ++x) {
        const float c = conf_map[static_cast<size_t>(y) * left_rgb.cols + x];
        conf16.at<uint16_t>(y, x) = static_cast<uint16_t>(
            std::min(std::max(c, 0.0f), 1.0f) * 65535.0f);
      }
    }
    cv::imwrite(opt.conf_out, conf16);
    std::fprintf(stderr, "wrote %s (conf x65535, threshold %.2f)\n",
                 opt.conf_out.c_str(), opt.conf_threshold);
  }

  if (!opt.vis.empty()) {
    cv::Mat disp8, color;
    disp.convertTo(disp8, CV_8UC1, 255.0 / (opt.max_disp * 256.0));
    cv::applyColorMap(disp8, color, cv::COLORMAP_MAGMA);
    // centre-pixel depth overlay, like the reference node (:103-115)
    const uint16_t centre =
        disp_u16[(left_rgb.rows / 2) * left_rgb.cols + left_rgb.cols / 2];
    if (centre > 0) {
      const double depth = opt.fx * opt.baseline / (centre / 256.0);
      char buf[64];
      std::snprintf(buf, sizeof(buf), "depth@centre: %.2f m", depth);
      cv::putText(color, buf, {20, 40}, cv::FONT_HERSHEY_SIMPLEX, 1.0,
                  {255, 255, 255}, 2);
    }
    cv::imwrite(opt.vis, color);
    std::fprintf(stderr, "wrote %s\n", opt.vis.c_str());
  }
  return 0;
}
