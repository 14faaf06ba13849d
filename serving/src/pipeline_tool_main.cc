// pipeline_tool: file-driven harness for golden-testing the C++ pre/post
// processing against the Python implementations (tests/test_serving.py).
//
// Modes:
//   pipeline_tool selftest
//   pipeline_tool preprocess  <in_rgb.u8.bin> h w th tw <out.f32.bin>
//   pipeline_tool postprocess <in.f32.bin> ph pw oh ow max_disp <out.u16.bin>
//   pipeline_tool postprocess_conf <disp.f32.bin> <conf.f32.bin> ph pw oh ow
//                                  max_disp threshold <out.u16.bin>
//                                  <conf_out.f32.bin>
//   pipeline_tool eval_conf <est.f32.bin> <gt.f32.bin> <conf.f32.bin> h w
//                           max_disp threshold   (prints JSON to stdout)

#include <cassert>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "stereo_eval.h"
#include "stereo_pipeline.h"

namespace {

// User-input validation (file sizes, shape args): must survive NDEBUG —
// a truncated .bin would otherwise become an out-of-bounds read.
#define CHECK_INPUT(cond, ...)                            \
  do {                                                    \
    if (!(cond)) {                                        \
      std::fprintf(stderr, "pipeline_tool: " __VA_ARGS__); \
      std::fprintf(stderr, "\n");                         \
      std::exit(3);                                       \
    }                                                     \
  } while (0)

std::vector<char> ReadAll(const char* path) {
  FILE* f = std::fopen(path, "rb");
  CHECK_INPUT(f != nullptr, "cannot open %s", path);
  std::fseek(f, 0, SEEK_END);
  const long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> data(static_cast<size_t>(n));
  const size_t rd = std::fread(data.data(), 1, data.size(), f);
  CHECK_INPUT(rd == data.size(), "short read on %s (%zu of %zu bytes)",
              path, rd, data.size());
  std::fclose(f);
  return data;
}

void WriteAll(const char* path, const void* data, size_t bytes) {
  FILE* f = std::fopen(path, "wb");
  CHECK_INPUT(f != nullptr, "cannot open %s for writing", path);
  std::fwrite(data, 1, bytes, f);
  std::fclose(f);
}

int SelfTest() {
  // preprocess: a 1x1 white pixel into a 32x32 canvas (pad top+right)
  uint8_t white[3] = {255, 255, 255};
  esmstereo::PreprocessConfig pre;
  pre.target = {32, 32};
  std::vector<float> out;
  if (!esmstereo::PreprocessImage(white, 1, 1, pre, &out)) return 1;
  // pixel lands at row 31, col 0
  const float r = out[(31 * 32 + 0) * 3 + 0];
  assert(std::fabs(r - (1.0f - 0.485f) / 0.229f) < 1e-5);
  // padding is zero
  assert(out[0] == 0.0f);

  // median filter on a constant image with one outlier removes it
  std::vector<float> img(10 * 10, 5.0f), med(10 * 10);
  img[5 * 10 + 5] = 100.0f;
  esmstereo::MedianFilter5x5(img.data(), 10, 10, med.data());
  assert(med[5 * 10 + 5] == 5.0f);

  // postprocess: range masking + x256
  esmstereo::PostprocessConfig post;
  post.padded = {8, 8};
  post.original = {8, 8};
  post.median_filter = false;
  std::vector<float> disp(64, 10.0f);
  disp[0] = -1.0f;    // invalid
  disp[1] = 500.0f;   // > max_disp
  std::vector<uint16_t> u16;
  esmstereo::PostprocessDisparity(disp.data(), post, &u16);
  assert(u16[0] == 0 && u16[1] == 0);
  assert(u16[2] == 2560);
  std::puts("selftest ok");
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc >= 2 && std::strcmp(argv[1], "selftest") == 0) {
    return SelfTest();
  }
  if (argc == 8 && std::strcmp(argv[1], "preprocess") == 0) {
    const int h = std::atoi(argv[3]), w = std::atoi(argv[4]);
    const int th = std::atoi(argv[5]), tw = std::atoi(argv[6]);
    auto in = ReadAll(argv[2]);
    CHECK_INPUT(in.size() == static_cast<size_t>(h) * w * 3,
                "rgb size %zu != h*w*3 for %dx%d", in.size(), h, w);
    esmstereo::PreprocessConfig cfg;
    cfg.target = {th, tw};
    std::vector<float> out;
    if (!esmstereo::PreprocessImage(
            reinterpret_cast<const uint8_t*>(in.data()), h, w, cfg, &out)) {
      return 1;
    }
    WriteAll(argv[7], out.data(), out.size() * sizeof(float));
    return 0;
  }
  if (argc == 9 && std::strcmp(argv[1], "postprocess") == 0) {
    const int ph = std::atoi(argv[3]), pw = std::atoi(argv[4]);
    const int oh = std::atoi(argv[5]), ow = std::atoi(argv[6]);
    auto in = ReadAll(argv[2]);
    CHECK_INPUT(in.size() == static_cast<size_t>(ph) * pw * sizeof(float),
                "disp size %zu != ph*pw*4 for %dx%d", in.size(), ph, pw);
    esmstereo::PostprocessConfig cfg;
    cfg.padded = {ph, pw};
    cfg.original = {oh, ow};
    cfg.max_disp = std::strtof(argv[7], nullptr);
    std::vector<uint16_t> out;
    esmstereo::PostprocessDisparity(
        reinterpret_cast<const float*>(in.data()), cfg, &out);
    WriteAll(argv[8], out.data(), out.size() * sizeof(uint16_t));
    return 0;
  }
  if (argc == 12 && std::strcmp(argv[1], "postprocess_conf") == 0) {
    const int ph = std::atoi(argv[4]), pw = std::atoi(argv[5]);
    const int oh = std::atoi(argv[6]), ow = std::atoi(argv[7]);
    auto disp = ReadAll(argv[2]);
    auto conf = ReadAll(argv[3]);
    CHECK_INPUT(disp.size() == static_cast<size_t>(ph) * pw * sizeof(float),
                "disp size %zu != ph*pw*4 for %dx%d", disp.size(), ph, pw);
    CHECK_INPUT(conf.size() == disp.size(),
                "conf size %zu != disp size %zu", conf.size(), disp.size());
    esmstereo::PostprocessConfig cfg;
    cfg.padded = {ph, pw};
    cfg.original = {oh, ow};
    cfg.max_disp = std::strtof(argv[8], nullptr);
    const float threshold = std::strtof(argv[9], nullptr);
    std::vector<uint16_t> out;
    std::vector<float> conf_out;
    esmstereo::PostprocessDisparityConf(
        reinterpret_cast<const float*>(disp.data()),
        reinterpret_cast<const float*>(conf.data()), threshold, cfg, &out,
        &conf_out);
    WriteAll(argv[10], out.data(), out.size() * sizeof(uint16_t));
    WriteAll(argv[11], conf_out.data(), conf_out.size() * sizeof(float));
    return 0;
  }
  if (argc == 9 && std::strcmp(argv[1], "eval_conf") == 0) {
    const int h = std::atoi(argv[5]), w = std::atoi(argv[6]);
    auto est = ReadAll(argv[2]);
    auto gt = ReadAll(argv[3]);
    auto conf = ReadAll(argv[4]);
    CHECK_INPUT(est.size() == static_cast<size_t>(h) * w * sizeof(float),
                "est size %zu != h*w*4 for %dx%d", est.size(), h, w);
    CHECK_INPUT(gt.size() == est.size() && conf.size() == est.size(),
                "gt/conf sizes (%zu, %zu) != est size %zu", gt.size(),
                conf.size(), est.size());
    const float max_disp = std::strtof(argv[7], nullptr);
    const float threshold = std::strtof(argv[8], nullptr);
    double coverage = 0.0;
    const auto r = esmstereo::EvaluateDisparityConf(
        reinterpret_cast<const float*>(est.data()),
        reinterpret_cast<const float*>(gt.data()),
        reinterpret_cast<const float*>(conf.data()), threshold, h, w,
        max_disp, &coverage);
    std::printf(
        "{\"epe\": %.8f, \"d1\": %.8f, \"bad3\": %.8f, "
        "\"valid_pixels\": %d, \"coverage\": %.8f}\n",
        r.epe, r.d1, r.bad3, r.valid_pixels, coverage);
    return 0;
  }
  std::fprintf(stderr, "usage: %s selftest|preprocess|postprocess|"
               "postprocess_conf|eval_conf ...\n",
               argv[0]);
  return 2;
}
