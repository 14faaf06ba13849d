// stereo_ab: two-engine A/B comparison harness.
//
// TPU-native counterpart of the reference's ESS comparison node
// (/root/reference/kitti_publisher_ess/src/kitti_publisher_ess_cuda_node.cpp:
// a SECOND live network runs over the same frames and its running EPE/D1
// against ground truth is reported alongside, :139-165, computeD1 106-137).
// Here both engines are exported StableHLO modules compiled into ONE PJRT
// client; each frame is preprocessed once, executed on both, and evaluated
// against GT (KITTI uint16 disparity/256 PNGs, or vKITTI uint16 depth
// centimetres with --gt_depth, converted via fx*baseline/depth like the
// virtual_kitti node :55-90).
//
// Usage:
//   stereo_ab --model_a A.stablehlo.mlir --model_b B.stablehlo.mlir \
//       --plugin <pjrt_plugin.so> [--plugin_option k=v ...] \
//       --left_dir L --right_dir R --gt_dir G [--gt_depth 1] \
//       --height 384 --width 1248 [--fx 707.0912 --baseline 0.536] \
//       [--max_frames N]

#include <algorithm>
#include <cstdio>
#include <filesystem>
#include <string>
#include <vector>

#include <opencv2/opencv.hpp>

#include "pjrt_runner.h"
#include "stereo_eval.h"
#include "stereo_pipeline.h"

namespace fs = std::filesystem;

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

std::vector<std::string> ListImages(const std::string& dir) {
  std::vector<std::string> files;
  for (const auto& e : fs::directory_iterator(dir)) {
    const auto ext = e.path().extension().string();
    if (ext == ".png" || ext == ".jpg") files.push_back(e.path().string());
  }
  std::sort(files.begin(), files.end());
  return files;
}

struct Options {
  std::string model_a, model_b, plugin, left_dir, right_dir, gt_dir;
  int height = 384, width = 1248;
  bool gt_depth = false;
  float max_disp = 192.0f;
  double fx = 707.0912, baseline = 0.536;
  int max_frames = -1;
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
    if (k == "--model_a") o->model_a = v;
    else if (k == "--model_b") o->model_b = v;
    else if (k == "--plugin") o->plugin = v;
    else if (k == "--left_dir") o->left_dir = v;
    else if (k == "--right_dir") o->right_dir = v;
    else if (k == "--gt_dir") o->gt_dir = v;
    else if (k == "--gt_depth") o->gt_depth = v == "1" || v == "true";
    else if (k == "--height") o->height = std::stoi(v);
    else if (k == "--width") o->width = std::stoi(v);
    else if (k == "--max_disp") o->max_disp = std::stof(v);
    else if (k == "--fx") o->fx = std::stod(v);
    else if (k == "--baseline") o->baseline = std::stod(v);
    else if (k == "--max_frames") o->max_frames = std::stoi(v);
    else { std::fprintf(stderr, "unknown flag %s\n", k.c_str()); return false; }
  }
  return !o->model_a.empty() && !o->model_b.empty() && !o->plugin.empty() &&
         !o->left_dir.empty() && !o->right_dir.empty() && !o->gt_dir.empty();
}

}  // namespace

int main(int argc, char** argv) {
  Options o;
  if (!ParseArgs(argc, argv, &o)) {
    std::fprintf(stderr,
                 "usage: stereo_ab --model_a A.mlir --model_b B.mlir "
                 "--plugin p.so --left_dir L --right_dir R --gt_dir G ...\n");
    return 2;
  }

  esmstereo::PjrtRunner runner(o.plugin, o.plugin_options);
  if (auto e = runner.Initialize(); !e.empty()) {
    std::fprintf(stderr, "PJRT init failed: %s\n", e.c_str());
    return 1;
  }
  std::printf("platform: %s\n", runner.platform_name().c_str());

  int idx_a = -1, idx_b = -1;
  for (auto [path, idx] : {std::pair{&o.model_a, &idx_a},
                           std::pair{&o.model_b, &idx_b}}) {
    const std::string mlir = ReadFile(*path);
    if (mlir.empty()) {
      std::fprintf(stderr, "cannot read %s\n", path->c_str());
      return 1;
    }
    if (auto e = runner.CompileModule(mlir, idx); !e.empty()) {
      std::fprintf(stderr, "compile %s failed: %s\n", path->c_str(),
                   e.c_str());
      return 1;
    }
    std::printf("compiled %s -> engine %d\n", path->c_str(), *idx);
  }

  const auto lefts = ListImages(o.left_dir);
  const auto rights = ListImages(o.right_dir);
  const auto gts = ListImages(o.gt_dir);
  const size_t n = std::min({lefts.size(), rights.size(), gts.size(),
                             o.max_frames > 0 ? static_cast<size_t>(o.max_frames)
                                              : lefts.size()});
  if (n == 0) {
    std::fprintf(stderr, "no frames found\n");
    return 1;
  }

  double sum_epe_a = 0, sum_d1_a = 0, sum_epe_b = 0, sum_d1_b = 0;
  size_t evaluated = 0;
  for (size_t i = 0; i < n; ++i) {
    cv::Mat left = cv::imread(lefts[i], cv::IMREAD_COLOR);
    cv::Mat right = cv::imread(rights[i], cv::IMREAD_COLOR);
    cv::Mat gt16 = cv::imread(gts[i], cv::IMREAD_UNCHANGED);
    if (left.empty() || right.empty() || gt16.empty()) continue;
    cv::cvtColor(left, left, cv::COLOR_BGR2RGB);
    cv::cvtColor(right, right, cv::COLOR_BGR2RGB);

    esmstereo::PreprocessConfig pre;
    pre.target = {o.height, o.width};
    std::vector<float> lbuf, rbuf;
    if (!esmstereo::PreprocessImage(left.data, left.rows, left.cols, pre,
                                    &lbuf) ||
        !esmstereo::PreprocessImage(right.data, right.rows, right.cols, pre,
                                    &rbuf)) {
      std::fprintf(stderr, "frame %zu larger than engine shape; skip\n", i);
      continue;
    }
    std::vector<esmstereo::PjrtRunner::Tensor> inputs(2);
    inputs[0].dims = {1, o.height, o.width, 3};
    inputs[0].data = std::move(lbuf);
    inputs[1].dims = {1, o.height, o.width, 3};
    inputs[1].data = std::move(rbuf);

    // ground truth at original resolution
    const int gh = gt16.rows, gw = gt16.cols;
    std::vector<float> gt(static_cast<size_t>(gh) * gw);
    if (o.gt_depth) {
      esmstereo::DepthToDisparity(
          reinterpret_cast<const uint16_t*>(gt16.ptr<uint16_t>()), gh, gw,
          o.fx, o.baseline, gt.data());
    } else {
      for (int p = 0; p < gh * gw; ++p) {
        gt[p] = gt16.ptr<uint16_t>()[p] / 256.0f;  // KITTI PNG/256
      }
    }

    struct Engine { int idx; const char* name; double* epe; double* d1; };
    bool frame_ok = true;
    double frame_epe[2] = {0, 0}, frame_d1[2] = {0, 0};
    Engine engines[2] = {{idx_a, "A", &sum_epe_a, &sum_d1_a},
                         {idx_b, "B", &sum_epe_b, &sum_d1_b}};
    for (int k = 0; k < 2; ++k) {
      std::vector<esmstereo::PjrtRunner::Tensor> outputs;
      if (auto e = runner.ExecuteModule(engines[k].idx, inputs, &outputs);
          !e.empty() || outputs.empty()) {
        std::fprintf(stderr, "engine %s frame %zu failed: %s\n",
                     engines[k].name, i, e.c_str());
        frame_ok = false;
        break;
      }
      // un-pad (top+right padding) down to GT size
      const float* padded = outputs[0].data.data();
      std::vector<float> est(static_cast<size_t>(gh) * gw);
      const int top = o.height - gh;
      for (int y = 0; y < gh; ++y) {
        for (int x = 0; x < gw; ++x) {
          est[static_cast<size_t>(y) * gw + x] =
              padded[static_cast<size_t>(y + top) * o.width + x];
        }
      }
      const auto r = esmstereo::EvaluateDisparity(est.data(), gt.data(), gh,
                                                  gw, o.max_disp);
      frame_epe[k] = r.epe;
      frame_d1[k] = r.d1;
    }
    if (!frame_ok) continue;
    evaluated += 1;
    sum_epe_a += frame_epe[0]; sum_d1_a += frame_d1[0];
    sum_epe_b += frame_epe[1]; sum_d1_b += frame_d1[1];
    // running-average report, like the ESS node's on-screen overlay
    std::printf(
        "frame %zu | A: EPE %.3f D1 %.2f%% (avg %.3f / %.2f%%) | "
        "B: EPE %.3f D1 %.2f%% (avg %.3f / %.2f%%)\n",
        i, frame_epe[0], frame_d1[0] * 100.0, sum_epe_a / evaluated,
        sum_d1_a / evaluated * 100.0, frame_epe[1], frame_d1[1] * 100.0,
        sum_epe_b / evaluated, sum_d1_b / evaluated * 100.0);
    std::fflush(stdout);
  }
  if (evaluated == 0) {
    std::fprintf(stderr, "no frames evaluated\n");
    return 1;
  }
  std::printf(
      "FINAL %zu frames | A: EPE %.4f D1 %.3f%% | B: EPE %.4f D1 %.3f%%\n",
      evaluated, sum_epe_a / evaluated, sum_d1_a / evaluated * 100.0,
      sum_epe_b / evaluated, sum_d1_b / evaluated * 100.0);
  return 0;
}
