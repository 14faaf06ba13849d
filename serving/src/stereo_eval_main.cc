// stereo_eval: compare a disparity PNG (uint16, d*256) against ground truth
// and print EPE / D1 / >3px, optionally writing the KITTI error map.
//
// Ground truth forms:
//   --gt disp.png            uint16 disparity*256 (KITTI convention)
//   --gt_depth depth.png --fx F --baseline B
//                            uint16 depth in cm (virtual KITTI convention)
//
// Native counterpart of the evaluation embedded in the reference's
// confidence / vKITTI nodes (see stereo_eval.h).

#include <cstdio>
#include <string>
#include <vector>

#include <opencv2/opencv.hpp>

#include "stereo_eval.h"

int main(int argc, char** argv) {
  std::string est_path, gt_path, gt_depth_path, err_path, conf_path;
  double fx = 707.0912, baseline = 0.536;
  float max_disp = 192.0f, conf_threshold = 0.5f;
  for (int i = 1; i + 1 < argc; i += 2) {
    const std::string k = argv[i], v = argv[i + 1];
    if (k == "--est") est_path = v;
    else if (k == "--gt") gt_path = v;
    else if (k == "--gt_depth") gt_depth_path = v;
    else if (k == "--err_out") err_path = v;
    else if (k == "--conf") conf_path = v;
    else if (k == "--conf_threshold") conf_threshold = std::stof(v);
    else if (k == "--fx") fx = std::stod(v);
    else if (k == "--baseline") baseline = std::stod(v);
    else if (k == "--max_disp") max_disp = std::stof(v);
    else { std::fprintf(stderr, "unknown flag %s\n", k.c_str()); return 2; }
  }
  if (est_path.empty() || (gt_path.empty() && gt_depth_path.empty())) {
    std::fprintf(stderr,
                 "usage: stereo_eval --est d.png (--gt g.png | "
                 "--gt_depth depth.png --fx F --baseline B) "
                 "[--err_out err.png] "
                 "[--conf conf.png --conf_threshold 0.5]\n");
    return 2;
  }

  cv::Mat est16 = cv::imread(est_path, cv::IMREAD_UNCHANGED);
  if (est16.empty() || est16.type() != CV_16UC1) {
    std::fprintf(stderr, "est must be a uint16 PNG\n");
    return 1;
  }
  const int h = est16.rows, w = est16.cols;
  std::vector<float> est(h * w), gt(h * w);
  for (int i = 0; i < h * w; ++i) {
    est[i] = est16.at<uint16_t>(i / w, i % w) / 256.0f;
  }

  if (!gt_path.empty()) {
    cv::Mat gt16 = cv::imread(gt_path, cv::IMREAD_UNCHANGED);
    if (gt16.empty() || gt16.rows != h || gt16.cols != w ||
        gt16.type() != CV_16UC1) {
      std::fprintf(stderr, "gt must be a uint16 PNG of the same size\n");
      return 1;
    }
    for (int i = 0; i < h * w; ++i) {
      gt[i] = gt16.at<uint16_t>(i / w, i % w) / 256.0f;
    }
  } else {
    cv::Mat depth = cv::imread(gt_depth_path, cv::IMREAD_UNCHANGED);
    if (depth.empty() || depth.rows != h || depth.cols != w ||
        depth.type() != CV_16UC1) {
      std::fprintf(stderr, "gt_depth must be a uint16 PNG (cm)\n");
      return 1;
    }
    esmstereo::DepthToDisparity(
        reinterpret_cast<const uint16_t*>(depth.data), h, w, fx, baseline,
        gt.data());
  }

  const auto res =
      esmstereo::EvaluateDisparity(est.data(), gt.data(), h, w, max_disp);
  std::printf("EPE %.4f  D1 %.4f  >3px %.4f  (%d valid px)\n", res.epe,
              res.d1, res.bad3, res.valid_pixels);

  if (!conf_path.empty()) {
    // uint16 PNG, conf*65535 (stereo_infer --conf_out format)
    cv::Mat conf16 = cv::imread(conf_path, cv::IMREAD_UNCHANGED);
    if (conf16.empty() || conf16.rows != h || conf16.cols != w ||
        conf16.type() != CV_16UC1) {
      std::fprintf(stderr, "conf must be a uint16 PNG of the same size\n");
      return 1;
    }
    std::vector<float> conf(static_cast<size_t>(h) * w);
    for (int i = 0; i < h * w; ++i) {
      conf[i] = conf16.at<uint16_t>(i / w, i % w) / 65535.0f;
    }
    double coverage = 0.0;
    const auto cres = esmstereo::EvaluateDisparityConf(
        est.data(), gt.data(), conf.data(), conf_threshold, h, w, max_disp,
        &coverage);
    std::printf(
        "conf>=%.2f: EPE %.4f  D1 %.4f  >3px %.4f  (%d px, coverage "
        "%.3f)\n",
        conf_threshold, cres.epe, cres.d1, cres.bad3, cres.valid_pixels,
        coverage);
  }

  if (!err_path.empty()) {
    std::vector<uint8_t> rgb(static_cast<size_t>(h) * w * 3);
    esmstereo::ErrorColormap(est.data(), gt.data(), h, w, rgb.data());
    cv::Mat err(h, w, CV_8UC3, rgb.data());
    cv::cvtColor(err, err, cv::COLOR_RGB2BGR);
    cv::imwrite(err_path, err);
    std::fprintf(stderr, "wrote %s\n", err_path.c_str());
  }
  return 0;
}
