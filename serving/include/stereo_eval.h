// Native evaluation helpers: EPE/D1 against ground truth, the KITTI error
// colormap, and vKITTI depth->disparity conversion.
//
// TPU-native counterparts of the C++ ports embedded in the reference's
// confidence / virtual-KITTI nodes
// (/root/reference/kitti_publisher_conf/src/kitti_publisher_conf_cuda_node.cpp:
// computeEPE 55-67, gen_error_colormap 69-92, vis 94-151;
// virtual_kitti_publisher/..._cuda_node.cpp: depthToDisparity 55-90,
// computeD1 106-137) — these let the serving runtime cross-check the
// deployed engine against GT without Python.

#pragma once

#include <cstdint>
#include <vector>

namespace esmstereo {

struct EvalResult {
  double epe = 0.0;       // masked mean |est - gt|
  double d1 = 0.0;        // fraction with err > 3 AND err/gt > 0.05
  double bad3 = 0.0;      // fraction with err > 3
  int valid_pixels = 0;
};

// Masked EPE/D1 between an estimate and GT (both h*w float, GT<=0 invalid).
EvalResult EvaluateDisparity(const float* est, const float* gt, int height,
                             int width, float max_disp = 192.0f);

// EvaluateDisparity restricted to pixels the model itself trusts:
// conf >= threshold joins the GT validity mask — the confidence node's
// thresholded view of accuracy (the reference node applies the same mask
// before display/recording, kitti_publisher_conf_cuda_node.cpp:571-575).
// `coverage`, if non-null, receives the fraction of GT-valid pixels that
// pass the confidence threshold.
EvalResult EvaluateDisparityConf(const float* est, const float* gt,
                                 const float* conf, float threshold,
                                 int height, int width,
                                 float max_disp = 192.0f,
                                 double* coverage = nullptr);

// vKITTI uint16 depth (centimetres) -> disparity = fx * baseline / depth_m;
// depth of 0 or >= 655.35 m maps to 0 (invalid).
void DepthToDisparity(const uint16_t* depth_cm, int height, int width,
                      double fx, double baseline_m, float* disparity);

// KITTI-devkit 10-bucket error colormap over min(err/3, rel/0.05).
// Output RGB uint8 (h*w*3); invalid GT pixels are black; a legend strip is
// drawn across the top 10 rows.
void ErrorColormap(const float* est, const float* gt, int height, int width,
                   uint8_t* rgb_out);

}  // namespace esmstereo
