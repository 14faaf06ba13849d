// Host-side pre/post-processing for the stereo serving runtime.
//
// TPU-native counterpart of the reference ROS2/TensorRT node's host code
// (/root/reference/kitti_publisher/src/kitti_publisher_cuda_node.cpp:
// preprocess_image 136-175, postprocess 387-404): pad to the engine's
// fixed /32 shape, /255 + ImageNet normalisation (NHWC — TPU wants
// channels-last, unlike the TRT node's CHW), then un-pad, 5x5 median
// filter, validity mask 0 < d < max_disp, and x256 uint16 encoding.

#pragma once

#include <cstdint>
#include <vector>

namespace esmstereo {

struct Shape {
  int height = 0;
  int width = 0;
};

struct PreprocessConfig {
  Shape target;          // fixed engine input shape (e.g. 384 x 1248)
  bool pad_top = true;   // reference eval convention: pad top...
  bool pad_right = true; // ...and right (kitti_dataset.py:151-174)
};

// uint8 HWC RGB (h*w*3) -> float32 NHWC (1, target.h, target.w, 3),
// normalised with ImageNet statistics. Returns false if the image is
// larger than the target.
bool PreprocessImage(const uint8_t* rgb, int height, int width,
                     const PreprocessConfig& cfg, std::vector<float>* out);

struct PostprocessConfig {
  Shape padded;          // engine output shape
  Shape original;        // un-padded image shape
  bool pad_top = true;
  bool pad_right = true;
  float max_disp = 192.0f;
  bool median_filter = true;  // 5x5, like the TRT node (:392)
};

// float32 disparity (padded.h * padded.w) -> uint16 disparity*256 at the
// original size with invalid pixels (outside (0, max_disp)) set to 0.
void PostprocessDisparity(const float* disp, const PostprocessConfig& cfg,
                          std::vector<uint16_t>* out);

// Confidence-masked variant for 2-output (disparity, confidence) engines:
// crop BOTH maps, median-filter the disparity, then validity =
// (0 < d < max_disp) AND (conf >= threshold) — the reference conf node's
// mask (kitti_publisher_conf_cuda_node.cpp:571-575: conf_mask & range_mask,
// invalid set to 0, x256 uint16). `conf_out`, if non-null, receives the
// cropped confidence map (for eval / visualisation).
void PostprocessDisparityConf(const float* disp, const float* conf,
                              float threshold, const PostprocessConfig& cfg,
                              std::vector<uint16_t>* out,
                              std::vector<float>* conf_out);

// 5x5 median filter (border replicated), single-channel float.
void MedianFilter5x5(const float* src, int height, int width, float* dst);

}  // namespace esmstereo
