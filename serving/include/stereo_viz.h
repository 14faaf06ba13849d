// Deployment visualization/recording for the native pipeline.
//
// Native counterpart of the reference's in-node display path
// (/root/reference/kitti_publisher/src/kitti_publisher_cuda_node.cpp:53-133
// `visualize_and_record_disparity`): MAGMA-colormapped disparity
// normalized over the valid mask, center-pixel metric depth fx*B/d with a
// marker, FPS ("HZ") overlay, image+disparity stack, optional MJPG video
// record — plus a JET "stacked" renderer that is the byte-twin of the
// Python demo writer (tools/save_vid.py), used for golden tests
// (tests/test_serving_viz.py).

#ifndef ESMSTEREO_SERVING_STEREO_VIZ_H_
#define ESMSTEREO_SERVING_STEREO_VIZ_H_

#include <string>

#include <opencv2/opencv.hpp>

namespace esmstereo {

// JET colormap over disp/max_disp, returned as BGR u8 (the exact math of
// esmstereo_tpu/utils/visualization.py::colorize_disparity before its
// BGR->RGB flip).
cv::Mat ColorizeDisparityJet(const cv::Mat& disp_f32, float max_disp);

// Reference-style MAGMA map: disp16 (CV_16UC1, x256) normalized by its
// min/max over `valid` then inverted, COLORMAP_MAGMA
// (kitti_publisher_cuda_node.cpp:81-86). Returns BGR u8.
cv::Mat ColorizeDisparityMagma(const cv::Mat& disp16, const cv::Mat& valid);

// tools/save_vid.py frame: vstack(left_bgr, jet_disp) + white
// "{fps:6.1f} FPS" at (20, H+40). Byte-twin of the Python renderer.
cv::Mat RenderStackedFrame(const cv::Mat& left_bgr, const cv::Mat& disp_f32,
                           float max_disp, double fps);

// Full reference `visualize_and_record_disparity` parity: MAGMA disparity
// with center-depth text + marker, green "%.2f HZ" top-right, vconcat of
// the left image on top. disp_f32 is the filtered disparity (for the
// center sample), disp16 its x256 u16 form (for the colormap).
cv::Mat RenderOverlayFrame(const cv::Mat& left_bgr, const cv::Mat& disp_f32,
                           const cv::Mat& disp16, const cv::Mat& valid,
                           double elapsed_ms, double fx, double baseline);

// Open-on-first-write MJPG recorder (reference records MJPG-in-.mp4 at a
// fixed 30 fps, kitti_publisher_cuda_node.cpp:124-132).
class VideoRecorder {
 public:
  explicit VideoRecorder(std::string path) : path_(std::move(path)) {}
  // Returns false if the writer could not be opened.
  bool Write(const cv::Mat& frame);

 private:
  std::string path_;
  cv::VideoWriter writer_;
};

}  // namespace esmstereo

#endif  // ESMSTEREO_SERVING_STEREO_VIZ_H_
