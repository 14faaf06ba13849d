// See stereo_viz.h. Reference semantics:
// /root/reference/kitti_publisher/src/kitti_publisher_cuda_node.cpp:53-133.

#include "stereo_viz.h"

#include <iomanip>
#include <sstream>

namespace esmstereo {

cv::Mat ColorizeDisparityJet(const cv::Mat& disp_f32, float max_disp) {
  CV_Assert(disp_f32.type() == CV_32FC1);
  if (max_disp <= 0.0f) {
    double mx = 0.0;
    cv::minMaxLoc(disp_f32, nullptr, &mx);
    max_disp = static_cast<float>(mx > 1.0 ? mx : 1.0);
  }
  // norm = clip(disp / max_disp * 255, 0, 255).astype(uint8) — match the
  // Python renderer exactly (numpy astype truncates toward zero).
  cv::Mat norm(disp_f32.rows, disp_f32.cols, CV_8UC1);
  for (int y = 0; y < disp_f32.rows; ++y) {
    const float* d = disp_f32.ptr<float>(y);
    uint8_t* o = norm.ptr<uint8_t>(y);
    for (int x = 0; x < disp_f32.cols; ++x) {
      float v = d[x] / max_disp * 255.0f;
      v = v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v);
      o[x] = static_cast<uint8_t>(v);
    }
  }
  cv::Mat color;
  cv::applyColorMap(norm, color, cv::COLORMAP_JET);
  return color;  // BGR
}

cv::Mat ColorizeDisparityMagma(const cv::Mat& disp16, const cv::Mat& valid) {
  CV_Assert(disp16.type() == CV_16UC1);
  double min_val = 0.0, max_val = 0.0;
  cv::minMaxLoc(disp16, &min_val, &max_val,
                nullptr, nullptr, valid.empty() ? cv::noArray()
                                                : cv::InputArray(valid));
  if (max_val <= min_val) max_val = min_val + 1.0;
  // inverted normalization (near = bright), exactly the reference's
  // convertTo(alpha=-255/(max-min), beta=255*max/(max-min)).
  cv::Mat norm, color;
  disp16.convertTo(norm, CV_8UC1, -255.0 / (max_val - min_val),
                   255.0 * max_val / (max_val - min_val));
  cv::applyColorMap(norm, color, cv::COLORMAP_MAGMA);
  return color;
}

cv::Mat RenderStackedFrame(const cv::Mat& left_bgr, const cv::Mat& disp_f32,
                           float max_disp, double fps) {
  cv::Mat disp_color = ColorizeDisparityJet(disp_f32, max_disp);
  cv::Mat left = left_bgr;
  if (left.size() != disp_color.size()) {
    cv::resize(left_bgr, left, disp_color.size());
  }
  cv::Mat stacked;
  cv::vconcat(left, disp_color, stacked);
  std::ostringstream oss;
  oss << std::fixed << std::setprecision(1) << std::setw(6) << fps
      << " FPS";
  cv::putText(stacked, oss.str(), cv::Point(20, left.rows + 40),
              cv::FONT_HERSHEY_SIMPLEX, 1.0, cv::Scalar(255, 255, 255), 2);
  return stacked;
}

cv::Mat RenderOverlayFrame(const cv::Mat& left_bgr, const cv::Mat& disp_f32,
                           const cv::Mat& disp16, const cv::Mat& valid,
                           double elapsed_ms, double fx, double baseline) {
  const int cx = disp_f32.cols / 2;
  const int cy = disp_f32.rows / 2;
  const float disp_val = disp_f32.at<float>(cy, cx);
  std::string depth_text;
  if (disp_val > 0.0f) {
    std::ostringstream oss;
    oss << std::fixed << std::setprecision(2)
        << (fx * baseline) / disp_val << " m";
    depth_text = oss.str();
  } else {
    depth_text = "N/A";
  }

  cv::Mat disp_color = ColorizeDisparityMagma(disp16, valid);

  cv::Mat left_color;
  if (left_bgr.channels() == 1) {
    cv::cvtColor(left_bgr, left_color, cv::COLOR_GRAY2BGR);
  } else {
    left_color = left_bgr.clone();
  }
  if (left_color.size() != disp_color.size()) {
    cv::resize(left_color, left_color, disp_color.size());
  }

  // center marker + metric depth (reference draws in RGB-order blue)
  cv::circle(disp_color, cv::Point(cx, cy), 5, cv::Scalar(255, 0, 0), -1);
  cv::putText(disp_color, depth_text, cv::Point(cx + 10, cy - 10),
              cv::FONT_HERSHEY_SIMPLEX, 1.0, cv::Scalar(255, 0, 0), 2);

  // green "%.2f HZ" top-right
  std::ostringstream oss;
  oss << std::fixed << std::setprecision(2) << 1000.0 / elapsed_ms
      << " HZ";
  const std::string text = oss.str();
  const int font = cv::FONT_HERSHEY_SIMPLEX;
  int bl = 0;
  const cv::Size ts = cv::getTextSize(text, font, 1.0, 4, &bl);
  cv::putText(disp_color, text,
              cv::Point(disp_color.cols - ts.width - 10, ts.height + 10),
              font, 1.0, cv::Scalar(0, 255, 0), 4);

  cv::Mat combined;
  cv::vconcat(left_color, disp_color, combined);
  return combined;
}

bool VideoRecorder::Write(const cv::Mat& frame) {
  if (!writer_.isOpened()) {
    writer_.open(path_, cv::VideoWriter::fourcc('M', 'J', 'P', 'G'), 30,
                 frame.size());
    if (!writer_.isOpened()) return false;
  }
  writer_.write(frame);
  return true;
}

}  // namespace esmstereo
