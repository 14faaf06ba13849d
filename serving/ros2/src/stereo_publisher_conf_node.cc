// ROS2 confidence stereo publisher: plays a KITTI-style stereo sequence
// through the 2-output (disparity + confidence) PJRT engine, publishes
// left/right/disparity/confidence topics with confidence-masked validity,
// and optionally renders the reference's 2x2 diagnostic view.
//
// TPU-native counterpart of the reference's confidence TensorRT node
// (/root/reference/kitti_publisher_conf/src/kitti_publisher_conf_cuda_node.cpp):
//   * same topics + a /confidence/image_raw (32FC1) topic;
//   * the live threshold trackbar (:464) becomes a dynamically
//     reconfigurable ROS parameter (`ros2 param set ... conf_threshold`),
//     read every tick;
//   * conf-masked disparity publishing (:571-576 —
//     valid = range_mask & (conf >= threshold), invalid set to 0);
//   * the in-node 2x2 display (:238-262 — [left | masked disparity] over
//     [error map + EPE | confidence + threshold]) is rendered with
//     stereo_viz + ErrorColormap when `display` or `record_path` is set
//     (headless-friendly: display defaults off, record writes MJPG).
//
// Build: -DBUILD_ROS2_NODE=ON with a sourced ROS2 distro.

#include <algorithm>
#include <chrono>
#include <filesystem>
#include <fstream>
#include <iomanip>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

#include <cv_bridge/cv_bridge.h>
#include <opencv2/opencv.hpp>
#include <rclcpp/rclcpp.hpp>
#include <sensor_msgs/msg/image.hpp>

#include "pjrt_runner.h"
#include "stereo_eval.h"
#include "stereo_pipeline.h"
#include "stereo_viz.h"

namespace fs = std::filesystem;
using namespace std::chrono_literals;

class StereoConfPublisher : public rclcpp::Node {
 public:
  StereoConfPublisher() : Node("stereo_conf_publisher") {
    declare_parameter<std::string>("left_dir", "");
    declare_parameter<std::string>("right_dir", "");
    declare_parameter<std::string>("gt_dir", "");  // optional: error pane
    declare_parameter<std::string>("model_path",
                                   "StereoModelConf.stablehlo.mlir");
    declare_parameter<std::string>("plugin_path", "libtpu.so");
    declare_parameter<int>("net_height", 384);
    declare_parameter<int>("net_width", 1248);
    declare_parameter<double>("fx", 707.0912);
    declare_parameter<double>("baseline", 0.536);
    declare_parameter<double>("max_disp", 192.0);
    // live-tunable (the reference's trackbar): ros2 param set <node>
    // conf_threshold 0.7
    declare_parameter<double>("conf_threshold", 0.5);
    declare_parameter<bool>("display", false);
    declare_parameter<std::string>("record_path", "");

    auto list_dir = [](const std::string& d) {
      std::vector<std::string> files;
      if (d.empty()) return files;
      for (const auto& e : fs::directory_iterator(d)) {
        files.push_back(e.path().string());
      }
      std::sort(files.begin(), files.end());
      return files;
    };
    left_files_ = list_dir(get_parameter("left_dir").as_string());
    right_files_ = list_dir(get_parameter("right_dir").as_string());
    gt_files_ = list_dir(get_parameter("gt_dir").as_string());
    if (left_files_.size() != right_files_.size()) {
      throw std::runtime_error("left/right image counts differ");
    }

    left_pub_ = create_publisher<sensor_msgs::msg::Image>(
        "/cam0/image_raw", 10);
    right_pub_ = create_publisher<sensor_msgs::msg::Image>(
        "/cam1/image_raw", 10);
    disp_pub_ = create_publisher<sensor_msgs::msg::Image>(
        "/disparity/image_raw", 10);
    conf_pub_ = create_publisher<sensor_msgs::msg::Image>(
        "/confidence/image_raw", 10);

    runner_ = std::make_unique<esmstereo::PjrtRunner>(
        get_parameter("plugin_path").as_string());
    if (auto e = runner_->Initialize(); !e.empty()) {
      RCLCPP_FATAL(get_logger(), "PJRT init: %s", e.c_str());
      throw std::runtime_error(e);
    }
    std::ifstream in(get_parameter("model_path").as_string());
    std::string module((std::istreambuf_iterator<char>(in)),
                       std::istreambuf_iterator<char>());
    if (auto e = runner_->Compile(module); !e.empty()) {
      RCLCPP_FATAL(get_logger(), "compile: %s", e.c_str());
      throw std::runtime_error(e);
    }
    if (!get_parameter("record_path").as_string().empty()) {
      recorder_ = std::make_unique<esmstereo::VideoRecorder>(
          get_parameter("record_path").as_string());
    }
    timer_ = create_wall_timer(7ms, [this] { PublishNext(); });
  }

 private:
  void PublishNext() {
    if (index_ >= left_files_.size()) index_ = 0;
    const size_t idx = index_++;
    cv::Mat left = cv::imread(left_files_[idx], cv::IMREAD_COLOR);
    cv::Mat right = cv::imread(right_files_[idx], cv::IMREAD_COLOR);
    if (left.empty() || right.empty()) return;

    left_pub_->publish(*cv_bridge::CvImage(
        std_msgs::msg::Header(), "bgr8", left).toImageMsg());
    right_pub_->publish(*cv_bridge::CvImage(
        std_msgs::msg::Header(), "bgr8", right).toImageMsg());

    cv::Mat left_rgb, right_rgb;
    cv::cvtColor(left, left_rgb, cv::COLOR_BGR2RGB);
    cv::cvtColor(right, right_rgb, cv::COLOR_BGR2RGB);

    const int nh = get_parameter("net_height").as_int();
    const int nw = get_parameter("net_width").as_int();
    esmstereo::PreprocessConfig pre;
    pre.target = {nh, nw};
    std::vector<esmstereo::PjrtRunner::Tensor> inputs(2);
    inputs[0].dims = inputs[1].dims = {1, nh, nw, 3};
    if (!esmstereo::PreprocessImage(left_rgb.data, left_rgb.rows,
                                    left_rgb.cols, pre, &inputs[0].data) ||
        !esmstereo::PreprocessImage(right_rgb.data, right_rgb.rows,
                                    right_rgb.cols, pre, &inputs[1].data)) {
      RCLCPP_WARN(get_logger(), "image exceeds engine shape");
      return;
    }

    std::vector<esmstereo::PjrtRunner::Tensor> outputs;
    const auto t0 = std::chrono::steady_clock::now();
    if (auto e = runner_->Execute(inputs, &outputs); !e.empty()) {
      RCLCPP_ERROR(get_logger(), "execute: %s", e.c_str());
      return;
    }
    const double ms = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count() * 1e3;
    if (outputs.size() < 2) {
      RCLCPP_ERROR(get_logger(),
                   "engine produced %zu outputs; confidence engines "
                   "export 2 (tools/export_stablehlo.py --confidence)",
                   outputs.size());
      return;
    }

    const float max_disp =
        static_cast<float>(get_parameter("max_disp").as_double());
    const float threshold =
        static_cast<float>(get_parameter("conf_threshold").as_double());

    // conf-masked postprocess (median filter + range mask + conf mask;
    // kitti_publisher_conf_cuda_node.cpp:560-576)
    esmstereo::PostprocessConfig post;
    post.padded = {nh, nw};
    post.original = {left.rows, left.cols};
    post.max_disp = max_disp;
    std::vector<uint16_t> disp_u16;
    std::vector<float> conf_out;
    esmstereo::PostprocessDisparityConf(
        outputs[0].data.data(), outputs[1].data.data(), threshold, post,
        &disp_u16, &conf_out);

    cv::Mat disp16(left.rows, left.cols, CV_16UC1, disp_u16.data());
    disp_pub_->publish(*cv_bridge::CvImage(
        std_msgs::msg::Header(), "mono16", disp16).toImageMsg());
    cv::Mat conf(left.rows, left.cols, CV_32FC1, conf_out.data());
    conf_pub_->publish(*cv_bridge::CvImage(
        std_msgs::msg::Header(), "32FC1", conf).toImageMsg());

    const bool display = get_parameter("display").as_bool();
    if (display || recorder_) {
      cv::Mat frame = RenderQuad(left, disp16, conf, idx, ms, threshold,
                                 max_disp);
      if (recorder_) recorder_->Write(frame);
      if (display) {
        cv::imshow("Left + Disparity", frame);
        cv::waitKey(1);
      }
    }
    RCLCPP_INFO_THROTTLE(get_logger(), *get_clock(), 2000,
                         "inference %.2f ms (%.1f Hz), threshold %.2f",
                         ms, 1e3 / ms, threshold);
  }

  // The reference's 2x2 diagnostic: [left | masked MAGMA disparity] over
  // [error map + EPE | confidence + threshold]
  // (kitti_publisher_conf_cuda_node.cpp:200-262).
  cv::Mat RenderQuad(const cv::Mat& left, const cv::Mat& disp16,
                     const cv::Mat& conf, size_t idx, double ms,
                     float threshold, float max_disp) {
    const int h = left.rows, w = left.cols;
    cv::Mat valid = disp16 > 0;
    cv::Mat disp_color = esmstereo::ColorizeDisparityMagma(disp16, valid);

    // HZ overlay on the disparity pane (reference puts it top-right)
    std::ostringstream oss;
    oss << std::fixed << std::setprecision(2) << 1e3 / ms << " HZ";
    int bl = 0;
    const cv::Size ts = cv::getTextSize(oss.str(),
                                        cv::FONT_HERSHEY_SIMPLEX, 1.0, 4,
                                        &bl);
    cv::putText(disp_color, oss.str(),
                cv::Point(std::max(0, w - ts.width - 10), ts.height + 10),
                cv::FONT_HERSHEY_SIMPLEX, 1.0, cv::Scalar(0, 255, 0), 4);

    // confidence pane: grayscale conf + threshold annotation
    cv::Mat conf_u8, conf_color;
    conf.convertTo(conf_u8, CV_8UC1, 255.0);
    cv::cvtColor(conf_u8, conf_color, cv::COLOR_GRAY2BGR);
    std::ostringstream oss_th;
    oss_th << std::fixed << std::setprecision(2)
           << "Confidence Threshold: " << threshold;
    cv::putText(conf_color, oss_th.str(), cv::Point(10, ts.height + 10),
                cv::FONT_HERSHEY_SIMPLEX, 1.0, cv::Scalar(0, 255, 0), 4);

    // error pane: KITTI devkit colormap + EPE when GT is available
    cv::Mat err_color(h, w, CV_8UC3, cv::Scalar(0, 0, 0));
    if (idx < gt_files_.size()) {
      cv::Mat gt16 = cv::imread(gt_files_[idx],
                                cv::IMREAD_ANYCOLOR | cv::IMREAD_ANYDEPTH);
      if (!gt16.empty() && gt16.size() == left.size()) {
        cv::Mat est_f, gt_f;
        disp16.convertTo(est_f, CV_32FC1, 1.0 / 256.0);
        gt16.convertTo(gt_f, CV_32FC1, 1.0 / 256.0);
        std::vector<uint8_t> rgb(static_cast<size_t>(h) * w * 3);
        esmstereo::ErrorColormap(reinterpret_cast<float*>(est_f.data),
                                 reinterpret_cast<float*>(gt_f.data), h, w,
                                 rgb.data());
        cv::Mat rgbm(h, w, CV_8UC3, rgb.data());
        cv::cvtColor(rgbm, err_color, cv::COLOR_RGB2BGR);
        const auto r = esmstereo::EvaluateDisparity(
            reinterpret_cast<float*>(est_f.data),
            reinterpret_cast<float*>(gt_f.data), h, w, max_disp);
        std::ostringstream oss_epe;
        oss_epe << std::fixed << std::setprecision(2)
                << "End Point Error (EPE) [px]: " << r.epe;
        cv::putText(err_color, oss_epe.str(),
                    cv::Point(10, ts.height + 10),
                    cv::FONT_HERSHEY_SIMPLEX, 1.0, cv::Scalar(0, 255, 0),
                    4);
      }
    }

    cv::Mat col_disp, col_conf, combined, resized;
    cv::vconcat(left, disp_color, col_disp);
    cv::vconcat(err_color, conf_color, col_conf);
    cv::hconcat(col_disp, col_conf, combined);
    cv::resize(combined, resized, cv::Size(), 0.62, 0.62, cv::INTER_AREA);
    return resized;
  }

  std::vector<std::string> left_files_, right_files_, gt_files_;
  size_t index_ = 0;
  std::unique_ptr<esmstereo::PjrtRunner> runner_;
  std::unique_ptr<esmstereo::VideoRecorder> recorder_;
  rclcpp::Publisher<sensor_msgs::msg::Image>::SharedPtr left_pub_,
      right_pub_, disp_pub_, conf_pub_;
  rclcpp::TimerBase::SharedPtr timer_;
};

int main(int argc, char** argv) {
  rclcpp::init(argc, argv);
  rclcpp::spin(std::make_shared<StereoConfPublisher>());
  rclcpp::shutdown();
  return 0;
}
