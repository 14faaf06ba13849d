// ROS2 stereo publisher node: plays a KITTI-style stereo sequence through
// the PJRT stereo engine and publishes left/right/disparity topics.
//
// TPU-native counterpart of the reference's TensorRT ROS2 nodes
// (/root/reference/kitti_publisher/src/kitti_publisher_cuda_node.cpp):
// same topics (/cam0/image_raw, /cam1/image_raw, /disparity/image_raw),
// same parameters (image dirs, fx, baseline, engine shape), with the
// .plan engine replaced by an exported StableHLO module + PJRT plugin.
//
// Build: -DBUILD_ROS2_NODE=ON with a sourced ROS2 distro.

#include <chrono>
#include <filesystem>
#include <fstream>
#include <memory>
#include <string>
#include <vector>

#include <cv_bridge/cv_bridge.h>
#include <opencv2/opencv.hpp>
#include <rclcpp/rclcpp.hpp>
#include <sensor_msgs/msg/image.hpp>

#include "pjrt_runner.h"
#include "stereo_pipeline.h"

namespace fs = std::filesystem;
using namespace std::chrono_literals;

class StereoPublisher : public rclcpp::Node {
 public:
  StereoPublisher() : Node("stereo_publisher") {
    declare_parameter<std::string>("left_dir", "");
    declare_parameter<std::string>("right_dir", "");
    declare_parameter<std::string>("model_path", "StereoModel.stablehlo.mlir");
    declare_parameter<std::string>("plugin_path", "libtpu.so");
    declare_parameter<int>("net_height", 384);
    declare_parameter<int>("net_width", 1248);
    declare_parameter<double>("fx", 707.0912);
    declare_parameter<double>("baseline", 0.536);
    declare_parameter<double>("max_disp", 192.0);

    for (const auto& e :
         fs::directory_iterator(get_parameter("left_dir").as_string())) {
      left_files_.push_back(e.path().string());
    }
    std::sort(left_files_.begin(), left_files_.end());
    for (const auto& e :
         fs::directory_iterator(get_parameter("right_dir").as_string())) {
      right_files_.push_back(e.path().string());
    }
    std::sort(right_files_.begin(), right_files_.end());

    left_pub_ = create_publisher<sensor_msgs::msg::Image>(
        "/cam0/image_raw", 10);
    right_pub_ = create_publisher<sensor_msgs::msg::Image>(
        "/cam1/image_raw", 10);
    disp_pub_ = create_publisher<sensor_msgs::msg::Image>(
        "/disparity/image_raw", 10);

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
    timer_ = create_wall_timer(7ms, [this] { PublishNext(); });
  }

 private:
  void PublishNext() {
    if (index_ >= left_files_.size()) index_ = 0;
    cv::Mat left = cv::imread(left_files_[index_], cv::IMREAD_COLOR);
    cv::Mat right = cv::imread(right_files_[index_], cv::IMREAD_COLOR);
    ++index_;
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

    esmstereo::PostprocessConfig post;
    post.padded = {nh, nw};
    post.original = {left.rows, left.cols};
    post.max_disp =
        static_cast<float>(get_parameter("max_disp").as_double());
    std::vector<uint16_t> disp_u16;
    esmstereo::PostprocessDisparity(outputs[0].data.data(), post, &disp_u16);

    cv::Mat disp(left.rows, left.cols, CV_16UC1, disp_u16.data());
    disp_pub_->publish(*cv_bridge::CvImage(
        std_msgs::msg::Header(), "mono16", disp).toImageMsg());
    RCLCPP_INFO_THROTTLE(get_logger(), *get_clock(), 2000,
                         "inference %.2f ms (%.1f Hz)", ms, 1e3 / ms);
  }

  std::vector<std::string> left_files_, right_files_;
  size_t index_ = 0;
  std::unique_ptr<esmstereo::PjrtRunner> runner_;
  rclcpp::Publisher<sensor_msgs::msg::Image>::SharedPtr left_pub_, right_pub_,
      disp_pub_;
  rclcpp::TimerBase::SharedPtr timer_;
};

int main(int argc, char** argv) {
  rclcpp::init(argc, argv);
  rclcpp::spin(std::make_shared<StereoPublisher>());
  rclcpp::shutdown();
  return 0;
}
