#pragma once
#include <memory>
#include <string>
#include <opencv2/core.hpp>
#include <sensor_msgs/msg/image.hpp>
#include <std_msgs/msg/header.hpp>
namespace cv_bridge {
struct CvImage {
  CvImage(std_msgs::msg::Header h, std::string enc, cv::Mat m) {}
  std::shared_ptr<sensor_msgs::msg::Image> toImageMsg() const {
    return std::make_shared<sensor_msgs::msg::Image>();
  }
};
}  // namespace cv_bridge
