#pragma once
#include <cstdint>
#include <string>
#include <vector>
#include <std_msgs/msg/header.hpp>
namespace sensor_msgs { namespace msg {
struct Image {
  std_msgs::msg::Header header;
  uint32_t height = 0, width = 0, step = 0;
  std::string encoding;
  std::vector<uint8_t> data;
};
} }
