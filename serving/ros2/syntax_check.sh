#!/bin/sh
# Syntax/type-check the ROS2 publisher node without a ROS distro: compile
# against the minimal API stubs in stubs/ (run from serving/ros2/).
# A real build still needs ament + rclcpp (CMakeLists.txt).
set -e
cd "$(dirname "$0")"
OPENCV_INC=$(pkg-config --cflags-only-I opencv4 2>/dev/null || echo "-I/usr/include/opencv4")
g++ -std=c++17 -fsyntax-only -Istubs -I../include $OPENCV_INC \
    src/stereo_publisher_node.cc
echo "stereo_publisher_node.cc: syntax OK"
g++ -std=c++17 -fsyntax-only -Istubs -I../include $OPENCV_INC \
    src/stereo_publisher_conf_node.cc
echo "stereo_publisher_conf_node.cc: syntax OK"
