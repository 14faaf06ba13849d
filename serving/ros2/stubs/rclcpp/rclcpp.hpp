// Minimal rclcpp API stub for SYNTAX-CHECKING the ROS2 node in an
// environment without a ROS distro (serving/ros2/syntax_check.sh).
// Mirrors only the subset of the rclcpp API the node uses; NOT a runtime.
#pragma once
#include <chrono>
#include <cstdio>
#include <functional>
#include <map>
#include <memory>
#include <string>

namespace rclcpp {

class Logger {};
class Clock {};

class Parameter {
 public:
  Parameter() = default;
  explicit Parameter(std::string s) : s_(std::move(s)) {}
  explicit Parameter(int i) : i_(i) {}
  explicit Parameter(long i) : i_(i) {}
  explicit Parameter(double d) : d_(d) {}
  explicit Parameter(bool b) : b_(b) {}
  const std::string& as_string() const { return s_; }
  long as_int() const { return i_; }
  double as_double() const { return d_; }
  bool as_bool() const { return b_; }

 private:
  std::string s_;
  long i_ = 0;
  double d_ = 0.0;
  bool b_ = false;
};

template <typename MsgT>
class Publisher {
 public:
  using SharedPtr = std::shared_ptr<Publisher<MsgT>>;
  void publish(const MsgT&) {}
};

class TimerBase {
 public:
  using SharedPtr = std::shared_ptr<TimerBase>;
};

class Node {
 public:
  explicit Node(const std::string&) {}
  virtual ~Node() = default;

  template <typename T>
  void declare_parameter(const std::string& name, const T& value) {
    params_[name] = Parameter(value);
  }
  Parameter get_parameter(const std::string& name) { return params_[name]; }

  template <typename MsgT>
  typename Publisher<MsgT>::SharedPtr create_publisher(const std::string&,
                                                       int) {
    return std::make_shared<Publisher<MsgT>>();
  }
  template <typename DurationT, typename CallbackT>
  TimerBase::SharedPtr create_wall_timer(DurationT, CallbackT) {
    return std::make_shared<TimerBase>();
  }
  Logger get_logger() { return {}; }
  Clock* get_clock() { return &clock_; }

 private:
  std::map<std::string, Parameter> params_;
  Clock clock_;
};

inline void init(int, char**) {}
template <typename NodeT>
inline void spin(std::shared_ptr<NodeT>) {}
inline void shutdown() {}

}  // namespace rclcpp

#define RCLCPP_FATAL(logger, ...) std::fprintf(stderr, __VA_ARGS__)
#define RCLCPP_ERROR(logger, ...) std::fprintf(stderr, __VA_ARGS__)
#define RCLCPP_WARN(logger, ...) std::fprintf(stderr, __VA_ARGS__)
#define RCLCPP_INFO_THROTTLE(logger, clock, ms, ...) \
  std::fprintf(stderr, __VA_ARGS__)
