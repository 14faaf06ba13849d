#pragma once
#include <string>
namespace std_msgs { namespace msg {
struct Header { std::string frame_id; };
} }
