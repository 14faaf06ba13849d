#include "stereo_pipeline.h"

#include <algorithm>
#include <cstring>

namespace esmstereo {

namespace {
constexpr float kMean[3] = {0.485f, 0.456f, 0.406f};
constexpr float kStd[3] = {0.229f, 0.224f, 0.225f};
}  // namespace

bool PreprocessImage(const uint8_t* rgb, int height, int width,
                     const PreprocessConfig& cfg, std::vector<float>* out) {
  const int th = cfg.target.height, tw = cfg.target.width;
  if (height > th || width > tw) return false;
  const int top = cfg.pad_top ? th - height : 0;
  const int left = cfg.pad_right ? 0 : tw - width;
  out->assign(static_cast<size_t>(th) * tw * 3, 0.0f);
  for (int y = 0; y < height; ++y) {
    const uint8_t* src = rgb + static_cast<size_t>(y) * width * 3;
    float* dst = out->data() + (static_cast<size_t>(y + top) * tw + left) * 3;
    for (int x = 0; x < width; ++x) {
      for (int c = 0; c < 3; ++c) {
        dst[x * 3 + c] =
            (src[x * 3 + c] / 255.0f - kMean[c]) / kStd[c];
      }
    }
  }
  return true;
}

void MedianFilter5x5(const float* src, int height, int width, float* dst) {
  float window[25];
  for (int y = 0; y < height; ++y) {
    for (int x = 0; x < width; ++x) {
      int n = 0;
      for (int dy = -2; dy <= 2; ++dy) {
        const int yy = std::clamp(y + dy, 0, height - 1);
        for (int dx = -2; dx <= 2; ++dx) {
          const int xx = std::clamp(x + dx, 0, width - 1);
          window[n++] = src[yy * width + xx];
        }
      }
      std::nth_element(window, window + 12, window + 25);
      dst[y * width + x] = window[12];
    }
  }
}

void PostprocessDisparity(const float* disp, const PostprocessConfig& cfg,
                          std::vector<uint16_t>* out) {
  const int ph = cfg.padded.height, pw = cfg.padded.width;
  const int oh = cfg.original.height, ow = cfg.original.width;
  const int top = cfg.pad_top ? ph - oh : 0;
  const int left = cfg.pad_right ? 0 : pw - ow;

  // crop padding
  std::vector<float> cropped(static_cast<size_t>(oh) * ow);
  for (int y = 0; y < oh; ++y) {
    std::memcpy(cropped.data() + static_cast<size_t>(y) * ow,
                disp + (static_cast<size_t>(y + top) * pw + left),
                sizeof(float) * ow);
  }

  std::vector<float> filtered;
  const float* final_disp = cropped.data();
  if (cfg.median_filter) {
    filtered.resize(cropped.size());
    MedianFilter5x5(cropped.data(), oh, ow, filtered.data());
    final_disp = filtered.data();
  }

  out->resize(cropped.size());
  for (size_t i = 0; i < cropped.size(); ++i) {
    const float d = final_disp[i];
    const bool valid = d > 0.0f && d < cfg.max_disp;
    (*out)[i] = valid
        ? static_cast<uint16_t>(std::min(d * 256.0f, 65535.0f))
        : 0;
  }
}

void PostprocessDisparityConf(const float* disp, const float* conf,
                              float threshold, const PostprocessConfig& cfg,
                              std::vector<uint16_t>* out,
                              std::vector<float>* conf_out) {
  const int ph = cfg.padded.height, pw = cfg.padded.width;
  const int oh = cfg.original.height, ow = cfg.original.width;
  const int top = cfg.pad_top ? ph - oh : 0;
  const int left = cfg.pad_right ? 0 : pw - ow;

  std::vector<float> cropped(static_cast<size_t>(oh) * ow);
  std::vector<float> conf_c(cropped.size());
  for (int y = 0; y < oh; ++y) {
    std::memcpy(cropped.data() + static_cast<size_t>(y) * ow,
                disp + (static_cast<size_t>(y + top) * pw + left),
                sizeof(float) * ow);
    std::memcpy(conf_c.data() + static_cast<size_t>(y) * ow,
                conf + (static_cast<size_t>(y + top) * pw + left),
                sizeof(float) * ow);
  }

  std::vector<float> filtered;
  const float* final_disp = cropped.data();
  if (cfg.median_filter) {
    filtered.resize(cropped.size());
    MedianFilter5x5(cropped.data(), oh, ow, filtered.data());
    final_disp = filtered.data();
  }

  out->resize(cropped.size());
  for (size_t i = 0; i < cropped.size(); ++i) {
    const float d = final_disp[i];
    const bool valid =
        d > 0.0f && d < cfg.max_disp && conf_c[i] >= threshold;
    (*out)[i] = valid
        ? static_cast<uint16_t>(std::min(d * 256.0f, 65535.0f))
        : 0;
  }
  if (conf_out != nullptr) *conf_out = std::move(conf_c);
}

}  // namespace esmstereo
