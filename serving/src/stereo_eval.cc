#include "stereo_eval.h"

#include <algorithm>
#include <cmath>

namespace esmstereo {

namespace {

struct Bucket {
  float lo, hi;
  uint8_t r, g, b;
};

// KITTI stereo devkit buckets over the combined ratio min(err/3, rel/0.05).
constexpr Bucket kBuckets[] = {
    {0.0f / 3, 0.1875f / 3, 49, 54, 149},
    {0.1875f / 3, 0.375f / 3, 69, 117, 180},
    {0.375f / 3, 0.75f / 3, 116, 173, 209},
    {0.75f / 3, 1.5f / 3, 171, 217, 233},
    {1.5f / 3, 3.0f / 3, 224, 243, 248},
    {3.0f / 3, 6.0f / 3, 254, 224, 144},
    {6.0f / 3, 12.0f / 3, 253, 174, 97},
    {12.0f / 3, 24.0f / 3, 244, 109, 67},
    {24.0f / 3, 48.0f / 3, 215, 48, 39},
    {48.0f / 3, 1e30f, 165, 0, 38},
};

}  // namespace

EvalResult EvaluateDisparity(const float* est, const float* gt, int height,
                             int width, float max_disp) {
  EvalResult res;
  double err_sum = 0.0;
  int d1 = 0, bad3 = 0;
  for (int i = 0; i < height * width; ++i) {
    const float g = gt[i];
    if (g <= 0.0f || g >= max_disp) continue;
    const float e = std::fabs(est[i] - g);
    err_sum += e;
    if (e > 3.0f) {
      ++bad3;
      if (e / g > 0.05f) ++d1;
    }
    ++res.valid_pixels;
  }
  if (res.valid_pixels > 0) {
    res.epe = err_sum / res.valid_pixels;
    res.d1 = static_cast<double>(d1) / res.valid_pixels;
    res.bad3 = static_cast<double>(bad3) / res.valid_pixels;
  }
  return res;
}

EvalResult EvaluateDisparityConf(const float* est, const float* gt,
                                 const float* conf, float threshold,
                                 int height, int width, float max_disp,
                                 double* coverage) {
  EvalResult res;
  double err_sum = 0.0;
  int d1 = 0, bad3 = 0, gt_valid = 0;
  for (int i = 0; i < height * width; ++i) {
    const float g = gt[i];
    if (g <= 0.0f || g >= max_disp) continue;
    ++gt_valid;
    if (conf[i] < threshold) continue;
    const float e = std::fabs(est[i] - g);
    err_sum += e;
    if (e > 3.0f) {
      ++bad3;
      if (e / g > 0.05f) ++d1;
    }
    ++res.valid_pixels;
  }
  if (res.valid_pixels > 0) {
    res.epe = err_sum / res.valid_pixels;
    res.d1 = static_cast<double>(d1) / res.valid_pixels;
    res.bad3 = static_cast<double>(bad3) / res.valid_pixels;
  }
  if (coverage != nullptr) {
    *coverage = gt_valid > 0
        ? static_cast<double>(res.valid_pixels) / gt_valid : 0.0;
  }
  return res;
}

void DepthToDisparity(const uint16_t* depth_cm, int height, int width,
                      double fx, double baseline_m, float* disparity) {
  for (int i = 0; i < height * width; ++i) {
    const double depth_m = depth_cm[i] / 100.0;
    if (depth_cm[i] == 0 || depth_m >= 655.35) {
      disparity[i] = 0.0f;
    } else {
      disparity[i] = static_cast<float>(fx * baseline_m / depth_m);
    }
  }
}

void ErrorColormap(const float* est, const float* gt, int height, int width,
                   uint8_t* rgb_out) {
  for (int i = 0; i < height * width; ++i) {
    uint8_t* px = rgb_out + 3 * i;
    const float g = gt[i];
    if (g <= 0.0f) {
      px[0] = px[1] = px[2] = 0;
      continue;
    }
    const float e = std::fabs(est[i] - g);
    const float ratio = std::min(e / 3.0f, (e / g) / 0.05f);
    for (const auto& bkt : kBuckets) {
      if (ratio >= bkt.lo && ratio < bkt.hi) {
        px[0] = bkt.r;
        px[1] = bkt.g;
        px[2] = bkt.b;
        break;
      }
    }
  }
  // legend strip: 10 rows tall, 20 px per bucket
  constexpr int kDistance = 20;
  for (int bi = 0; bi < 10; ++bi) {
    for (int y = 0; y < std::min(10, height); ++y) {
      for (int x = bi * kDistance;
           x < std::min((bi + 1) * kDistance, width); ++x) {
        uint8_t* px = rgb_out + 3 * (y * width + x);
        px[0] = kBuckets[bi].r;
        px[1] = kBuckets[bi].g;
        px[2] = kBuckets[bi].b;
      }
    }
  }
}

}  // namespace esmstereo
