// Shared scalar NN/json helpers for the native inference models
// (ngp_model.cpp, pyramid_model.cpp).  The role of the small device
// functions baked into the reference's AOT kernel set
// (deployment/InstantNGP/taichi_ngp/kernels.py:450-518).
#pragma once

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <fstream>
#include <sstream>
#include <stdexcept>
#include <string>

namespace tnerf {

// Minimal flat-JSON number reader ("key": value) — the export writes a
// one-level dict, so no full JSON parser is needed.
struct FlatJson {
  explicit FlatJson(const std::string& path) {
    std::ifstream f(path);
    if (!f) throw std::runtime_error("missing " + path);
    std::ostringstream ss;
    ss << f.rdbuf();
    text = ss.str();
  }
  double Num(const std::string& key, double fallback) const {
    auto pos = text.find("\"" + key + "\"");
    if (pos == std::string::npos) return fallback;
    pos = text.find(':', pos);
    if (pos == std::string::npos) return fallback;
    ++pos;
    while (pos < text.size() && (text[pos] == ' ' || text[pos] == '\t'))
      ++pos;
    if (text.compare(pos, 4, "true") == 0) return 1.0;
    if (text.compare(pos, 5, "false") == 0) return 0.0;
    return std::strtod(text.c_str() + pos, nullptr);
  }
  std::string Str(const std::string& key, const std::string& fallback) const {
    auto pos = text.find("\"" + key + "\"");
    if (pos == std::string::npos) return fallback;
    pos = text.find(':', pos);
    if (pos == std::string::npos) return fallback;
    pos = text.find('"', pos);
    if (pos == std::string::npos) return fallback;
    auto end = text.find('"', pos + 1);
    return text.substr(pos + 1, end - pos - 1);
  }
  std::string text;
};

inline float Relu(float x) { return x > 0 ? x : 0; }
inline float Sigmoid(float x) { return 1.0f / (1.0f + std::exp(-x)); }

// y[out] = W[out, in] @ x[in]  (torch (out, in) layout, row-major)
inline void MatVec(const float* w, const float* x, float* y, int out_dim,
                   int in_dim) {
  for (int o = 0; o < out_dim; ++o) {
    const float* row = w + static_cast<int64_t>(o) * in_dim;
    float acc = 0;
    for (int i = 0; i < in_dim; ++i) acc += row[i] * x[i];
    y[o] = acc;
  }
}

// Degree-4 real SH basis — coefficient-for-coefficient the training-side
// basis (taichi_nerfs_tpu/ops/sh.py; reference spherical_harmonics.py:7-59).
inline void Sh16(const float* d, float* out) {
  float x = d[0], y = d[1], z = d[2];
  float xy = x * y, xz = x * z, yz = y * z;
  float x2 = x * x, y2 = y * y, z2 = z * z;
  out[0] = 0.28209479177387814f;
  out[1] = -0.48860251190291987f * y;
  out[2] = 0.48860251190291987f * z;
  out[3] = -0.48860251190291987f * x;
  out[4] = 1.0925484305920792f * xy;
  out[5] = -1.0925484305920792f * yz;
  out[6] = 0.94617469575755997f * z2 - 0.31539156525251999f;
  out[7] = -1.0925484305920792f * xz;
  out[8] = 0.54627421529603959f * (x2 - y2);
  out[9] = 0.59004358992664352f * y * (-3.0f * x2 + y2);
  out[10] = 2.8906114426405538f * xy * z;
  out[11] = 0.45704579946446572f * y * (1.0f - 5.0f * z2);
  out[12] = 0.3731763325901154f * z * (5.0f * z2 - 3.0f);
  out[13] = 0.45704579946446572f * x * (1.0f - 5.0f * z2);
  out[14] = 1.4453057213202769f * z * (x2 - y2);
  out[15] = 0.59004358992664352f * x * (-x2 + 3.0f * y2);
}

inline int64_t AlignTo(int64_t x, int64_t y) { return (x + y - 1) / y * y; }

}  // namespace tnerf
