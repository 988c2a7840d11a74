// Native NGP inference model — the role of the reference's AOT kernel set
// (deployment/InstantNGP/taichi_ngp/kernels.py:198-571) and C++ app core
// (deployment/InstantNGP/utils/app_fp32.cpp:41-306): load exported weights,
// march rays through the occupancy bitfield, evaluate the hash-grid + MLP
// field, composite front-to-back, write an image.
//
// Pure CPU (multithreaded), no GPU/TPU dependency: the deployment target is
// edge inference from the tagged-binary weight export.
#pragma once

#include <array>
#include <cstdint>
#include <string>
#include <vector>

namespace tnerf {

struct DeployConfig {
  int width = 800, height = 800;
  float fx = 0, fy = 0, cx = 0, cy = 0;
  float scale = 0.5f;
  int grid_size = 128;
  int cascades = 1;
  // hash grid
  int levels = 16;
  int feat_per_level = 2;
  int log2_T = 19;
  float base_res = 16.0f;
  float log_b = 0.0f;  // per-level scale exponent
  // MLPs (widths + rgb hidden depth; the default config uses depth 2,
  // the mobile deployment config depth 1 — networks.py:111-132 vs
  // train.py:88-100)
  int xyz_width = 64;
  int xyz_out = 16;
  int rgb_width = 64;
  int rgb_depth = 2;
  float exp_step_factor = 0.0f;
  float t_threshold = 1e-2f;
  int max_samples = 1024;
  bool white_bg = true;

  static DeployConfig FromJsonFile(const std::string& path);
};

struct LevelInfo {
  int resolution;
  uint32_t map_size;
  int64_t offset;
  bool fast_hash;
  float scale;
};

class NgpModel {
 public:
  // Loads config.json + *.bin from an export directory.
  explicit NgpModel(const std::string& dir);

  // Renders with the given camera pose (3x4 row-major camera-to-world).
  // Returns RGB float image (h*w*3), row-major, y-down.
  std::vector<float> Render(const std::array<float, 12>& pose,
                            int n_threads = 0) const;

  const DeployConfig& config() const { return cfg_; }

  // Single-point field eval (for tests): xyz in [-scale, scale],
  // dir unit. Returns {sigma, r, g, b}.
  std::array<float, 4> EvalField(const std::array<float, 3>& xyz,
                                 const std::array<float, 3>& dir) const;

 private:
  void HashEncode(const float* xyz01, float* out) const;  // out[levels*F]
  void EvalMlp(const float* feat, const float* dir, float* sigma,
               float* rgb) const;
  bool Occupied(const float* xyz, float dt) const;
  void RenderRay(float ox, float oy, float oz, float dx, float dy, float dz,
                 float* rgb_out) const;

  DeployConfig cfg_;
  std::vector<LevelInfo> levels_;
  std::vector<float> hash_table_;      // (n_entries, F) interleaved
  std::vector<float> xyz_w0_, xyz_w1_;  // torch (out, in) layout
  // rgb chain: w[0] (W, 16+xyz_out), w[1..depth-1] (W, W), then the
  // zero-padded square output matrix (W, W; 3 live rows)
  std::vector<std::vector<float>> rgb_w_;
  std::vector<uint8_t> bitfield_;
};

// Tiny image writers (the reference vendors stb_image_write; we write
// PPM/BMP natively — no third-party code).
void WritePpm(const std::string& path, const std::vector<float>& rgb, int w,
              int h);
void WriteBmp(const std::string& path, const std::vector<float>& rgb, int w,
              int h);

}  // namespace tnerf
