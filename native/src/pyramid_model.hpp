// Native inference for the dense-pyramid (shear-warp) flagship model.
//
// The training-side renderer sweeps slabs with MXU matmuls
// (taichi_nerfs_tpu/render/swr.py); on CPU the natural equivalent is a
// plain per-ray march of the *baked* grid: trilinear-sample the fused
// (R, R, R, F) grid along each ray, composite the F-1 feature channels
// front-to-back (deferred shading, models/pyramid.py), then run the rgb
// MLP once per pixel on the opacity-normalized feature accumulator.
// Plays the role the reference's AOT kernels + app core play for its
// model (deployment/InstantNGP/utils/app_fp32.cpp:259-306).
#pragma once

#include <array>
#include <cstdint>
#include <string>
#include <vector>

namespace tnerf {

struct PyramidDeployConfig {
  int width = 800, height = 800;
  float fx = 0, fy = 0, cx = 0, cy = 0;
  float scale = 0.5f;
  int grid_res = 256;
  int features = 16;  // channel 0 = sigma (baked, already exponentiated)
  int rgb_width = 64;
  bool deferred = true;
  bool white_bg = true;
  float t_threshold = 1e-2f;

  static PyramidDeployConfig FromJsonFile(const std::string& path);
};

class PyramidModel {
 public:
  // Loads config.json + grid.bin + rgb MLP .bin files from an export dir.
  explicit PyramidModel(const std::string& dir);

  // Renders with the given camera pose (3x4 row-major camera-to-world).
  // Returns RGB float image (h*w*3), row-major, y-down.
  std::vector<float> Render(const std::array<float, 12>& pose,
                            int n_threads = 0) const;

  const PyramidDeployConfig& config() const { return cfg_; }

  // Trilinear grid sample at world xyz (for tests): out[features].
  void SampleGrid(const std::array<float, 3>& xyz, float* out) const;

 private:
  void RenderRay(float ox, float oy, float oz, float dx, float dy, float dz,
                 float* rgb_out) const;
  void ShadePixel(const float* feat_acc, float opacity, const float* dir,
                  float* rgb) const;

  PyramidDeployConfig cfg_;
  std::vector<float> grid_;  // (R, R, R, F), x-major like the export
  // macro-occupancy: one byte per 8^3 cell block (dilated by one cell
  // for the trilinear footprint); empty blocks are skipped by the ray
  // march — the role the reference's density bitfield plays for its
  // marcher (modules/ray_march.py:60-74)
  std::vector<uint8_t> occ_;
  int occ_res_ = 0;  // ceil(R / 8)
  std::vector<float> rgb_w0_, rgb_w1_, rgb_w2_;  // torch (out, in) layout
};

}  // namespace tnerf
