#include "pyramid_model.hpp"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <stdexcept>
#include <thread>

#include "nn_math.hpp"
#include "tagged_io.hpp"

namespace tnerf {

PyramidDeployConfig PyramidDeployConfig::FromJsonFile(
    const std::string& path) {
  FlatJson j(path);
  PyramidDeployConfig c;
  c.width = static_cast<int>(j.Num("width", c.width));
  c.height = static_cast<int>(j.Num("height", c.height));
  c.fx = static_cast<float>(j.Num("fx", 0));
  c.fy = static_cast<float>(j.Num("fy", 0));
  c.cx = static_cast<float>(j.Num("cx", c.width * 0.5));
  c.cy = static_cast<float>(j.Num("cy", c.height * 0.5));
  c.scale = static_cast<float>(j.Num("scale", c.scale));
  c.grid_res = static_cast<int>(j.Num("grid_res", c.grid_res));
  c.features = static_cast<int>(j.Num("features", c.features));
  c.rgb_width = static_cast<int>(j.Num("rgb_width", c.rgb_width));
  c.deferred = j.Num("deferred", 1.0) != 0.0;
  c.white_bg = j.Num("white_bg", 1.0) != 0.0;
  c.t_threshold = static_cast<float>(j.Num("t_threshold", c.t_threshold));
  return c;
}

PyramidModel::PyramidModel(const std::string& dir) {
  cfg_ = PyramidDeployConfig::FromJsonFile(dir + "/config.json");
  grid_ = ReadTaggedFile(dir + "/grid.bin").AsFloat();
  int64_t want = static_cast<int64_t>(cfg_.grid_res) * cfg_.grid_res *
                 cfg_.grid_res * cfg_.features;
  if (static_cast<int64_t>(grid_.size()) != want)
    throw std::runtime_error("grid.bin size mismatch");
  rgb_w0_ = ReadTaggedFile(dir + "/rgb_w0.bin").AsFloat();
  rgb_w1_ = ReadTaggedFile(dir + "/rgb_w1.bin").AsFloat();
  rgb_w2_ = ReadTaggedFile(dir + "/rgb_w2.bin").AsFloat();
  int in0 = 16 + cfg_.features - 1;
  if (static_cast<int>(rgb_w0_.size()) != cfg_.rgb_width * in0 ||
      static_cast<int>(rgb_w1_.size()) != cfg_.rgb_width * cfg_.rgb_width ||
      static_cast<int>(rgb_w2_.size()) != 3 * cfg_.rgb_width)
    throw std::runtime_error("rgb mlp weight size mismatch");
  if (cfg_.rgb_width > 160 || cfg_.features > 64 || in0 > 160)
    throw std::runtime_error("MLP width exceeds the stack scratch bound");

  // build the macro-occupancy grid: block (bx,by,bz) is live when any
  // cell within one cell of the block has sigma above kSigmaEps (the
  // dilation covers the trilinear footprint).  Skipping is a BOUNDED
  // approximation, not exact: cells with sigma in (0, kSigmaEps]
  // contribute alpha <= kSigmaEps * dt in the non-skipped march — the
  // same bound the training path's skip_empty accepts
  int R = cfg_.grid_res, F = cfg_.features;
  occ_res_ = (R + 7) / 8;
  occ_.assign(static_cast<size_t>(occ_res_) * occ_res_ * occ_res_, 0);
  const float kSigmaEps = 1e-4f;
  for (int x = 0; x < R; ++x)
    for (int y = 0; y < R; ++y) {
      const float* row =
          grid_.data() + ((static_cast<int64_t>(x) * R + y) * R) * F;
      for (int z = 0; z < R; ++z) {
        if (row[static_cast<int64_t>(z) * F] <= kSigmaEps) continue;
        int bx0 = std::max(x - 1, 0) / 8, bx1 = std::min(x + 1, R - 1) / 8;
        int by0 = std::max(y - 1, 0) / 8, by1 = std::min(y + 1, R - 1) / 8;
        int bz0 = std::max(z - 1, 0) / 8, bz1 = std::min(z + 1, R - 1) / 8;
        for (int bx = bx0; bx <= bx1; ++bx)
          for (int by = by0; by <= by1; ++by)
            for (int bz = bz0; bz <= bz1; ++bz)
              occ_[(static_cast<size_t>(bx) * occ_res_ + by) * occ_res_ +
                   bz] = 1;
      }
    }
}

// Trilinear sample of the baked grid; voxel centers at -s + (i+0.5)h,
// zero outside the cube (the training renderer's resamples zero-pad —
// render/swr.py geometry notes).
void PyramidModel::SampleGrid(const std::array<float, 3>& xyz,
                              float* out) const {
  int R = cfg_.grid_res, F = cfg_.features;
  float h = 2.0f * cfg_.scale / R;
  float fx = (xyz[0] + cfg_.scale) / h - 0.5f;
  float fy = (xyz[1] + cfg_.scale) / h - 0.5f;
  float fz = (xyz[2] + cfg_.scale) / h - 0.5f;
  int bx = static_cast<int>(std::floor(fx));
  int by = static_cast<int>(std::floor(fy));
  int bz = static_cast<int>(std::floor(fz));
  float tx = fx - bx, ty = fy - by, tz = fz - bz;
  for (int f = 0; f < F; ++f) out[f] = 0.0f;
  for (int cz = 0; cz < 2; ++cz)
    for (int cy = 0; cy < 2; ++cy)
      for (int cx = 0; cx < 2; ++cx) {
        int ix = bx + cx, iy = by + cy, iz = bz + cz;
        if (ix < 0 || iy < 0 || iz < 0 || ix >= R || iy >= R || iz >= R)
          continue;
        float w = (cx ? tx : 1 - tx) * (cy ? ty : 1 - ty) *
                  (cz ? tz : 1 - tz);
        const float* cell =
            grid_.data() +
            ((static_cast<int64_t>(ix) * R + iy) * R + iz) * F;
        for (int f = 0; f < F; ++f) out[f] += w * cell[f];
      }
}

// stack scratch bound (no per-pixel heap traffic; checked at load)
static constexpr int kMaxW = 160;

void PyramidModel::ShadePixel(const float* feat_acc, float opacity,
                              const float* dir, float* rgb) const {
  int nf = cfg_.features - 1;
  int in0 = 16 + nf;
  float rin[kMaxW];
  float dn[3] = {(dir[0] + 1.0f) * 0.5f, (dir[1] + 1.0f) * 0.5f,
                 (dir[2] + 1.0f) * 0.5f};
  Sh16(dn, rin);
  float inv_op = 1.0f / std::max(opacity, 1e-6f);
  for (int f = 0; f < nf; ++f) rin[16 + f] = feat_acc[f] * inv_op;
  float h0[kMaxW];
  float h1[kMaxW];
  MatVec(rgb_w0_.data(), rin, h0, cfg_.rgb_width, in0);
  for (int i = 0; i < cfg_.rgb_width; ++i) h0[i] = Relu(h0[i]);
  MatVec(rgb_w1_.data(), h0, h1, cfg_.rgb_width, cfg_.rgb_width);
  for (int i = 0; i < cfg_.rgb_width; ++i) h1[i] = Relu(h1[i]);
  for (int o = 0; o < 3; ++o) {
    const float* row =
        rgb_w2_.data() + static_cast<int64_t>(o) * cfg_.rgb_width;
    float acc = 0;
    for (int i = 0; i < cfg_.rgb_width; ++i) acc += row[i] * h1[i];
    // premultiplied shading: rgb * opacity, background added by caller
    rgb[o] = Sigmoid(acc) * opacity;
  }
}

void PyramidModel::RenderRay(float ox, float oy, float oz, float dx,
                             float dy, float dz, float* rgb_out) const {
  float s = cfg_.scale;
  int F = cfg_.features;
  // slab AABB clip against [-s, s]^3
  float t0 = 0.0f, t1 = 1e9f;
  const float o[3] = {ox, oy, oz}, d[3] = {dx, dy, dz};
  for (int a = 0; a < 3; ++a) {
    float inv = 1.0f / (std::abs(d[a]) > 1e-9f ? d[a] : 1e-9f);
    float ta = (-s - o[a]) * inv, tb = (s - o[a]) * inv;
    if (ta > tb) std::swap(ta, tb);
    t0 = std::max(t0, ta);
    t1 = std::min(t1, tb);
  }
  int nf = F - 1;
  float feat_acc[64] = {0};
  float sample[64];
  float T = 1.0f;
  if (t0 < t1) {
    // one sample per grid-cell width along the ray — matches the sweep's
    // per-slab quadrature density
    float dt = 2.0f * s / cfg_.grid_res;
    float macro_h = 8.0f * dt;  // world size of an occupancy block
    for (float t = t0 + 0.5f * dt; t < t1 && T > cfg_.t_threshold;
         t += dt) {
      std::array<float, 3> p = {ox + t * dx, oy + t * dy, oz + t * dz};
      // macro-occupancy skip: jump empty 8^3 blocks to their exit plane
      int bx = static_cast<int>((p[0] + s) / macro_h);
      int by = static_cast<int>((p[1] + s) / macro_h);
      int bz = static_cast<int>((p[2] + s) / macro_h);
      bx = std::min(std::max(bx, 0), occ_res_ - 1);
      by = std::min(std::max(by, 0), occ_res_ - 1);
      bz = std::min(std::max(bz, 0), occ_res_ - 1);
      if (!occ_[(static_cast<size_t>(bx) * occ_res_ + by) * occ_res_ +
                bz]) {
        // distance to the block's exit along the ray (slab test within
        // the block's bounds), then resume on the next dt lattice point
        float texit = 1e9f;
        const int bidx[3] = {bx, by, bz};
        for (int a = 0; a < 3; ++a) {
          if (std::abs(d[a]) < 1e-9f) continue;
          float lo = -s + bidx[a] * macro_h, hi = lo + macro_h;
          float te = ((d[a] > 0 ? hi : lo) - p[a]) / d[a];
          texit = std::min(texit, te);
        }
        if (texit > 1e8f) texit = dt;  // degenerate direction
        // snap forward so the next iteration lands past the exit
        float skip = std::max(texit, 0.0f);
        t += std::floor(skip / dt) * dt;
        continue;
      }
      SampleGrid(p, sample);
      float sigma = std::max(sample[0], 0.0f);
      if (sigma <= 0.0f) continue;
      float alpha = 1.0f - std::exp(-sigma * dt);
      float w = alpha * T;
      for (int f = 0; f < nf; ++f) feat_acc[f] += w * sample[1 + f];
      T *= 1.0f - alpha;
    }
  }
  float opacity = 1.0f - T;
  ShadePixel(feat_acc, opacity, d, rgb_out);
  if (cfg_.white_bg)
    for (int c = 0; c < 3; ++c) rgb_out[c] += T;
}

std::vector<float> PyramidModel::Render(const std::array<float, 12>& pose,
                                        int n_threads) const {
  int w = cfg_.width, h = cfg_.height;
  std::vector<float> img(static_cast<size_t>(w) * h * 3);
  if (n_threads <= 0)
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
  n_threads = std::max(1, n_threads);
  auto worker = [&](int tid) {
    for (int y = tid; y < h; y += n_threads) {
      for (int x = 0; x < w; ++x) {
        float cd[3] = {(x - cfg_.cx + 0.5f) / cfg_.fx,
                       (y - cfg_.cy + 0.5f) / cfg_.fy, 1.0f};
        float dir[3];
        for (int a = 0; a < 3; ++a)
          dir[a] = pose[a * 4 + 0] * cd[0] + pose[a * 4 + 1] * cd[1] +
                   pose[a * 4 + 2] * cd[2];
        float n = std::sqrt(dir[0] * dir[0] + dir[1] * dir[1] +
                            dir[2] * dir[2]);
        for (int a = 0; a < 3; ++a) dir[a] /= n;
        RenderRay(pose[3], pose[7], pose[11], dir[0], dir[1], dir[2],
                  &img[(static_cast<size_t>(y) * w + x) * 3]);
      }
    }
  };
  std::vector<std::thread> pool;
  for (int i = 0; i < n_threads; ++i) pool.emplace_back(worker, i);
  for (auto& th : pool) th.join();
  return img;
}

}  // namespace tnerf
