#include "ngp_model.hpp"

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <stdexcept>
#include <thread>

#include "nn_math.hpp"
#include "tagged_io.hpp"

namespace tnerf {

namespace {

constexpr uint32_t kPrimes[3] = {1u, 2654435761u, 805459861u};
constexpr float kSqrt3 = 1.7320508075688772f;

}  // namespace

DeployConfig DeployConfig::FromJsonFile(const std::string& path) {
  FlatJson j(path);
  DeployConfig c;
  c.width = static_cast<int>(j.Num("width", c.width));
  c.height = static_cast<int>(j.Num("height", c.height));
  c.fx = static_cast<float>(j.Num("fx", 0));
  c.fy = static_cast<float>(j.Num("fy", 0));
  c.cx = static_cast<float>(j.Num("cx", c.width * 0.5));
  c.cy = static_cast<float>(j.Num("cy", c.height * 0.5));
  c.scale = static_cast<float>(j.Num("scale", c.scale));
  c.grid_size = static_cast<int>(j.Num("grid_size", c.grid_size));
  c.cascades = static_cast<int>(j.Num("cascades", c.cascades));
  c.levels = static_cast<int>(j.Num("levels", c.levels));
  c.feat_per_level = static_cast<int>(j.Num("feat_per_level", 2));
  c.log2_T = static_cast<int>(j.Num("log2_T", c.log2_T));
  c.base_res = static_cast<float>(j.Num("base_res", c.base_res));
  c.log_b = static_cast<float>(j.Num("log_b", 0));
  c.xyz_width = static_cast<int>(j.Num("xyz_width", c.xyz_width));
  c.xyz_out = static_cast<int>(j.Num("xyz_out", c.xyz_out));
  c.rgb_width = static_cast<int>(j.Num("rgb_width", c.rgb_width));
  c.rgb_depth = static_cast<int>(j.Num("rgb_depth", c.rgb_depth));
  c.exp_step_factor =
      static_cast<float>(j.Num("exp_step_factor", c.exp_step_factor));
  c.t_threshold = static_cast<float>(j.Num("t_threshold", c.t_threshold));
  c.max_samples = static_cast<int>(j.Num("max_samples", c.max_samples));
  c.white_bg = j.Num("white_bg", 1) != 0;
  return c;
}

NgpModel::NgpModel(const std::string& dir) {
  cfg_ = DeployConfig::FromJsonFile(dir + "/config.json");
  // level geometry — mirrors build_layout (ops/hash_encoder.py:65-94)
  int64_t offset = 0;
  int64_t max_params = int64_t{1} << cfg_.log2_T;
  for (int i = 0; i < cfg_.levels; ++i) {
    LevelInfo info;
    float scale =
        cfg_.base_res * std::exp(static_cast<float>(i) * cfg_.log_b) - 1.0f;
    info.scale = scale;
    info.resolution = static_cast<int>(std::ceil(scale)) + 1;
    int64_t full = static_cast<int64_t>(info.resolution) * info.resolution *
                   info.resolution;
    int64_t params = std::min(max_params, AlignTo(full, 8));
    info.map_size = static_cast<uint32_t>(params);
    info.offset = offset;
    info.fast_hash = full > params;
    offset += params;
    levels_.push_back(info);
  }

  hash_table_ = ReadTaggedFile(dir + "/hash_embedding.bin").AsFloat();
  if (static_cast<int64_t>(hash_table_.size()) !=
      offset * cfg_.feat_per_level)
    throw std::runtime_error("hash table size mismatch");

  // sigma net: w0 (xyz_width, levels*F), w1 (xyz_out, xyz_width)
  std::vector<float> sw = ReadTaggedFile(dir + "/sigma_weights.bin").AsFloat();
  int in0 = cfg_.levels * cfg_.feat_per_level;
  size_t n0 = static_cast<size_t>(cfg_.xyz_width) * in0;
  size_t n1 = static_cast<size_t>(cfg_.xyz_out) * cfg_.xyz_width;
  if (sw.size() != n0 + n1)
    throw std::runtime_error("sigma weights size mismatch");
  xyz_w0_.assign(sw.begin(), sw.begin() + n0);
  xyz_w1_.assign(sw.begin() + n0, sw.end());

  // rgb net: w0 (W, 16+xyz_out), rgb_depth-1 hidden (W, W), then the
  // zero-padded square output (W, W; 3 live rows, utils.py:231-233)
  std::vector<float> rw = ReadTaggedFile(dir + "/rgb_weights.bin").AsFloat();
  int rin = 16 + cfg_.xyz_out;
  size_t hw = static_cast<size_t>(cfg_.rgb_width) * cfg_.rgb_width;
  size_t want = static_cast<size_t>(cfg_.rgb_width) * rin +
                static_cast<size_t>(cfg_.rgb_depth - 1) * hw + hw;
  if (rw.size() != want)
    throw std::runtime_error("rgb weights size mismatch");
  rgb_w_.clear();
  size_t off = 0;
  for (int d = 0; d <= cfg_.rgb_depth; ++d) {
    size_t n = (d == 0) ? static_cast<size_t>(cfg_.rgb_width) * rin : hw;
    rgb_w_.emplace_back(rw.begin() + off, rw.begin() + off + n);
    off += n;
  }

  if (cfg_.xyz_width > 128 || cfg_.rgb_width > 128 ||
      cfg_.xyz_out > 112 || cfg_.levels * cfg_.feat_per_level > 128 ||
      cfg_.levels > 16)
    throw std::runtime_error("MLP width exceeds the stack scratch bound");

  // bitfield: uint8 per 8 cells (cascades * grid^3 / 8 bytes)
  TaggedTensor bf = ReadTaggedFile(dir + "/density_bitfield.bin");
  bitfield_.assign(bf.bytes.begin(), bf.bytes.end());
}

void NgpModel::HashEncode(const float* x01, float* out) const {
  int F = cfg_.feat_per_level;
  // two passes: compute ALL corner rows first and software-prefetch
  // them, then accumulate.  The gathers are random across a table far
  // bigger than L2, so the encode is DRAM-latency-bound; issuing the
  // 8*levels misses concurrently instead of serially is the CPU
  // analogue of the coalesced gather the reference tunes block_dim for
  // (hash_encoder.py:82-87)
  const float* entries[128];  // levels (<= 16, checked at load) x 8
  float weights[128];
  int n = 0;
  for (size_t lv = 0; lv < levels_.size(); ++lv) {
    const LevelInfo& L = levels_[lv];
    float pos[3], frac[3];
    uint32_t g[3];
    for (int d = 0; d < 3; ++d) {
      pos[d] = x01[d] * L.scale + 0.5f;
      float fl = std::floor(pos[d]);
      frac[d] = pos[d] - fl;
      g[d] = static_cast<uint32_t>(std::max(fl, 0.0f));
    }
    for (int f = 0; f < F; ++f) out[lv * F + f] = 0;
    for (int c = 0; c < 8; ++c) {
      uint32_t q[3];
      float w = 1.0f;
      for (int d = 0; d < 3; ++d) {
        int bit = (c >> d) & 1;
        q[d] = g[d] + static_cast<uint32_t>(bit);
        w *= bit ? frac[d] : (1.0f - frac[d]);
      }
      uint32_t h;
      if (L.fast_hash) {
        h = q[0] * kPrimes[0] ^ q[1] * kPrimes[1] ^ q[2] * kPrimes[2];
      } else {
        uint32_t r = static_cast<uint32_t>(L.resolution);
        h = q[0] + q[1] * r + q[2] * r * r;
      }
      int64_t idx = L.offset + static_cast<int64_t>(h % L.map_size);
      const float* entry = hash_table_.data() + idx * F;
      __builtin_prefetch(entry, 0, 0);
      entries[n] = entry;
      weights[n] = w;
      ++n;
    }
  }
  n = 0;
  for (size_t lv = 0; lv < levels_.size(); ++lv) {
    for (int c = 0; c < 8; ++c, ++n) {
      const float* entry = entries[n];
      float w = weights[n];
      for (int f = 0; f < F; ++f) out[lv * F + f] += w * entry[f];
    }
  }
}

// stack scratch bound for MLP activations: no per-sample heap traffic
// in the innermost loop (this fn runs once per live sample)
static constexpr int kMaxWidth = 128;

void NgpModel::EvalMlp(const float* feat, const float* dir, float* sigma,
                       float* rgb) const {
  int in0 = cfg_.levels * cfg_.feat_per_level;
  float h0[kMaxWidth];
  float geo[kMaxWidth];
  MatVec(xyz_w0_.data(), feat, h0, cfg_.xyz_width, in0);
  for (int i = 0; i < cfg_.xyz_width; ++i) h0[i] = Relu(h0[i]);
  MatVec(xyz_w1_.data(), h0, geo, cfg_.xyz_out, cfg_.xyz_width);
  *sigma = std::exp(std::min(geo[0], 15.0f));

  // rgb net input: [SH16((d+1)/2), geo]
  float dn[3] = {(dir[0] + 1.0f) * 0.5f, (dir[1] + 1.0f) * 0.5f,
                 (dir[2] + 1.0f) * 0.5f};
  float rin[kMaxWidth];
  Sh16(dn, rin);
  std::memcpy(rin + 16, geo,
              sizeof(float) * static_cast<size_t>(cfg_.xyz_out));
  float ha[kMaxWidth];
  float hb[kMaxWidth];
  MatVec(rgb_w_[0].data(), rin, ha, cfg_.rgb_width, 16 + cfg_.xyz_out);
  for (int i = 0; i < cfg_.rgb_width; ++i) ha[i] = Relu(ha[i]);
  float* cur = ha;
  float* nxt = hb;
  for (int d = 1; d < cfg_.rgb_depth; ++d) {
    MatVec(rgb_w_[d].data(), cur, nxt, cfg_.rgb_width, cfg_.rgb_width);
    for (int i = 0; i < cfg_.rgb_width; ++i) nxt[i] = Relu(nxt[i]);
    std::swap(cur, nxt);
  }
  const std::vector<float>& wout = rgb_w_.back();
  for (int o = 0; o < 3; ++o) {
    const float* row = wout.data() + static_cast<int64_t>(o) * cfg_.rgb_width;
    float acc = 0;
    for (int i = 0; i < cfg_.rgb_width; ++i) acc += row[i] * cur[i];
    rgb[o] = Sigmoid(acc);
  }
}

bool NgpModel::Occupied(const float* xyz, float dt) const {
  int g = cfg_.grid_size;
  // cascade = max(mip_from_pos, mip_from_dt) (modules/utils.py:78-92)
  float maxc = std::max({std::fabs(xyz[0]), std::fabs(xyz[1]),
                         std::fabs(xyz[2])});
  int exponent;
  std::frexp(maxc, &exponent);
  int mip_pos = std::min(cfg_.cascades - 1, std::max(0, exponent + 1));
  std::frexp(dt * static_cast<float>(g), &exponent);
  int mip_dt = std::min(cfg_.cascades - 1, std::max(0, exponent));
  int mip = std::max(mip_pos, mip_dt);
  float bound = std::min(std::ldexp(1.0f, mip - 1), cfg_.scale);
  int nx[3];
  for (int d = 0; d < 3; ++d) {
    float v = 0.5f * (xyz[d] / bound + 1.0f) * g;
    nx[d] = std::min(g - 1, std::max(0, static_cast<int>(v)));
  }
  // morton index (modules/utils.py:95-122)
  auto expand = [](uint32_t v) {
    v = (v * 0x00010001u) & 0xFF0000FFu;
    v = (v * 0x00000101u) & 0x0F00F00Fu;
    v = (v * 0x00000011u) & 0xC30C30C3u;
    v = (v * 0x00000005u) & 0x49249249u;
    return v;
  };
  uint32_t m = expand(static_cast<uint32_t>(nx[0])) |
               (expand(static_cast<uint32_t>(nx[1])) << 1) |
               (expand(static_cast<uint32_t>(nx[2])) << 2);
  int64_t idx = static_cast<int64_t>(mip) * g * g * g + m;
  return bitfield_[static_cast<size_t>(idx >> 3)] &
         (uint8_t{1} << (idx & 7));
}

void NgpModel::RenderRay(float ox, float oy, float oz, float dx, float dy,
                         float dz, float* rgb_out) const {
  // slab AABB intersect against [-scale, scale]^3 (intersection.py:8-37)
  float t1 = -1e30f, t2 = 1e30f;
  float o[3] = {ox, oy, oz}, d[3] = {dx, dy, dz};
  for (int a = 0; a < 3; ++a) {
    float inv = 1.0f / (d[a] == 0 ? 1e-10f : d[a]);
    float lo = (-cfg_.scale - o[a]) * inv;
    float hi = (cfg_.scale - o[a]) * inv;
    if (lo > hi) std::swap(lo, hi);
    t1 = std::max(t1, lo);
    t2 = std::min(t2, hi);
  }
  float bg = cfg_.white_bg ? 1.0f : 0.0f;
  if (t2 <= 0 || t1 > t2) {
    rgb_out[0] = rgb_out[1] = rgb_out[2] = bg;
    return;
  }
  float t = std::max(t1, 0.01f);
  float dt_min = kSqrt3 / 1024.0f;
  float dt_max = 2.0f * kSqrt3 * cfg_.scale / cfg_.grid_size;
  float T = 1.0f;
  float acc[3] = {0, 0, 0};
  int samples = 0;
  float feat[kMaxWidth];
  while (t < t2 && samples < cfg_.max_samples && T > cfg_.t_threshold) {
    float dt = std::min(std::max(t * cfg_.exp_step_factor, dt_min), dt_max);
    float xyz[3] = {ox + t * dx, oy + t * dy, oz + t * dz};
    if (Occupied(xyz, dt)) {
      float x01[3];
      for (int a = 0; a < 3; ++a)
        x01[a] = (xyz[a] + cfg_.scale) / (2.0f * cfg_.scale);
      HashEncode(x01, feat);
      float sigma, rgb[3];
      EvalMlp(feat, d, &sigma, rgb);
      float alpha = 1.0f - std::exp(-sigma * dt);
      float w = alpha * T;
      for (int a = 0; a < 3; ++a) acc[a] += w * rgb[a];
      T *= 1.0f - alpha;
      ++samples;
    }
    t += dt;
  }
  for (int a = 0; a < 3; ++a) rgb_out[a] = acc[a] + bg * T;
}

std::vector<float> NgpModel::Render(const std::array<float, 12>& pose,
                                    int n_threads) const {
  int w = cfg_.width, h = cfg_.height;
  std::vector<float> img(static_cast<size_t>(w) * h * 3);
  if (n_threads <= 0)
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
  n_threads = std::max(1, n_threads);
  auto worker = [&](int tid) {
    for (int y = tid; y < h; y += n_threads) {
      for (int x = 0; x < w; ++x) {
        // camera-frame dir (ray_utils.py:8-48 convention, +0.5 pixel center)
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

std::array<float, 4> NgpModel::EvalField(
    const std::array<float, 3>& xyz, const std::array<float, 3>& dir) const {
  std::vector<float> feat(
      static_cast<size_t>(cfg_.levels * cfg_.feat_per_level));
  float x01[3];
  for (int a = 0; a < 3; ++a)
    x01[a] = (xyz[a] + cfg_.scale) / (2.0f * cfg_.scale);
  HashEncode(x01, feat.data());
  float sigma, rgb[3];
  EvalMlp(feat.data(), dir.data(), &sigma, rgb);
  return {sigma, rgb[0], rgb[1], rgb[2]};
}

void WritePpm(const std::string& path, const std::vector<float>& rgb, int w,
              int h) {
  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) throw std::runtime_error("cannot open " + path);
  std::fprintf(f, "P6\n%d %d\n255\n", w, h);
  std::vector<uint8_t> row(static_cast<size_t>(w) * 3);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w * 3; ++x) {
      float v = rgb[static_cast<size_t>(y) * w * 3 + x];
      row[static_cast<size_t>(x)] =
          static_cast<uint8_t>(std::min(255.0f, std::max(0.0f, v * 255.0f)));
    }
    std::fwrite(row.data(), 1, row.size(), f);
  }
  std::fclose(f);
}

void WriteBmp(const std::string& path, const std::vector<float>& rgb, int w,
              int h) {
  // 24bpp BMP, bottom-up rows, 4-byte row padding
  int row_bytes = (w * 3 + 3) & ~3;
  uint32_t data_size = static_cast<uint32_t>(row_bytes) * h;
  uint32_t file_size = 54 + data_size;
  uint8_t header[54] = {0};
  header[0] = 'B';
  header[1] = 'M';
  std::memcpy(header + 2, &file_size, 4);
  uint32_t off = 54, hdr = 40, planes_bpp = 1 | (24 << 16);
  std::memcpy(header + 10, &off, 4);
  std::memcpy(header + 14, &hdr, 4);
  std::memcpy(header + 18, &w, 4);
  std::memcpy(header + 22, &h, 4);
  std::memcpy(header + 26, &planes_bpp, 4);
  std::memcpy(header + 34, &data_size, 4);
  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) throw std::runtime_error("cannot open " + path);
  std::fwrite(header, 1, 54, f);
  std::vector<uint8_t> row(static_cast<size_t>(row_bytes), 0);
  for (int y = h - 1; y >= 0; --y) {
    for (int x = 0; x < w; ++x) {
      for (int c = 0; c < 3; ++c) {
        float v = rgb[(static_cast<size_t>(y) * w + x) * 3 + (2 - c)];
        row[static_cast<size_t>(x) * 3 + c] = static_cast<uint8_t>(
            std::min(255.0f, std::max(0.0f, v * 255.0f)));
      }
    }
    std::fwrite(row.data(), 1, row.size(), f);
  }
  std::fclose(f);
}

}  // namespace tnerf
