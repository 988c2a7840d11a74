// C ABI for the Python ctypes bridge (tests + tools drive the native
// runner in-process instead of shelling out).  Mirrors the role of the
// reference's Taichi C-API boundary (vendored c_api headers) — ours is a
// 4-function surface.
#include <array>
#include <cstring>
#include <memory>
#include <string>

#include "ngp_model.hpp"

extern "C" {

void* tnerf_load(const char* export_dir) {
  try {
    return new tnerf::NgpModel(export_dir);
  } catch (...) {
    return nullptr;
  }
}

void tnerf_free(void* model) { delete static_cast<tnerf::NgpModel*>(model); }

// pose: 12 floats (3x4 row-major). out: w*h*3 floats.
int tnerf_render(void* model, const float* pose, float* out, int n_threads) {
  try {
    auto* m = static_cast<tnerf::NgpModel*>(model);
    std::array<float, 12> p;
    std::memcpy(p.data(), pose, sizeof(float) * 12);
    std::vector<float> img = m->Render(p, n_threads);
    std::memcpy(out, img.data(), img.size() * sizeof(float));
    return 0;
  } catch (...) {
    return 1;
  }
}

// xyz in [-scale,scale], dir unit; out: {sigma, r, g, b}
int tnerf_eval(void* model, const float* xyz, const float* dir, float* out) {
  try {
    auto* m = static_cast<tnerf::NgpModel*>(model);
    auto r = m->EvalField({xyz[0], xyz[1], xyz[2]}, {dir[0], dir[1], dir[2]});
    std::memcpy(out, r.data(), sizeof(float) * 4);
    return 0;
  } catch (...) {
    return 1;
  }
}

int tnerf_image_size(void* model, int* w, int* h) {
  auto* m = static_cast<tnerf::NgpModel*>(model);
  *w = m->config().width;
  *h = m->config().height;
  return 0;
}

}  // extern "C"
