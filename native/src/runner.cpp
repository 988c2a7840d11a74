// Deployment inference runner — the role of the reference's
// Android/iOS demo drivers (deployment/InstantNGP/Android_Demo/main.cpp,
// utils/app_fp32.cpp:259-306): load an exported model directory, render one
// frame from the exported pose (or an orbit step), write the image.
//
// Usage: tnerf_runner <export_dir> <out.{ppm,bmp}> [--orbit deg] [--threads N]
#include <array>
#include <cstdio>
#include <cstring>
#include <chrono>
#include <cmath>
#include <string>

#include "ngp_model.hpp"
#include "nn_math.hpp"
#include "pyramid_model.hpp"
#include "tagged_io.hpp"

namespace {

// Orbit the camera around the scene y-axis (gui.py:28-74 spirit).
std::array<float, 12> RotateY(const std::array<float, 12>& pose, float deg) {
  float rad = deg * 3.14159265358979f / 180.0f;
  float c = std::cos(rad), s = std::sin(rad);
  // R_y @ pose (rotate both axes and position)
  std::array<float, 12> out{};
  const float R[9] = {c, 0, s, 0, 1, 0, -s, 0, c};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 4; ++j) {
      float acc = 0;
      for (int k = 0; k < 3; ++k) acc += R[i * 3 + k] * pose[k * 4 + j];
      out[i * 4 + j] = acc;
    }
  return out;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s <export_dir> <out.{ppm,bmp}> [--orbit deg] "
                 "[--threads N]\n",
                 argv[0]);
    return 2;
  }
  std::string dir = argv[1];
  std::string out = argv[2];
  float orbit = 0;
  int threads = 0;
  int bench = 0;  // --bench N: time N warm frames on an orbit (fps record
                  // vs the reference's mobile demos, README.md:74-76)
  for (int i = 3; i + 1 < argc; i += 2) {
    if (!std::strcmp(argv[i], "--orbit")) orbit = std::strtof(argv[i + 1], nullptr);
    if (!std::strcmp(argv[i], "--threads")) threads = std::atoi(argv[i + 1]);
    if (!std::strcmp(argv[i], "--bench")) bench = std::atoi(argv[i + 1]);
  }

  try {
    std::vector<float> pose_v =
        tnerf::ReadTaggedFile(dir + "/pose.bin").AsFloat();
    if (pose_v.size() != 12) {
      std::fprintf(stderr, "pose.bin must hold a 3x4 pose\n");
      return 1;
    }
    std::array<float, 12> pose;
    std::copy(pose_v.begin(), pose_v.end(), pose.begin());
    if (orbit != 0) pose = RotateY(pose, orbit);

    // model family is declared by the export (config.json "model")
    std::string family =
        tnerf::FlatJson(dir + "/config.json").Str("model", "ngp");
    std::vector<float> img;
    int w = 0, h = 0;
    auto render_with = [&](auto& model, const std::array<float, 12>& p) {
      img = model.Render(p, threads);
      w = model.config().width;
      h = model.config().height;
    };
    auto run = [&](auto& model) {
      // microsecond clock: sub-millisecond frames (small models / many
      // threads) would divide by a truncated-to-zero millisecond count
      auto t0 = std::chrono::steady_clock::now();
      render_with(model, pose);
      double ms =
          std::chrono::duration_cast<std::chrono::microseconds>(
              std::chrono::steady_clock::now() - t0)
              .count() /
          1000.0;
      std::fprintf(stderr, "rendered %dx%d in %.2f ms (%.1f fps)\n", w, h,
                   ms, ms > 0.0 ? 1000.0 / ms : 0.0);
      if (bench > 0) {
        // warm per-frame timing on an orbit (camera moves every frame,
        // like the reference's mobile demo loop)
        auto b0 = std::chrono::steady_clock::now();
        for (int f = 0; f < bench; ++f)
          render_with(model, RotateY(pose, 360.0f * f / bench));
        double bms =
            std::chrono::duration_cast<std::chrono::microseconds>(
                std::chrono::steady_clock::now() - b0)
                .count() /
            (1000.0 * static_cast<double>(bench));
        std::fprintf(stderr, "bench %d frames: %.2f ms/frame (%.2f fps)\n",
                     bench, bms, bms > 0.0 ? 1000.0 / bms : 0.0);
      }
    };
    if (family == "pyramid") {
      tnerf::PyramidModel model(dir);
      run(model);
    } else {
      tnerf::NgpModel model(dir);
      run(model);
    }

    if (out.size() > 4 && out.substr(out.size() - 4) == ".bmp")
      tnerf::WriteBmp(out, img, w, h);
    else
      tnerf::WritePpm(out, img, w, h);
  } catch (const std::exception& e) {
    std::fprintf(stderr, "error: %s\n", e.what());
    return 1;
  }
  return 0;
}
