#!/usr/bin/env bash
# Cross-compile the native inference runner for Android (arm64-v8a) and
# optionally push + run it on a connected device.
#
# Role of the reference's Android build/run scripts
# (deployment/InstantNGP/Android_Demo/scripts/{build-android.sh,
# compile_and_run_nerf.sh}) — here the runner is plain C++17 with no
# GPU-runtime dependency, so the whole "vendored Taichi C-API + SPIR-V
# artifacts" layer disappears: one NDK toolchain invocation.
#
# Usage:
#   ANDROID_NDK=/path/to/ndk ./build-android.sh [--run <export_dir>]
set -euo pipefail

NDK="${ANDROID_NDK:-${ANDROID_NDK_HOME:-}}"
if [[ -z "${NDK}" ]]; then
  echo "error: set ANDROID_NDK (or ANDROID_NDK_HOME) to an NDK >= r21" >&2
  exit 1
fi

HERE="$(cd "$(dirname "$0")/.." && pwd)"
BUILD="${HERE}/build-android"
ABI="${ABI:-arm64-v8a}"
API="${ANDROID_API:-26}"

cmake -S "${HERE}" -B "${BUILD}" \
  -DCMAKE_TOOLCHAIN_FILE="${NDK}/build/cmake/android.toolchain.cmake" \
  -DANDROID_ABI="${ABI}" \
  -DANDROID_PLATFORM="android-${API}" \
  -DCMAKE_BUILD_TYPE=Release
cmake --build "${BUILD}" -j --target tnerf_runner
echo "built: ${BUILD}/tnerf_runner (${ABI}, android-${API})"

if [[ "${1:-}" == "--run" ]]; then
  EXPORT_DIR="${2:?usage: --run <export_dir>}"
  DEV_DIR=/data/local/tmp/tnerf
  adb shell mkdir -p "${DEV_DIR}"
  adb push "${BUILD}/tnerf_runner" "${DEV_DIR}/"
  adb push "${EXPORT_DIR}" "${DEV_DIR}/export"
  adb shell "cd ${DEV_DIR} && ./tnerf_runner export out.ppm"
  adb pull "${DEV_DIR}/out.ppm" .
  echo "frame rendered on device -> ./out.ppm"
fi
