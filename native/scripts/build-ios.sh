#!/usr/bin/env bash
# Cross-compile the native inference runner as a static library for iOS.
#
# Role of the reference's iOS build script
# (deployment/InstantNGP/iOS_Demo/scripts/build-taichi-ios.sh +
# archive-minimal-static.py): there it builds the Taichi C-API as a static
# lib for the Metal runtime; here the model evaluator is dependency-free
# C++17, so the product is one libtnerf_core.a an app target links and
# calls through ngp_model.hpp (same surface the CLI runner uses).
#
# Must run on macOS with Xcode command-line tools.
set -euo pipefail

if [[ "$(uname)" != "Darwin" ]]; then
  echo "error: iOS builds require macOS + Xcode (this is $(uname))" >&2
  exit 1
fi

HERE="$(cd "$(dirname "$0")/.." && pwd)"
BUILD="${HERE}/build-ios"
SYSROOT="$(xcrun --sdk iphoneos --show-sdk-path)"

cmake -S "${HERE}" -B "${BUILD}" \
  -DCMAKE_SYSTEM_NAME=iOS \
  -DCMAKE_OSX_SYSROOT="${SYSROOT}" \
  -DCMAKE_OSX_ARCHITECTURES=arm64 \
  -DCMAKE_OSX_DEPLOYMENT_TARGET=14.0 \
  -DCMAKE_BUILD_TYPE=Release
cmake --build "${BUILD}" -j --target tnerf_core
echo "built: ${BUILD}/libtnerf_core.a (arm64 iOS)"
echo "link it into an app target and drive it via src/ngp_model.hpp"
