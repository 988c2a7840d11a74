// Tagged binary weight I/O + fp16 conversion.
//
// Native counterpart of the reference's deployment weight loader
// (deployment/InstantNGP/utils/utils.cpp:100-213): each .bin file is an
// int32 dtype tag + int32 element count header followed by the raw
// little-endian payload.  Tags: 0=f32 1=f16 2=i32 3=i16 4=u32 5=u16
// (matching taichi_ngp.py:39-51 and our utils/export.py DTYPE_TAGS).
#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace tnerf {

enum class DType : int32_t {
  kF32 = 0,
  kF16 = 1,
  kI32 = 2,
  kI16 = 3,
  kU32 = 4,
  kU16 = 5,
};

// Branch-free scalar fp16 <-> fp32 (IEEE 754 half), the role of
// utils.cpp:25-89 in the reference runner.
float HalfToFloat(uint16_t h);
uint16_t FloatToHalf(float f);

struct TaggedTensor {
  DType dtype;
  std::vector<uint8_t> bytes;  // raw payload
  int64_t count = 0;

  // Typed view with widening: f16 payloads are converted.
  std::vector<float> AsFloat() const;
  std::vector<uint32_t> AsU32() const;
  std::vector<int32_t> AsI32() const;
};

TaggedTensor ReadTaggedFile(const std::string& path);
void WriteTaggedFile(const std::string& path, DType dtype, const void* data,
                     int64_t count);

}  // namespace tnerf
