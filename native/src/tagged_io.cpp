#include "tagged_io.hpp"

#include <cstdio>
#include <cstring>
#include <stdexcept>

namespace tnerf {

namespace {

int64_t ElemSize(DType t) {
  switch (t) {
    case DType::kF32:
    case DType::kI32:
    case DType::kU32:
      return 4;
    case DType::kF16:
    case DType::kI16:
    case DType::kU16:
      return 2;
  }
  throw std::runtime_error("bad dtype tag");
}

}  // namespace

float HalfToFloat(uint16_t h) {
  // Branch-free via exponent rebasing: magic-number trick.
  uint32_t sign = static_cast<uint32_t>(h & 0x8000u) << 16;
  uint32_t mant = h & 0x03FFu;
  uint32_t expo = (h >> 10) & 0x1Fu;
  // normal/denormal handled by float arithmetic on the rebased value
  union {
    uint32_t u;
    float f;
  } magic{static_cast<uint32_t>((expo + (127 - 15)) << 23) | (mant << 13)},
      denorm_magic{(126u - 14u) << 23};
  if (expo == 0) {
    // subnormal: mant * 2^-24
    union {
      uint32_t u;
      float f;
    } m{(127u - 15u + 1u) << 23};
    float val = m.f * (static_cast<float>(mant) / 1024.0f);
    union {
      float f;
      uint32_t u;
    } out{val};
    out.u |= sign;
    return out.f;
  }
  if (expo == 31) {  // inf/nan
    union {
      uint32_t u;
      float f;
    } out{sign | 0x7F800000u | (mant << 13)};
    return out.f;
  }
  (void)denorm_magic;
  union {
    uint32_t u;
    float f;
  } out{sign | magic.u};
  return out.f;
}

uint16_t FloatToHalf(float f) {
  union {
    float f;
    uint32_t u;
  } in{f};
  uint32_t sign = (in.u >> 16) & 0x8000u;
  uint32_t absu = in.u & 0x7FFFFFFFu;
  if (absu >= 0x7F800000u) {  // inf/nan
    uint32_t mant = (absu & 0x007FFFFFu) ? 0x0200u : 0u;
    return static_cast<uint16_t>(sign | 0x7C00u | mant);
  }
  if (absu >= 0x477FF000u) {  // overflow -> inf
    return static_cast<uint16_t>(sign | 0x7C00u);
  }
  if (absu < 0x38800000u) {  // subnormal or zero
    union {
      uint32_t u;
      float f;
    } a{absu};
    float scaled = a.f * 16777216.0f;  // 2^24
    uint32_t mant = static_cast<uint32_t>(scaled + 0.5f);
    return static_cast<uint16_t>(sign | (mant & 0x03FFu));
  }
  uint32_t expo = ((absu >> 23) & 0xFFu) - 127 + 15;
  uint32_t mant = (absu >> 13) & 0x03FFu;
  // round-to-nearest on the dropped bits
  uint32_t rounded = (absu >> 12) & 1u;
  uint32_t bits = (expo << 10) | mant;
  bits += rounded;
  return static_cast<uint16_t>(sign | bits);
}

TaggedTensor ReadTaggedFile(const std::string& path) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) throw std::runtime_error("cannot open " + path);
  int32_t header[2];
  if (std::fread(header, sizeof(int32_t), 2, f) != 2) {
    std::fclose(f);
    throw std::runtime_error("short header in " + path);
  }
  TaggedTensor t;
  t.dtype = static_cast<DType>(header[0]);
  t.count = header[1];
  t.bytes.resize(static_cast<size_t>(t.count * ElemSize(t.dtype)));
  size_t got = std::fread(t.bytes.data(), 1, t.bytes.size(), f);
  std::fclose(f);
  if (got != t.bytes.size())
    throw std::runtime_error("short payload in " + path);
  return t;
}

void WriteTaggedFile(const std::string& path, DType dtype, const void* data,
                     int64_t count) {
  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) throw std::runtime_error("cannot open " + path);
  int32_t header[2] = {static_cast<int32_t>(dtype),
                       static_cast<int32_t>(count)};
  std::fwrite(header, sizeof(int32_t), 2, f);
  std::fwrite(data, static_cast<size_t>(ElemSize(dtype)),
              static_cast<size_t>(count), f);
  std::fclose(f);
}

std::vector<float> TaggedTensor::AsFloat() const {
  std::vector<float> out(static_cast<size_t>(count));
  if (dtype == DType::kF32) {
    std::memcpy(out.data(), bytes.data(), bytes.size());
  } else if (dtype == DType::kF16) {
    const uint16_t* src = reinterpret_cast<const uint16_t*>(bytes.data());
    for (int64_t i = 0; i < count; ++i) out[static_cast<size_t>(i)] = HalfToFloat(src[i]);
  } else {
    throw std::runtime_error("AsFloat on non-float tensor");
  }
  return out;
}

std::vector<uint32_t> TaggedTensor::AsU32() const {
  if (dtype != DType::kU32 && dtype != DType::kI32)
    throw std::runtime_error("AsU32 on non-32-bit tensor");
  std::vector<uint32_t> out(static_cast<size_t>(count));
  std::memcpy(out.data(), bytes.data(), bytes.size());
  return out;
}

std::vector<int32_t> TaggedTensor::AsI32() const {
  if (dtype != DType::kI32 && dtype != DType::kU32)
    throw std::runtime_error("AsI32 on non-32-bit tensor");
  std::vector<int32_t> out(static_cast<size_t>(count));
  std::memcpy(out.data(), bytes.data(), bytes.size());
  return out;
}

}  // namespace tnerf
