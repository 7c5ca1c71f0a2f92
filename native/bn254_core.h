// Shared BN254 base/scalar field core: 4x64-bit Montgomery arithmetic.
// Used by bn254.cpp (decompression/modexp), g1msm.cpp, pairing.cpp.
//
// All byte buffers crossing the C ABI are 32-byte little-endian canonical
// (non-Montgomery) field reprs, matching PrimeField::to_repr.

#pragma once

#include <cstdint>
#include <cstring>

namespace h2v {

using u64 = uint64_t;
using u128 = unsigned __int128;

struct FieldParams {
  u64 mod[4];
  u64 inv;     // -mod^{-1} mod 2^64
  u64 r2[4];   // (2^256)^2 mod mod
  u64 one[4];  // 2^256 mod mod (Montgomery one)
};

inline constexpr FieldParams kFq = {
    {0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL, 0xb85045b68181585dULL,
     0x30644e72e131a029ULL},
    0x87d20782e4866389ULL,
    {0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL, 0x47ab1eff0a417ff6ULL,
     0x06d89f71cab8351fULL},
    {0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL, 0x666ea36f7879462cULL,
     0x0e0a77c19a07df2fULL},
};

inline constexpr FieldParams kFr = {
    {0x43e1f593f0000001ULL, 0x2833e84879b97091ULL, 0xb85045b68181585dULL,
     0x30644e72e131a029ULL},
    0xc2e1f593efffffffULL,
    {0x1bb8e645ae216da7ULL, 0x53fe3ab1e35c59e3ULL, 0x8c49833d53bb8085ULL,
     0x0216d0b17f4e44a5ULL},
    {0xac96341c4ffffffbULL, 0x36fc76959f60cd29ULL, 0x666ea36f7879462eULL,
     0x0e0a77c19a07df2fULL},
};

// (P+1)/4 — sqrt exponent (P = 3 mod 4)
inline constexpr u64 kFqSqrtExp[4] = {
    0x4f082305b61f3f52ULL, 0x65e05aa45a1c72a3ULL, 0x6e14116da0605617ULL,
    0x0c19139cb84c680aULL};
// P-2 / R-2 — Fermat inversion exponents
inline constexpr u64 kFqInvExp[4] = {
    0x3c208c16d87cfd45ULL, 0x97816a916871ca8dULL, 0xb85045b68181585dULL,
    0x30644e72e131a029ULL};
inline constexpr u64 kFrInvExp[4] = {
    0x43e1f593efffffffULL, 0x2833e84879b97091ULL, 0xb85045b68181585dULL,
    0x30644e72e131a029ULL};
// b = 3 in Montgomery form (curve y^2 = x^3 + 3)
inline constexpr u64 kBMont[4] = {0x7a17caa950ad28d7ULL, 0x1f6ac17ae15521b9ULL,
                                  0x334bea4e696bd284ULL, 0x2a1f6744ce179d8eULL};

inline bool geq(const u64 a[4], const u64 b[4]) {
  for (int i = 3; i >= 0; --i) {
    if (a[i] != b[i]) return a[i] > b[i];
  }
  return true;
}

inline void sub_raw(u64 a[4], const u64 m[4]) {
  u64 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a[i] - m[i] - borrow;
    a[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

inline void cond_reduce(u64 a[4], const FieldParams& f) {
  if (geq(a, f.mod)) sub_raw(a, f.mod);
}

// CIOS Montgomery multiplication: out = a*b*2^-256 mod m
inline void mont_mul(u64 out[4], const u64 a[4], const u64 b[4],
                     const FieldParams& f) {
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 cur = (u128)a[j] * b[i] + t[j] + carry;
      t[j] = (u64)cur;
      carry = cur >> 64;
    }
    u128 cur = (u128)t[4] + carry;
    t[4] = (u64)cur;
    t[5] = (u64)(cur >> 64);

    u64 m = t[0] * f.inv;
    carry = ((u128)m * f.mod[0] + t[0]) >> 64;
    for (int j = 1; j < 4; ++j) {
      u128 c2 = (u128)m * f.mod[j] + t[j] + carry;
      t[j - 1] = (u64)c2;
      carry = c2 >> 64;
    }
    cur = (u128)t[4] + carry;
    t[3] = (u64)cur;
    t[4] = t[5] + (u64)(cur >> 64);
  }
  std::memcpy(out, t, 32);
  cond_reduce(out, f);
}

inline void to_mont(u64 out[4], const u64 a[4], const FieldParams& f) {
  mont_mul(out, a, f.r2, f);
}

inline void from_mont(u64 out[4], const u64 a[4], const FieldParams& f) {
  static constexpr u64 one[4] = {1, 0, 0, 0};
  mont_mul(out, a, one, f);
}

inline void add_mod(u64 out[4], const u64 a[4], const u64 b[4],
                    const FieldParams& f) {
  u64 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a[i] + b[i] + carry;
    out[i] = (u64)s;
    carry = (u64)(s >> 64);
  }
  // moduli are < 2^254 so no overflow past 4 limbs
  cond_reduce(out, f);
}

inline void sub_mod(u64 out[4], const u64 a[4], const u64 b[4],
                    const FieldParams& f) {
  u64 t[4];
  std::memcpy(t, a, 32);
  if (!geq(t, b)) {
    u64 carry = 0;
    for (int i = 0; i < 4; ++i) {
      u128 s = (u128)t[i] + f.mod[i] + carry;
      t[i] = (u64)s;
      carry = (u64)(s >> 64);
    }
    // a < b <= mod, so a + mod < 2^256: carry out is impossible
  }
  sub_raw(t, b);
  std::memcpy(out, t, 32);
}

// out = base^exp (Montgomery in/out), MSB-first ladder over `limbs` limbs
inline void mont_pow(u64 out[4], const u64 base[4], const u64* exp,
                     int limbs, const FieldParams& f) {
  u64 acc[4];
  std::memcpy(acc, f.one, 32);
  bool started = false;
  for (int limb = limbs - 1; limb >= 0; --limb) {
    for (int bit = 63; bit >= 0; --bit) {
      if (started) mont_mul(acc, acc, acc, f);
      if ((exp[limb] >> bit) & 1) {
        if (started) {
          mont_mul(acc, acc, base, f);
        } else {
          std::memcpy(acc, base, 32);
          started = true;
        }
      }
    }
  }
  std::memcpy(out, acc, 32);
}

inline void load_le(u64 out[4], const uint8_t* in) {
  std::memcpy(out, in, 32);  // little-endian host
}

inline void store_le(uint8_t* out, const u64 in[4]) {
  std::memcpy(out, in, 32);
}

inline bool is_zero4(const u64 a[4]) {
  return (a[0] | a[1] | a[2] | a[3]) == 0;
}

}  // namespace h2v
