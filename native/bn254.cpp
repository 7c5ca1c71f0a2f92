// BN254 base/scalar field arithmetic (4x64-bit Montgomery) + G1 point
// decompression for the host protocol path.
//
// The verifier's host stage decompresses every proof commitment
// (transcript read_point -> sqrt in Fq; reference: helpers.rs:22-31
// CurveRead + halo2curves compressed codec) and inverts scalars during
// SHPLONK interpolation (lagrange_interpolate, arithmetic.rs:149-202).
// CPython's 256-bit pow() dominates replay time (~66% profiled); this core
// does the same math in fixed-width Montgomery form.
//
// C ABI via ctypes; all byte buffers are 32-byte little-endian canonical
// (non-Montgomery) field reprs, matching PrimeField::to_repr.

#include <cstdint>
#include <cstring>

#include "bn254_core.h"

namespace {

using namespace h2v;

inline void mont_pow(u64 out[4], const u64 base[4], const u64 exp[4],
                     const FieldParams& f) {
  h2v::mont_pow(out, base, exp, 4, f);
}

inline bool is_zero(const u64 a[4]) { return is_zero4(a); }

// modexp over canonical reprs; returns false if base >= mod
bool modexp_one(uint8_t* out, const uint8_t* base_repr, const u64 exp[4],
                const FieldParams& f) {
  u64 base[4], bm[4], res[4];
  load_le(base, base_repr);
  if (geq(base, f.mod)) return false;
  to_mont(bm, base, f);
  mont_pow(res, bm, exp, f);
  from_mont(res, res, f);
  store_le(out, res);
  return true;
}

}  // namespace

extern "C" {

// ---- generic batch modexp (canonical 32B LE in/out) ----
// which: 0 = Fq, 1 = Fr. exp: 32B LE. Returns count of valid entries
// (entries with base >= modulus write zeros and are not counted).
u64 h2v_modexp_batch(int which, const uint8_t* bases, const uint8_t* exp32,
                     uint8_t* out, u64 n) {
  const FieldParams& f = which ? kFr : kFq;
  u64 exp[4];
  std::memcpy(exp, exp32, 32);
  u64 ok = 0;
  for (u64 i = 0; i < n; ++i) {
    if (modexp_one(out + 32 * i, bases + 32 * i, exp, f)) {
      ++ok;
    } else {
      std::memset(out + 32 * i, 0, 32);
    }
  }
  return ok;
}

// ---- batch field inversion via Fermat (0 -> 0) ----
void h2v_inv_batch(int which, const uint8_t* in, uint8_t* out, u64 n) {
  const FieldParams& f = which ? kFr : kFq;
  const u64* exp = which ? kFrInvExp : kFqInvExp;
  for (u64 i = 0; i < n; ++i) {
    u64 a[4];
    load_le(a, in + 32 * i);
    if (is_zero(a)) {
      std::memset(out + 32 * i, 0, 32);
      continue;
    }
    modexp_one(out + 32 * i, in + 32 * i, exp, f);
  }
}

// ---- G1 decompression ----
// in: n * 32B halo2curves-compressed points (x LE, sign bit = top bit of
// byte 31). out_xy: n * 64B (x || y canonical LE). flags per point:
// 0 = ok, 1 = identity (all-zero input), 2 = invalid encoding.
// Returns number of invalid points.
u64 h2v_g1_decompress_batch(const uint8_t* in, uint8_t* out_xy,
                            uint8_t* flags, u64 n) {
  u64 bad = 0;
  for (u64 i = 0; i < n; ++i) {
    const uint8_t* src = in + 32 * i;
    uint8_t* dst = out_xy + 64 * i;
    uint8_t xbuf[32];
    std::memcpy(xbuf, src, 32);
    int ysign = (xbuf[31] >> 7) & 1;
    xbuf[31] &= 0x7f;
    u64 x[4];
    load_le(x, xbuf);
    if (is_zero(x) && ysign == 0) {
      std::memset(dst, 0, 64);
      flags[i] = 1;  // point at infinity
      continue;
    }
    if (geq(x, kFq.mod)) {
      std::memset(dst, 0, 64);
      flags[i] = 2;
      ++bad;
      continue;
    }
    u64 xm[4], x2[4], rhs[4], y[4], y2[4];
    to_mont(xm, x, kFq);
    mont_mul(x2, xm, xm, kFq);
    mont_mul(rhs, x2, xm, kFq);
    add_mod(rhs, rhs, kBMont, kFq);     // x^3 + 3 (Montgomery)
    mont_pow(y, rhs, kFqSqrtExp, kFq);  // candidate sqrt
    mont_mul(y2, y, y, kFq);
    if (std::memcmp(y2, rhs, 32) != 0) {
      std::memset(dst, 0, 64);
      flags[i] = 2;  // x not on curve
      ++bad;
      continue;
    }
    u64 yc[4];
    from_mont(yc, y, kFq);
    if ((int)(yc[0] & 1) != ysign) {
      // y = P - y
      u64 neg[4];
      std::memcpy(neg, kFq.mod, 32);
      u64 borrow = 0;
      for (int k = 0; k < 4; ++k) {
        u128 d = (u128)neg[k] - yc[k] - borrow;
        neg[k] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
      }
      std::memcpy(yc, neg, 32);
    }
    store_le(dst, x);
    store_le(dst + 32, yc);
    flags[i] = 0;
  }
  return bad;
}

}  // extern "C"
