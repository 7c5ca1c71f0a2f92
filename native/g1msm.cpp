// G1 Jacobian arithmetic + Pippenger MSM over BN254 (host native core).
//
// Serves the host-side jobs that need many group ops but no TPU batch
// shape: test-prover commitments (prover/keygen.py commit_coeff/
// commit_lagrange standing in for the upstream prover the reference tests
// use, tests/helpers.rs:34-64), SRS generation, and the correctness oracle
// for the device MSM (reference algorithm: arithmetic.rs:7-95).
//
// Field layer comes from bn254.cpp (shared TU constants duplicated here to
// keep each file self-contained; C ABI exported symbols differ).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using u64 = uint64_t;
using u128 = unsigned __int128;

struct Fp {
  u64 v[4];
};

constexpr u64 kMod[4] = {0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                         0xb85045b68181585dULL, 0x30644e72e131a029ULL};
constexpr u64 kInv = 0x87d20782e4866389ULL;
constexpr u64 kR2[4] = {0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL,
                        0x47ab1eff0a417ff6ULL, 0x06d89f71cab8351fULL};
constexpr u64 kOne[4] = {0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL,
                         0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL};
// P-2 for Fermat inversion
constexpr u64 kInvExp[4] = {0x3c208c16d87cfd45ULL, 0x97816a916871ca8dULL,
                            0xb85045b68181585dULL, 0x30644e72e131a029ULL};

inline bool geq(const u64 a[4], const u64 b[4]) {
  for (int i = 3; i >= 0; --i)
    if (a[i] != b[i]) return a[i] > b[i];
  return true;
}

inline void sub_raw(u64 a[4], const u64 b[4]) {
  u64 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a[i] - b[i] - borrow;
    a[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

inline void cond_reduce(u64 a[4]) {
  if (geq(a, kMod)) sub_raw(a, kMod);
}

void fp_mul(Fp& out, const Fp& a, const Fp& b) {
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 cur = (u128)a.v[j] * b.v[i] + t[j] + carry;
      t[j] = (u64)cur;
      carry = cur >> 64;
    }
    u128 cur = (u128)t[4] + carry;
    t[4] = (u64)cur;
    t[5] = (u64)(cur >> 64);
    u64 m = t[0] * kInv;
    carry = ((u128)m * kMod[0] + t[0]) >> 64;
    for (int j = 1; j < 4; ++j) {
      u128 c2 = (u128)m * kMod[j] + t[j] + carry;
      t[j - 1] = (u64)c2;
      carry = c2 >> 64;
    }
    cur = (u128)t[4] + carry;
    t[3] = (u64)cur;
    t[4] = t[5] + (u64)(cur >> 64);
  }
  std::memcpy(out.v, t, 32);
  cond_reduce(out.v);
}

inline void fp_sqr(Fp& out, const Fp& a) { fp_mul(out, a, a); }

inline void fp_add(Fp& out, const Fp& a, const Fp& b) {
  u64 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a.v[i] + b.v[i] + carry;
    out.v[i] = (u64)s;
    carry = (u64)(s >> 64);
  }
  cond_reduce(out.v);
}

inline void fp_sub(Fp& out, const Fp& a, const Fp& b) {
  u64 borrow = 0;
  u64 r[4];
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.v[i] - b.v[i] - borrow;
    r[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
  if (borrow) {
    u64 carry = 0;
    for (int i = 0; i < 4; ++i) {
      u128 s = (u128)r[i] + kMod[i] + carry;
      r[i] = (u64)s;
      carry = (u64)(s >> 64);
    }
  }
  std::memcpy(out.v, r, 32);
}

inline void fp_dbl(Fp& out, const Fp& a) { fp_add(out, a, a); }

inline bool fp_is_zero(const Fp& a) {
  return (a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0;
}

inline bool fp_eq(const Fp& a, const Fp& b) {
  return std::memcmp(a.v, b.v, 32) == 0;
}

void fp_pow(Fp& out, const Fp& base, const u64 exp[4]) {
  Fp acc;
  std::memcpy(acc.v, kOne, 32);
  bool started = false;
  for (int limb = 3; limb >= 0; --limb)
    for (int bit = 63; bit >= 0; --bit) {
      if (started) fp_sqr(acc, acc);
      if ((exp[limb] >> bit) & 1) {
        if (started)
          fp_mul(acc, acc, base);
        else {
          acc = base;
          started = true;
        }
      }
    }
  out = acc;
}

inline void fp_to_mont(Fp& out, const Fp& a) {
  Fp r2;
  std::memcpy(r2.v, kR2, 32);
  fp_mul(out, a, r2);
}

inline void fp_from_mont(Fp& out, const Fp& a) {
  Fp one = {{1, 0, 0, 0}};
  fp_mul(out, a, one);
}

// ---- Jacobian points (coords in Montgomery form) ----

struct Jac {
  Fp x, y, z;  // identity: z == 0
};

inline bool is_identity(const Jac& p) { return fp_is_zero(p.z); }

void set_identity(Jac& p) {
  std::memset(&p, 0, sizeof(p));
  std::memcpy(p.y.v, kOne, 32);
}

// dbl-2009-l
void j_double(Jac& out, const Jac& p) {
  if (is_identity(p)) {
    out = p;
    return;
  }
  Fp a, b, c, d, e, f, t;
  fp_sqr(a, p.x);              // A = X^2
  fp_sqr(b, p.y);              // B = Y^2
  fp_sqr(c, b);                // C = B^2
  fp_add(d, p.x, b);           // X+B
  fp_sqr(d, d);                // (X+B)^2
  fp_sub(d, d, a);             // -A
  fp_sub(d, d, c);             // -C
  fp_dbl(d, d);                // D = 2((X+B)^2-A-C)
  fp_dbl(e, a);                // 2A
  fp_add(e, e, a);             // E = 3A
  fp_sqr(f, e);                // F = E^2
  Fp x3, y3, z3;
  fp_dbl(t, d);
  fp_sub(x3, f, t);            // X3 = F - 2D
  fp_sub(t, d, x3);
  fp_mul(t, e, t);             // E(D-X3)
  Fp c8;
  fp_dbl(c8, c);
  fp_dbl(c8, c8);
  fp_dbl(c8, c8);              // 8C
  fp_sub(y3, t, c8);           // Y3 = E(D-X3) - 8C
  fp_mul(z3, p.y, p.z);
  fp_dbl(z3, z3);              // Z3 = 2YZ
  out.x = x3;
  out.y = y3;
  out.z = z3;
}

// add-2007-bl
void j_add(Jac& out, const Jac& p, const Jac& q) {
  if (is_identity(p)) {
    out = q;
    return;
  }
  if (is_identity(q)) {
    out = p;
    return;
  }
  Fp z1z1, z2z2, u1, u2, s1, s2;
  fp_sqr(z1z1, p.z);
  fp_sqr(z2z2, q.z);
  fp_mul(u1, p.x, z2z2);
  fp_mul(u2, q.x, z1z1);
  fp_mul(s1, p.y, q.z);
  fp_mul(s1, s1, z2z2);
  fp_mul(s2, q.y, p.z);
  fp_mul(s2, s2, z1z1);
  if (fp_eq(u1, u2)) {
    if (fp_eq(s1, s2)) {
      j_double(out, p);
    } else {
      set_identity(out);
    }
    return;
  }
  Fp h, i, j, r, v, t;
  fp_sub(h, u2, u1);           // H
  fp_dbl(i, h);
  fp_sqr(i, i);                // I = (2H)^2
  fp_mul(j, h, i);             // J = H*I
  fp_sub(r, s2, s1);
  fp_dbl(r, r);                // r = 2(S2-S1)
  fp_mul(v, u1, i);            // V = U1*I
  Fp x3, y3, z3;
  fp_sqr(x3, r);
  fp_sub(x3, x3, j);
  fp_dbl(t, v);
  fp_sub(x3, x3, t);           // X3 = r^2 - J - 2V
  fp_sub(t, v, x3);
  fp_mul(t, r, t);             // r(V-X3)
  Fp s1j;
  fp_mul(s1j, s1, j);
  fp_dbl(s1j, s1j);            // 2 S1 J
  fp_sub(y3, t, s1j);          // Y3
  fp_add(z3, p.z, q.z);
  fp_sqr(z3, z3);
  fp_sub(z3, z3, z1z1);
  fp_sub(z3, z3, z2z2);
  fp_mul(z3, z3, h);           // Z3 = ((Z1+Z2)^2 - Z1Z1 - Z2Z2) H
  out.x = x3;
  out.y = y3;
  out.z = z3;
}

void jac_to_affine(uint8_t* out64, const Jac& p) {
  if (is_identity(p)) {
    std::memset(out64, 0, 64);
    return;
  }
  Fp zinv, zinv2, zinv3, x, y;
  fp_pow(zinv, p.z, kInvExp);
  fp_sqr(zinv2, zinv);
  fp_mul(zinv3, zinv2, zinv);
  fp_mul(x, p.x, zinv2);
  fp_mul(y, p.y, zinv3);
  fp_from_mont(x, x);
  fp_from_mont(y, y);
  std::memcpy(out64, x.v, 32);
  std::memcpy(out64 + 32, y.v, 32);
}

}  // namespace

extern "C" {

// Pippenger MSM: scalars = n*32B canonical LE (mod r assumed reduced),
// points = n*64B affine canonical LE (x||y; all-zero = identity).
// out = 64B affine canonical LE (all-zero = identity).
void h2v_g1_msm(const uint8_t* scalars, const uint8_t* points, uint8_t* out,
                u64 n) {
  if (n == 0) {
    std::memset(out, 0, 64);
    return;
  }
  // window size: mirror the reference's policy shape but allow larger
  // windows for big MSMs (arithmetic.rs:10-16 caps at 4; SRS-sized inputs
  // benefit from more)
  int c;
  if (n < 4) c = 1;
  else if (n < 32) c = 3;
  else if (n < 1024) c = 6;
  else if (n < 32768) c = 9;
  else c = 12;
  const int windows = (254 + c - 1) / c;
  const u64 nbuckets = (1ULL << c) - 1;

  // load points once (to Montgomery)
  std::vector<Jac> pts(n);
  for (u64 i = 0; i < n; ++i) {
    Fp x, y;
    std::memcpy(x.v, points + 64 * i, 32);
    std::memcpy(y.v, points + 64 * i + 32, 32);
    if (fp_is_zero(x) && fp_is_zero(y)) {
      set_identity(pts[i]);
    } else {
      fp_to_mont(pts[i].x, x);
      fp_to_mont(pts[i].y, y);
      std::memcpy(pts[i].z.v, kOne, 32);
    }
  }

  Jac acc;
  set_identity(acc);
  std::vector<Jac> buckets(nbuckets);
  for (int w = windows - 1; w >= 0; --w) {
    for (int d = 0; d < c; ++d) j_double(acc, acc);
    for (u64 b = 0; b < nbuckets; ++b) set_identity(buckets[b]);
    const int bit0 = w * c;
    for (u64 i = 0; i < n; ++i) {
      // extract digit bits [bit0, bit0+c)
      int limb = bit0 >> 6, off = bit0 & 63;
      u64 lo, hi = 0;
      std::memcpy(&lo, scalars + 32 * i + 8 * limb, 8);
      if (off + c > 64 && limb < 3)
        std::memcpy(&hi, scalars + 32 * i + 8 * (limb + 1), 8);
      u64 digit = ((lo >> off) | (off ? (hi << (64 - off)) : 0)) &
                  ((1ULL << c) - 1);
      if (digit) j_add(buckets[digit - 1], buckets[digit - 1], pts[i]);
    }
    // summation by parts: running = sum_{b>=k}, acc += running
    Jac running;
    set_identity(running);
    for (u64 b = nbuckets; b > 0; --b) {
      j_add(running, running, buckets[b - 1]);
      j_add(acc, acc, running);
    }
  }
  jac_to_affine(out, acc);
}

// Single scalar-mul helper: out = k * point (same encodings as above).
void h2v_g1_mul(const uint8_t* scalar, const uint8_t* point, uint8_t* out) {
  h2v_g1_msm(scalar, point, out, 1);
}

}  // extern "C"
