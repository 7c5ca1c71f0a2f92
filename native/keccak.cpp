// Keccak-f[1600] permutation + legacy Keccak-256 sponge (pad 0x01).
//
// Native core for the Fiat-Shamir transcript (reference: the `sha3` crate's
// Keccak256 used at transcript/mod.rs:7,143). The EVM-compatible transcript
// squeezes two digests per challenge (lo/hi dual-finalize,
// transcript/mod.rs:239-254), so hashing is on the host hot path for
// keccak-mode batch verification; this C++ core replaces the pure-Python
// permutation (halo2_verifier_tpu/transcript/keccak.py) when built.
//
// C ABI, loaded from Python via ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstring>

namespace {

constexpr uint64_t kRoundConstants[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL,
    0x8000000080008000ULL, 0x000000000000808BULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008AULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
    0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800AULL, 0x800000008000000AULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};

inline uint64_t rol(uint64_t x, unsigned n) {
  return n == 0 ? x : (x << n) | (x >> (64 - n));
}

// state layout: state[x + 5*y], lanes little-endian (matches FIPS-202 and
// the Python implementation's indexing)
void keccak_f(uint64_t s[25]) {
  for (int round = 0; round < 24; ++round) {
    // theta
    uint64_t c[5], d[5];
    for (int x = 0; x < 5; ++x)
      c[x] = s[x] ^ s[x + 5] ^ s[x + 10] ^ s[x + 15] ^ s[x + 20];
    for (int x = 0; x < 5; ++x)
      d[x] = c[(x + 4) % 5] ^ rol(c[(x + 1) % 5], 1);
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y) s[x + 5 * y] ^= d[x];
    // rho + pi
    static constexpr unsigned kRot[5][5] = {{0, 36, 3, 41, 18},
                                            {1, 44, 10, 45, 2},
                                            {62, 6, 43, 15, 61},
                                            {28, 55, 25, 21, 56},
                                            {27, 20, 39, 8, 14}};
    uint64_t b[25];
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y)
        b[y + 5 * ((2 * x + 3 * y) % 5)] = rol(s[x + 5 * y], kRot[x][y]);
    // chi
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y)
        s[x + 5 * y] = b[x + 5 * y] ^ (~b[(x + 1) % 5 + 5 * y] &
                                       b[(x + 2) % 5 + 5 * y]);
    // iota
    s[0] ^= kRoundConstants[round];
  }
}

constexpr int kRate = 136;  // Keccak-256 rate in bytes

}  // namespace

extern "C" {

// In-place permutation over a 25-lane (200-byte) state.
void h2v_keccak_f1600(uint64_t state[25]) { keccak_f(state); }

// Absorb full rate-sized blocks: data must be n_blocks * 136 bytes.
void h2v_keccak_absorb_blocks(uint64_t state[25], const uint8_t* data,
                              uint64_t n_blocks) {
  for (uint64_t blk = 0; blk < n_blocks; ++blk) {
    for (int i = 0; i < kRate / 8; ++i) {
      uint64_t lane;
      std::memcpy(&lane, data + blk * kRate + 8 * i, 8);
      state[i] ^= lane;  // little-endian host assumed (x86/ARM)
    }
    keccak_f(state);
    }
}

// Finalize a copy of `state` with `tail` (tail_len < 136) pending bytes,
// legacy Keccak 0x01 padding; writes 32 digest bytes to `out`.
void h2v_keccak256_finalize(const uint64_t state[25], const uint8_t* tail,
                            uint64_t tail_len, uint8_t* out) {
  uint64_t s[25];
  std::memcpy(s, state, sizeof(s));
  uint8_t block[kRate];
  std::memset(block, 0, sizeof(block));
  std::memcpy(block, tail, tail_len);
  block[tail_len] ^= 0x01;
  block[kRate - 1] ^= 0x80;
  for (int i = 0; i < kRate / 8; ++i) {
    uint64_t lane;
    std::memcpy(&lane, block + 8 * i, 8);
    s[i] ^= lane;
  }
  keccak_f(s);
  std::memcpy(out, s, 32);
}

}  // extern "C"
