// Host-side addition-forest MSM planner (C++ twin of
// halo2_verifier_tpu/ops/msm_forest.host_plan — bitwise-identical plans,
// differential-tested in tests/test_msm_forest.py).
//
// The numpy planner costs ~20 ms per batch at bench shapes (argsort +
// ~8 full-array passes per level) on the 2-core host, squarely on the
// main-thread critical path between VM replay and device dispatch. Keys
// are tiny (group*8192 + window*256 + digit < n_groups*8192), so a
// counting sort gives every bucket's run length directly and the whole
// level structure follows analytically in O(levels * buckets).
//
// Outputs are written into caller-provided arenas (two-call-free ABI):
//   header[0]=w_pad, [1]=n_levels, [2]=n_parts, [3]=entries, [4]=adds,
//   [5]=n_pad (padded point-array width)
//   point_idx0: w_pad int32 gather indices into the padded point array
//   levels_buf: per level, iL then iR, each level_widths[l] wide
//   fin_pos/fin_keys: concatenated finished parts; fin_meta per part:
//   (frontier_level, padded_width)
// Returns 0, or -1 if any arena would overflow (caller falls back to
// the numpy planner).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kNumWindows = 32;   // 8-bit windows over 256 bits
constexpr uint32_t kWindowBits = 8;
constexpr uint32_t kNumBuckets = 256;  // incl. the dropped zero digit

inline uint64_t quant_up(uint64_t n, uint64_t q) {
  return (n + q - 1) / q * q;
}

}  // namespace

extern "C" {

// window_lo/window_count select a window subset (the window-sharded
// multi-chip path: chip d plans windows [d*32/D, (d+1)*32/D) of every
// group); keys are local to the subset.
int64_t h2v_forest_plan(
    const uint32_t* scalars, uint64_t total, const uint64_t* sizes,
    uint64_t n_groups, uint32_t quant, uint32_t fin_quant, uint32_t floor_w,
    uint32_t window_lo, uint32_t window_count,
    int32_t* point_idx0, uint64_t point_idx0_cap, int32_t* levels_buf,
    uint64_t levels_cap, uint64_t* level_widths, uint64_t max_levels,
    int32_t* fin_pos_buf, int32_t* fin_keys_buf, uint64_t fin_cap,
    uint64_t* fin_meta, uint64_t max_parts, uint64_t* header) {
  if (window_lo + window_count > kNumWindows || window_count == 0)
    return -1;
  const uint64_t n_keys = n_groups * window_count * kNumBuckets;
  std::vector<uint32_t> count(n_keys, 0);

  // group id per point (groups are concatenated)
  std::vector<uint32_t> gid(total);
  {
    uint64_t off = 0;
    for (uint64_t g = 0; g < n_groups; ++g) {
      for (uint64_t i = 0; i < sizes[g]; ++i) gid[off + i] = (uint32_t)g;
      off += sizes[g];
    }
    if (off != total) return -1;
  }

  auto digit_of = [&](uint64_t i, uint32_t w) -> uint32_t {
    // 16-bit limbs little-endian; window w covers bits [8w, 8w+8)
    uint32_t limb = scalars[i * 16 + (w >> 1)];
    return (limb >> (kWindowBits * (w & 1))) & (kNumBuckets - 1);
  };

  // pass 1: counts (zero digits dropped)
  uint64_t entries = 0;
  for (uint64_t i = 0; i < total; ++i) {
    const uint64_t base = (uint64_t)gid[i] * window_count * kNumBuckets;
    for (uint32_t w = window_lo; w < window_lo + window_count; ++w) {
      uint32_t d = digit_of(i, w);
      if (d) {
        ++count[base + (uint64_t)(w - window_lo) * kNumBuckets + d];
        ++entries;
      }
    }
  }

  // bucket starts (prefix sums over key order = sorted order)
  std::vector<uint64_t> start(n_keys + 1);
  start[0] = 0;
  for (uint64_t k = 0; k < n_keys; ++k) start[k + 1] = start[k] + count[k];

  // identity lane in the padded point array
  const uint64_t n_pad = quant_up(total + 1, 1024);
  const int32_t id_idx = (int32_t)(n_pad - 1);

  const uint64_t w_pad = quant_up(entries + 1, quant);
  if (w_pad > point_idx0_cap) return -1;
  for (uint64_t j = entries; j < w_pad; ++j) point_idx0[j] = id_idx;
  // pass 2: stable scatter of point indices in entry order
  {
    std::vector<uint64_t> cur(start.begin(), start.end() - 1);
    for (uint64_t i = 0; i < total; ++i) {
      const uint64_t base = (uint64_t)gid[i] * window_count * kNumBuckets;
      for (uint32_t w = window_lo; w < window_lo + window_count; ++w) {
        uint32_t d = digit_of(i, w);
        if (d) point_idx0[cur[base +
            (uint64_t)(w - window_lo) * kNumBuckets + d]++] = (int32_t)i;
      }
    }
  }

  // occupied buckets in key order: (key, run length)
  std::vector<uint32_t> bkey;
  std::vector<uint32_t> blen;
  bkey.reserve(1 << 14);
  blen.reserve(1 << 14);
  for (uint64_t k = 0; k < n_keys; ++k)
    if (count[k]) {
      bkey.push_back((uint32_t)k);
      blen.push_back(count[k]);
    }

  // level loop: offsets of each bucket's run in the current frontier are
  // implicit (running sum in key order); singletons finalize, the rest
  // pair up
  uint64_t n_levels = 0, n_parts = 0, adds = 0;
  uint64_t levels_used = 0, fin_used = 0;
  uint64_t prev_pad = w_pad;
  std::vector<uint32_t> nlen(blen.size());
  while (!bkey.empty()) {
    const int32_t id_slot = (int32_t)(prev_pad - 1);
    // finished part at this level
    uint64_t fin_n = 0;
    {
      uint64_t off = 0;
      for (size_t b = 0; b < bkey.size(); ++b) {
        if (blen[b] == 1) ++fin_n;
        off += blen[b];
      }
    }
    if (fin_n) {
      if (n_parts >= max_parts) return -1;
      const uint64_t pad = quant_up(fin_n ? fin_n : 1, fin_quant);
      if (fin_used + pad > fin_cap) return -1;
      int32_t* fp = fin_pos_buf + fin_used;
      int32_t* fk = fin_keys_buf + fin_used;
      uint64_t j = 0, off = 0;
      for (size_t b = 0; b < bkey.size(); ++b) {
        if (blen[b] == 1) {
          fp[j] = (int32_t)off;
          fk[j] = (int32_t)bkey[b];
          ++j;
        }
        off += blen[b];
      }
      for (; j < pad; ++j) {
        fp[j] = id_slot;
        fk[j] = (int32_t)n_keys;  // dump
      }
      fin_meta[2 * n_parts] = n_levels;
      fin_meta[2 * n_parts + 1] = pad;
      ++n_parts;
      fin_used += pad;
    }
    // pair actives
    uint64_t out_n = 0;
    for (size_t b = 0; b < bkey.size(); ++b)
      if (blen[b] > 1) out_n += (blen[b] + 1) / 2;
    if (!out_n) break;
    uint64_t out_pad = quant_up(out_n + 1, quant);
    if (out_pad < floor_w) out_pad = floor_w;
    if (n_levels >= max_levels || levels_used + 2 * out_pad > levels_cap)
      return -1;
    int32_t* iL = levels_buf + levels_used;
    int32_t* iR = iL + out_pad;
    {
      uint64_t j = 0, off = 0;
      size_t nb = 0;
      for (size_t b = 0; b < bkey.size(); ++b) {
        const uint32_t c = blen[b];
        if (c > 1) {
          for (uint32_t r = 0; r + 1 < c; r += 2) {
            iL[j] = (int32_t)(off + r);
            iR[j] = (int32_t)(off + r + 1);
            ++j;
          }
          if (c & 1) {
            iL[j] = (int32_t)(off + c - 1);
            iR[j] = id_slot;
            ++j;
          }
          bkey[nb] = bkey[b];
          nlen[nb] = (c + 1) / 2;
          ++nb;
        }
        off += c;
      }
      for (; j < out_pad; ++j) {
        iL[j] = id_slot;
        iR[j] = id_slot;
      }
      bkey.resize(nb);
      blen.assign(nlen.begin(), nlen.begin() + nb);
    }
    level_widths[n_levels++] = out_pad;
    levels_used += 2 * out_pad;
    adds += out_pad;
    prev_pad = out_pad;
  }

  if (n_parts == 0) {  // all digits zero: scatter only identity padding
    if (max_parts == 0 || fin_used + fin_quant > fin_cap) return -1;
    for (uint64_t j = 0; j < fin_quant; ++j) {
      fin_pos_buf[j] = (int32_t)(w_pad - 1);
      fin_keys_buf[j] = (int32_t)n_keys;
    }
    fin_meta[0] = 0;
    fin_meta[1] = fin_quant;
    n_parts = 1;
    fin_used = fin_quant;
  }

  header[0] = w_pad;
  header[1] = n_levels;
  header[2] = n_parts;
  header[3] = entries;
  header[4] = adds;
  header[5] = n_pad;
  return 0;
}

}  // extern "C"
