"""Loader for the native (C++) runtime components.

The compute path is JAX/XLA; host-side sequential work (transcript hashing)
gets a native core where Python is slow. The library is optional: every
consumer keeps a pure-Python fallback, so a missing/unbuildable .so only
costs speed, never correctness.

Build: `make -C native` at the repo root (or `build()` below).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libh2vnative.so")

_lib = None
_load_attempted = False


def build(quiet: bool = True) -> bool:
    """Compile the native library in-tree; returns True on success."""
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=quiet,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load():
    """Returns the ctypes library handle or None. Builds on first use if the
    source tree and a compiler are present."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    try:
        srcs = [
            os.path.join(_NATIVE_DIR, f)
            for f in os.listdir(_NATIVE_DIR)
            if f.endswith(".cpp")
        ]
    except FileNotFoundError:
        srcs = []
    stale = os.path.exists(_LIB_PATH) and srcs and (
        max(os.path.getmtime(s) for s in srcs) > os.path.getmtime(_LIB_PATH)
    )
    if not os.path.exists(_LIB_PATH) or stale:
        if not srcs or not build():
            return None if not os.path.exists(_LIB_PATH) else _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.h2v_keccak_f1600.argtypes = [ctypes.POINTER(ctypes.c_uint64)]
    lib.h2v_keccak_f1600.restype = None
    lib.h2v_keccak_absorb_blocks.argtypes = [
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_char_p,
        ctypes.c_uint64,
    ]
    lib.h2v_keccak_absorb_blocks.restype = None
    lib.h2v_keccak256_finalize.argtypes = [
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_char_p,
        ctypes.c_uint64,
        ctypes.c_char_p,
    ]
    lib.h2v_keccak256_finalize.restype = None
    lib.h2v_modexp_batch.argtypes = [
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_uint64,
    ]
    lib.h2v_modexp_batch.restype = ctypes.c_uint64
    lib.h2v_inv_batch.argtypes = [
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_uint64,
    ]
    lib.h2v_inv_batch.restype = None
    lib.h2v_g1_decompress_batch.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_uint64,
    ]
    lib.h2v_g1_decompress_batch.restype = ctypes.c_uint64
    lib.h2v_g1_msm.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_uint64,
    ]
    lib.h2v_g1_msm.restype = None
    lib.h2v_g1_mul.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_char_p,
    ]
    lib.h2v_g1_mul.restype = None
    lib.h2v_pairing_check.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_uint64,
        ctypes.c_char_p,
    ]
    lib.h2v_pairing_check.restype = ctypes.c_int
    lib.h2v_replay_batch.argtypes = [
        ctypes.c_char_p,                     # program
        ctypes.c_char_p,                     # proofs
        ctypes.c_uint64,                     # proof_stride
        ctypes.POINTER(ctypes.c_uint64),     # proof_lens
        ctypes.c_char_p,                     # aux
        ctypes.c_uint64,                     # aux_stride
        ctypes.c_uint64,                     # n_proofs
        ctypes.c_char_p,                     # weights (or None)
        ctypes.c_char_p,                     # out_scalars
        ctypes.c_char_p,                     # out_points
        ctypes.c_char_p,                     # status
        ctypes.c_int,                        # n_threads
        ctypes.c_char_p,                     # ext_y (or None): device-
                                             # decompressed principal roots
    ]
    lib.h2v_replay_batch.restype = ctypes.c_int64
    u64p = ctypes.POINTER(ctypes.c_uint64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.h2v_forest_plan.argtypes = [
        u32p,                # scalars (total,16) canonical limbs
        ctypes.c_uint64,     # total
        u64p,                # sizes
        ctypes.c_uint64,     # n_groups
        ctypes.c_uint32,     # quant
        ctypes.c_uint32,     # fin_quant
        ctypes.c_uint32,     # floor
        ctypes.c_uint32,     # window_lo
        ctypes.c_uint32,     # window_count
        i32p, ctypes.c_uint64,   # point_idx0, cap
        i32p, ctypes.c_uint64,   # levels_buf, cap
        u64p, ctypes.c_uint64,   # level_widths, max_levels
        i32p, i32p, ctypes.c_uint64,  # fin_pos, fin_keys, cap
        u64p, ctypes.c_uint64,   # fin_meta, max_parts
        u64p,                # header[6]
    ]
    lib.h2v_forest_plan.restype = ctypes.c_int64
    _lib = lib
    return _lib
