"""AOT executable cache (utils/aotcache.py): record/replay round trip,
fallback discipline, and trace transparency.

The cache exists to remove the reference-vs-us instant-on gap (the
reference's verify_proof has zero warmup, lib.rs:33-46; our stream path
cost 400+ s of XLA/Mosaic compiles per process in r04) — these tests pin
the machinery on CPU with tiny programs; the committed TPU pack is
exercised by bench.py on the real chip."""

import os

import jax
import numpy as np
import pytest

from halo2_verifier_tpu.utils import aotcache
from halo2_verifier_tpu.utils.aotcache import aot_jit


def _make_fn():
    # built via a factory so every instance shares one __qualname__
    # (= one cache key namespace), like module-level kernels do
    @aot_jit(static_argnames=("k",))
    def g(x, *, k):
        return x * k

    return g


@pytest.fixture
def aot_env(tmp_path, monkeypatch):
    monkeypatch.setenv("H2V_AOT_DIR", str(tmp_path))
    monkeypatch.setenv("H2V_AOT", "1")
    return tmp_path


def test_record_then_replay(aot_env, monkeypatch):
    x = np.arange(8, dtype=np.float32)

    monkeypatch.setenv("H2V_AOT_RECORD", "1")
    g1 = _make_fn()
    out1 = np.asarray(g1(x, k=3))
    np.testing.assert_array_equal(out1, x * 3)
    inv = aotcache.pack_inventory()
    assert inv["entries"] == 1 and inv["bytes"] > 0

    # fresh wrapper instance (simulates a fresh process), replay only
    monkeypatch.delenv("H2V_AOT_RECORD")
    g2 = _make_fn()
    out2 = np.asarray(g2(x, k=3))
    np.testing.assert_array_equal(out2, x * 3)
    # the call must have been served by a deserialized executable
    assert len(g2._exes) == 1
    (ex,) = g2._exes.values()
    assert ex is not None and not isinstance(ex, type(g2.jit))

    # different static value = different key: replay misses, jit serves
    out3 = np.asarray(g2(x, k=5))
    np.testing.assert_array_equal(out3, x * 5)
    assert None in g2._exes.values()


def test_missing_pack_falls_back(aot_env):
    g = _make_fn()
    x = np.ones(4, dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(g(x, k=2)), x * 2)
    assert list(g._exes.values()) == [None]


def test_corrupt_entry_falls_back(aot_env, monkeypatch):
    monkeypatch.setenv("H2V_AOT_RECORD", "1")
    g1 = _make_fn()
    x = np.ones(4, dtype=np.float32)
    g1(x, k=2)
    inv = aotcache.pack_inventory()
    path = os.path.join(inv["dir"], inv["files"][0])
    with open(path, "wb") as fh:
        fh.write(b"garbage")
    monkeypatch.delenv("H2V_AOT_RECORD")
    g2 = _make_fn()
    np.testing.assert_array_equal(np.asarray(g2(x, k=2)), x * 2)
    assert list(g2._exes.values()) == [None]


def test_transparent_under_trace(aot_env, monkeypatch):
    """An aot_jit fn called inside an enclosing jit must inline (no
    executable lookup on tracers)."""
    monkeypatch.setenv("H2V_AOT_RECORD", "1")
    g = _make_fn()

    @jax.jit
    def outer(x):
        return g(x, k=2) + 1

    x = np.ones(4, dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(outer(x)), x * 2 + 1)
    assert aotcache.pack_inventory()["entries"] == 0  # nothing recorded


def test_shape_key_distinguishes(aot_env, monkeypatch):
    monkeypatch.setenv("H2V_AOT_RECORD", "1")
    g = _make_fn()
    g(np.ones(4, dtype=np.float32), k=2)
    g(np.ones(8, dtype=np.float32), k=2)
    assert aotcache.pack_inventory()["entries"] == 2
