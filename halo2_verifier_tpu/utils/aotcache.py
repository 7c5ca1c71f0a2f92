"""Ahead-of-time compiled-executable cache for the stream-path kernels.

The reference verifier is instant-on (a cold process verifies its first
proof in milliseconds, /root/reference/halo2_verifier/src/lib.rs:33-46);
the TPU build's XLA/Mosaic compiles cost ~20-30 s PER stage program on the
tunneled v5e — 400+ s of warmup for the ~25-program stream path (r04
driver bench: 428.9 s of 444.4 s wall was compile). JAX's persistent
compilation cache is unusable on this backend (reads hang,
benchmarks/RESULTS.md "Compile-cache findings"), but raw executable
serialization round-trips fine and loads in ~0.1 s
(benchmarks/exp_compile_r05.py: serialize 0.1 s / 8.4 MB raw / 2.9 MB
zlib; deserialize_and_load 0.1 s; first run 0.01 s, cross-process).

So: `aot_jit(fn)` wraps `jax.jit(fn)`. Every call computes a key from the
function identity + abstract argument signature (+ static values) and

- REPLAY (default when a pack entry exists): deserializes the committed
  executable and calls it — no compile, warmup in seconds;
- RECORD (H2V_AOT_RECORD=1): compiles as usual, serializes the executable
  into the pack (params/aot/<device-fingerprint>/) for future replays;
- FALLBACK: anything missing/failing degrades to the plain jit call —
  the cache is an optimization, never a correctness dependency.

Entries are fingerprinted by device kind + jax version; a pack recorded
on one v5e chip loads on any other (PJRT compatibility is by device
kind/topology, not serial). H2V_AOT=0 disables entirely (CPU test runs
never consult the pack: entries are TPU binaries).
"""

from __future__ import annotations

import hashlib
import os
import pickle
import threading
import zlib

_MISS = object()
_lock = threading.Lock()
_fingerprint_cache = None
_registry = []  # every AotFn, for preload/inventory tooling


def pack_root() -> str:
    root = os.environ.get("H2V_AOT_DIR")
    if root:
        return root
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "params", "aot")


def _record() -> bool:
    return os.environ.get("H2V_AOT_RECORD") == "1"


def _enabled() -> bool:
    v = os.environ.get("H2V_AOT")
    if v == "0":
        return False
    if v == "1" or _record():
        return True
    # default: only on an accelerator (pack entries are TPU binaries;
    # CPU suites would churn the key computation for guaranteed misses)
    try:
        import jax

        return jax.default_backend() != "cpu"
    except Exception:
        return False


def fingerprint() -> str:
    """Device-kind + jax-version directory name, filesystem-safe."""
    global _fingerprint_cache
    if _fingerprint_cache is None:
        import jax

        d = jax.devices()[0]
        kind = getattr(d, "device_kind", None) or d.platform
        raw = f"{d.platform}_{kind}_jax{jax.__version__}"
        _fingerprint_cache = "".join(
            c if c.isalnum() or c in "._-" else "-" for c in raw
        )
    return _fingerprint_cache


_salt_cache = None


def _salt() -> str:
    """Content hash of the ops package sources: any kernel edit
    invalidates every pack entry (keys change), forcing a fresh compile
    instead of silently serving an executable built from old code.
    H2V_AOT_SALT overrides (e.g. to pin a pack while editing comments)."""
    global _salt_cache
    env = os.environ.get("H2V_AOT_SALT")
    if env:
        return env
    if _salt_cache is None:
        h = hashlib.sha256()
        ops_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "ops")
        try:
            for name in sorted(os.listdir(ops_dir)):
                if name.endswith(".py"):
                    with open(os.path.join(ops_dir, name), "rb") as fh:
                        h.update(name.encode())
                        h.update(fh.read())
        except OSError:
            pass
        _salt_cache = h.hexdigest()[:12]
    return _salt_cache


def _leaf_sig(x):
    shape = getattr(x, "shape", None)
    dtype = getattr(x, "dtype", None)
    if shape is not None and dtype is not None:
        return ("a", tuple(shape), str(dtype))
    return ("v", repr(x))


def _key(name: str, args, kwargs) -> str:
    import jax

    leaves, treedef = jax.tree_util.tree_flatten((args, kwargs))
    sig = repr((name, _salt(), treedef, [_leaf_sig(x) for x in leaves]))
    return hashlib.sha256(sig.encode()).hexdigest()[:20]


class AotFn:
    """jax.jit plus the executable cache. Transparent: same call
    signature, same results; `.jit` exposes the wrapped jit object
    (e.g. for .lower())."""

    def __init__(self, fn, static_argnames=()):
        import jax

        self.fn = fn
        self.static_argnames = tuple(static_argnames)
        self.jit = (jax.jit(fn, static_argnames=static_argnames)
                    if static_argnames else jax.jit(fn))
        self.name = f"{fn.__module__}.{fn.__qualname__}"
        self._exes = {}
        _registry.append(self)

    def _path(self, key: str) -> str:
        short = self.name.rsplit(".", 1)[-1]
        return os.path.join(pack_root(), fingerprint(),
                            f"{short}.{key}.aot")

    def _load(self, key: str):
        """Deserialize a pack entry; None on any failure."""
        path = self._path(key)
        try:
            with open(path, "rb") as fh:
                payload, in_tree, out_tree = pickle.loads(
                    zlib.decompress(fh.read()))
            import jax
            from jax.experimental.serialize_executable import (
                deserialize_and_load,
            )

            # all cached programs are single-device; the default
            # (execution_devices = every local device) would load them as
            # 8-shard programs on the virtual test meshes
            return deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=jax.devices()[:1],
            )
        except FileNotFoundError:
            return None
        except Exception as e:  # incompatible pack entry: fall back
            import sys

            print(f"aotcache: load failed for {self.name} ({e!r}); "
                  "falling back to jit", file=sys.stderr)
            return None

    def _record_compile(self, key: str, args, kwargs):
        """Compile + serialize into the pack; None on any failure."""
        try:
            compiled = self.jit.lower(*args, **kwargs).compile()
            from jax.experimental.serialize_executable import serialize

            payload, in_tree, out_tree = serialize(compiled)
            blob = zlib.compress(
                pickle.dumps((payload, in_tree, out_tree)), 6)
            path = self._path(key)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(blob)
            os.replace(tmp, path)
            import sys

            print(f"aotcache: recorded {os.path.basename(path)} "
                  f"({len(blob) / 1e6:.2f} MB)", file=sys.stderr)
            return compiled
        except Exception as e:
            import sys

            print(f"aotcache: record failed for {self.name} ({e!r}); "
                  "falling back to jit", file=sys.stderr)
            return None

    def __call__(self, *args, **kwargs):
        if not _enabled():
            return self.jit(*args, **kwargs)
        import jax

        if any(isinstance(x, jax.core.Tracer)
               for x in jax.tree_util.tree_leaves((args, kwargs))):
            # called under an enclosing trace (e.g. inside a fused stage):
            # inline like a plain jitted call — executables are for
            # top-level dispatches only
            return self.jit(*args, **kwargs)
        key = _key(self.name, args, kwargs)
        with _lock:
            ex = self._exes.get(key, _MISS)
        if ex is _MISS:
            ex = self._load(key)
            if ex is None and _record():
                ex = self._record_compile(key, args, kwargs)
            with _lock:
                self._exes[key] = ex
        if ex is None:
            return self.jit(*args, **kwargs)
        try:
            # a Compiled executable's input pytree covers only the DYNAMIC
            # args (statics are baked in at compile; the key above already
            # pinned their values) — call sites pass statics as kwargs
            dyn = {k: v for k, v in kwargs.items()
                   if k not in self.static_argnames}
            return ex(*args, **dyn)
        except Exception as e:  # signature drift etc: stay correct
            import sys

            print(f"aotcache: call failed for {self.name} ({e!r}); "
                  "falling back to jit", file=sys.stderr)
            with _lock:
                self._exes[key] = None
            return self.jit(*args, **kwargs)


def aot_jit(fn=None, *, static_argnames=()):
    """Decorator: jax.jit with the executable cache in front."""
    if fn is None:
        return lambda f: AotFn(f, static_argnames=static_argnames)
    return AotFn(fn, static_argnames=static_argnames)


def _pins_path() -> str:
    return os.path.join(pack_root(), fingerprint(), "planpins.json")


def load_plan_pins() -> dict:
    """Persisted forest-plan width pins (msm_forest.pin_plan_widths),
    keyed by repr(tuple(sizes)) + the ops salt: replay starts streams at
    the widths the record run stabilized on, so batch 0 already matches
    the recorded executables and no mid-stream re-pin compile occurs."""
    if not _enabled():
        return {}
    try:
        import json

        with open(_pins_path()) as fh:
            raw = json.load(fh)
        if raw.get("salt") != _salt():
            return {}
        return {
            k: (tuple(v[0]), tuple(v[1])) for k, v in raw["pins"].items()
        }
    except Exception:
        return {}


def save_plan_pins(pins: dict) -> None:
    """Record mode: persist the stabilized width pins next to the pack."""
    if not _record():
        return
    try:
        import json

        path = _pins_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump({
                "salt": _salt(),
                "pins": {k: [list(v[0]), list(v[1])]
                         for k, v in pins.items()},
            }, fh)
        os.replace(tmp, path)
    except Exception as e:
        import sys

        print(f"aotcache: plan-pin save failed ({e!r})", file=sys.stderr)


def pack_inventory() -> dict:
    """Committed pack entries for the current fingerprint (diagnostics)."""
    d = os.path.join(pack_root(), fingerprint())
    try:
        files = sorted(os.listdir(d))
    except OSError:
        return {"dir": d, "entries": 0, "bytes": 0, "files": []}
    paths = [os.path.join(d, f) for f in files if f.endswith(".aot")]
    return {
        "dir": d,
        "entries": len(paths),
        "bytes": sum(os.path.getsize(p) for p in paths),
        "files": [os.path.basename(p) for p in paths],
    }
