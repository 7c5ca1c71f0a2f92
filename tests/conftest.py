import os

# Device-path tests run on a virtual 8-device CPU mesh; must be set before
# jax is imported anywhere in the test process.
# NOTE: the environment pins JAX_PLATFORMS=axon (real tunneled TPU) and a
# sitecustomize hook re-registers it at interpreter start; tests must
# override BOTH the env var and the jax config to actually get CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# persistent compilation cache makes repeated test runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_h2v")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault(
    "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1"
)

import jax  # noqa: E402

# sitecustomize imports jax before this file runs, so env vars set above are
# too late for jax's config bootstrap — use explicit config updates.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_h2v")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
