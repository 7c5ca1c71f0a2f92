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
# NOTE: the persistent compilation cache (jax_compilation_cache_dir) is
# deliberately NOT enabled: the zstandard-backed cache reader segfaults
# intermittently in this environment (crash inside
# compilation_cache.get_executable_and_time). Cold compiles are slower but
# reliable.

import jax  # noqa: E402

# sitecustomize imports jax before this file runs, so env vars set above are
# too late for jax's config bootstrap — use explicit config updates.
jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------- fixtures
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def host_msm_mode():
    """Route BatchVerifier MSMs to the exact native host path
    (H2V_MSM=host) for ORCHESTRATION-LOGIC tests: the device kernels get
    dedicated coverage in test_msm_forest/test_curve_msm_jax/
    test_parallel/test_lm*; recompiling them per orchestration test was
    most of the suite's wall time (XLA-CPU compiles, ~minutes each)."""
    old = os.environ.get("H2V_MSM")
    os.environ["H2V_MSM"] = "host"
    yield
    if old is None:
        os.environ.pop("H2V_MSM", None)
    else:
        os.environ["H2V_MSM"] = old
