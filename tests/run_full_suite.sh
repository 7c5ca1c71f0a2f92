#!/bin/sh
# Full test suite = the fast default set, then the compile-heavy set
# split across THREE pytest processes.
#
# Why separate processes: long XLA-CPU pytest processes accumulate
# compiler state and segfault on a late big compile (tests/conftest.py
# note; one single-process full run crashed 41 minutes in on r04, and a
# single heavy-marker process crashed inside test_msm_forest's
# all-in-one fused program on r05 after ~12 earlier heavy compiles).
# The repo's standing rule — run heavy multi-device compiles in a fresh
# process (see tests/test_parallel.py's dryrun skip note) — therefore
# applies per heavy GROUP, not just to the heavy set as a whole:
#   group 1: mesh / multihost / parallel (8-device shard_map programs)
#   group 2: forest + curve MSM kernels (the biggest single compiles)
#   group 3: everything else heavy (mxu, pairing, batch strategy)
#
#   sh tests/run_full_suite.sh [-x] [extra pytest args]
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q "$@"
H2V_FULL_SUITE=1 python -m pytest -q -m heavy_compile "$@" \
    tests/test_mesh_e2e.py tests/test_multihost.py tests/test_parallel.py
H2V_FULL_SUITE=1 python -m pytest -q -m heavy_compile "$@" \
    tests/test_msm_forest.py tests/test_curve_msm_jax.py
H2V_FULL_SUITE=1 python -m pytest -q -m heavy_compile "$@" \
    tests/test_mont_mxu.py tests/test_pairing_jax.py \
    tests/test_batch_strategy.py
