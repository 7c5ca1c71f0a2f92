#!/bin/sh
# Full test suite = the fast default set, then the compile-heavy set in
# its OWN pytest process.
#
# Why two processes: long XLA-CPU pytest processes accumulate compiler
# state and can segfault on a late big compile (tests/conftest.py note;
# one single-process full run crashed 41 minutes in, r04). The repo's
# standing rule — run heavy multi-device compiles in a fresh process
# (see tests/test_parallel.py's dryrun skip note) — applies to the heavy
# marker set as a whole.
#
#   sh tests/run_full_suite.sh [-x] [extra pytest args]
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q "$@"
H2V_FULL_SUITE=1 python -m pytest tests/ -q -m heavy_compile "$@"
