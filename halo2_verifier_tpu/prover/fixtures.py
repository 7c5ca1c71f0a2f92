"""Committed proof-pack fixtures.

Live proving with the test-only prover costs seconds per proof (k=8) to
~20 s (k=14), so test/bench/dryrun workloads load pre-generated proof
packs committed under params/. A pack stores only proof bytes + witness
seeds; instances are recomputed from the seeds and vk/params re-derived
from the deterministic SRS — a vk hash in the pack catches drift (if the
prover or codecs change, the pack regenerates live and rewrites itself).

Mirrors the reference's fixture discipline: deterministic SRS cached at
halo2_verifier/params/kzg_bn254_8.srs + seeded proofs
(tests/helpers.rs:87-105, tests/helpers.rs:32).
"""

from __future__ import annotations

import hashlib
import os

PARAMS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", "..", "params")


def load_or_build_pack(name: str, pk, mk, seeds, hash_name="blake2b",
                       multiopen="shplonk"):
    """Return [(proof_bytes, instances)] for `seeds`, from the committed
    pack params/<name>.npz when its vk hash and seed list match; proves
    live and rewrites the pack otherwise.

    mk(seed) -> assignment (with .instance); pk is the proving key.
    """
    import numpy as np

    path = os.path.join(PARAMS_DIR, f"{name}.npz")
    vsha = hashlib.sha256(pk.vk.to_bytes()).hexdigest()
    key = f"{hash_name}/{multiopen}"
    proofs = None
    if os.path.exists(path):
        with np.load(path) as z:
            if (str(z["vk_sha256"]) == vsha
                    and str(z.get("key", key)) == key
                    and list(z["seeds"]) == list(seeds)):
                proofs = [bytes(p.tobytes()) for p in z["proofs"]]
    if proofs is None:
        from ..transcript import TRANSCRIPT_WRITERS
        from .prove import create_proof

        proofs = [
            create_proof(pk, [mk(s)], TRANSCRIPT_WRITERS[hash_name](),
                         seed=str(s).encode(), multiopen=multiopen)
            for s in seeds
        ]
        np.savez_compressed(
            path + ".tmp.npz",
            proofs=np.stack([np.frombuffer(p, np.uint8) for p in proofs]),
            seeds=np.asarray(list(seeds), np.int64), vk_sha256=vsha,
            key=key,
        )
        os.replace(path + ".tmp.npz", path)
    return [(p, mk(s).instance) for p, s in zip(proofs, seeds)]


def vm_k8_batch(seeds=(0, 1, 2)):
    """vector_mul k=8 proof batch (the reference's primary e2e workload,
    tests/vector_mul.rs:306): returns (params, vk, [(proof, instances)])
    from the committed pack params/test_vm_k8_pack.npz."""
    from .circuits import vector_mul_spec
    from .keygen import keygen
    from .srs import load_srs

    srs = load_srs(8)
    spec, make_assignment = vector_mul_spec(8, 3)
    pk = keygen(spec, srs)

    def mk(i):
        return make_assignment([i + 2] * 3, [i + 5] * 3)

    batch = load_or_build_pack("test_vm_k8_pack", pk, mk, list(seeds))
    return srs.verifier_params(), pk.vk, batch
