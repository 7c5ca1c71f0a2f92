"""Generate the committed k=14-class bench fixture pack.

The bench headline (BASELINE.md) is proofs/s on a k=14-class KZG circuit;
proving one such proof costs ~20 s in the test-only prover, so the bench
loads a pre-generated pack instead of proving live. The pack holds only
proof bytes + witness seeds: instances are recomputed from the seeds, and
vk/params are re-derived from the deterministic SRS (a vk hash in the pack
catches drift).

Run from the repo root (resumable; add --count to extend):
    python benchmarks/gen_k14_pack.py --count 256 --workers 2
"""

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

K = 14
ROWS = 8192
N_PUB = 32
PACK = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "params", "k14_mac_pack.npz")


def build_pk():
    from halo2_verifier_tpu.prover.circuits import mac_range_spec
    from halo2_verifier_tpu.prover.keygen import keygen
    from halo2_verifier_tpu.prover.srs import load_srs

    srs = load_srs(K)
    spec, mk = mac_range_spec(K, ROWS, N_PUB)
    return srs, keygen(spec, srs), mk


def vk_hash(vk) -> str:
    return hashlib.sha256(vk.to_bytes()).hexdigest()


_WORKER_PK = None


def _worker_init():
    global _WORKER_PK
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    _WORKER_PK = build_pk()


def _prove_one(seed: int) -> bytes:
    from halo2_verifier_tpu.transcript import Blake2bWrite
    from halo2_verifier_tpu.prover.prove import create_proof

    _, pk, mk = _WORKER_PK
    asg = mk(seed)
    return create_proof(pk, [asg], Blake2bWrite(),
                        seed=str(seed).encode())


def load_pack():
    """Returns (proofs uint8 (n, plen), seeds int64 (n,), meta dict) or
    None."""
    if not os.path.exists(PACK):
        return None
    with np.load(PACK) as z:
        return z["proofs"], z["seeds"], {
            "k": int(z["k"]), "rows": int(z["rows"]),
            "n_pub": int(z["n_pub"]), "vk_sha256": str(z["vk_sha256"]),
        }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--count", type=int, default=256)
    ap.add_argument("--workers", type=int, default=2)
    args = ap.parse_args()

    existing = load_pack()
    done = 0
    proofs = seeds = None
    srs, pk, mk = build_pk()
    vsha = vk_hash(pk.vk)
    if existing is not None:
        proofs, seeds, meta = existing
        assert meta["vk_sha256"] == vsha, (
            "existing pack was generated with a different vk — delete it"
        )
        done = proofs.shape[0]
        print(f"pack has {done} proofs")
    if done >= args.count:
        print("nothing to do")
        return

    todo = list(range(done, args.count))
    t0 = time.time()
    import multiprocessing as mp

    new = []
    with mp.get_context("spawn").Pool(args.workers,
                                      initializer=_worker_init) as pool:
        for i, p in enumerate(pool.imap(_prove_one, todo, chunksize=1)):
            new.append(np.frombuffer(p, dtype=np.uint8))
            el = time.time() - t0
            print(f"proof {todo[i]} done ({el:.0f}s elapsed, "
                  f"{el / (i + 1):.1f}s each)", flush=True)
            if (i + 1) % 16 == 0 or i + 1 == len(todo):
                allp = (np.stack(new) if proofs is None else
                        np.concatenate([proofs, np.stack(new)]))
                alls = np.concatenate([
                    seeds if seeds is not None else
                    np.zeros((0,), np.int64),
                    np.asarray(todo[:i + 1], np.int64),
                ])
                np.savez_compressed(
                    PACK + ".tmp.npz", proofs=allp, seeds=alls, k=K,
                    rows=ROWS, n_pub=N_PUB, vk_sha256=vsha,
                )
                os.replace(PACK + ".tmp.npz", PACK)
                print(f"  pack checkpointed at {allp.shape[0]} proofs",
                      flush=True)


if __name__ == "__main__":
    main()
