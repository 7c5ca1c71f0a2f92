"""Generate the committed k=14 bench fixture (BASELINE.md's workload
class): 8 distinct vector-mul proofs at k=14 with 2000-element instance
columns, plus verifier params and vk in the reference byte formats.

Run from the repo root: python benchmarks/gen_fixture.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from halo2_verifier_tpu.prover.circuits import vector_mul_spec  # noqa: E402
from halo2_verifier_tpu.prover.keygen import keygen  # noqa: E402
from halo2_verifier_tpu.prover.prove import create_proof  # noqa: E402
from halo2_verifier_tpu.prover.srs import load_srs  # noqa: E402
from halo2_verifier_tpu.transcript import Blake2bWrite  # noqa: E402
from halo2_verifier_tpu.protocol.verifier import verify_proof_single  # noqa: E402

K = 14
N_MULS = 2000
N_PROOFS = 8
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "fixtures", f"k{K}")


def main():
    os.makedirs(OUT, exist_ok=True)
    srs = load_srs(K)
    spec, mk = vector_mul_spec(K, N_MULS)
    pk = keygen(spec, srs)
    params = srs.verifier_params()
    with open(os.path.join(OUT, "params.bin"), "wb") as f:
        f.write(params.to_bytes())
    with open(os.path.join(OUT, "vk.bin"), "wb") as f:
        f.write(pk.vk.to_bytes())
    for i in range(N_PROOFS):
        asg = mk([(i * 7 + j + 2) % 65537 + 1 for j in range(N_MULS)],
                 [(i * 13 + 3 * j + 5) % 65537 + 1 for j in range(N_MULS)])
        proof = create_proof(pk, [asg], Blake2bWrite(),
                             seed=f"bench{i}".encode())
        assert verify_proof_single(params, pk.vk, proof, [asg.instance])
        with open(os.path.join(OUT, f"proof_{i}.bin"), "wb") as f:
            f.write(proof)
        with open(os.path.join(OUT, f"instances_{i}.txt"), "w") as f:
            for ci, col in enumerate(asg.instance):
                if ci:
                    f.write("\n")
                for v in col:
                    f.write(f"{v}\n")
        print(f"proof {i} written ({len(proof)} bytes)")
    print("fixture complete:", OUT)


if __name__ == "__main__":
    main()
