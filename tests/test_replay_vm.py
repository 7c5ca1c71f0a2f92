"""Differential tests: traced replay program + native VM vs the Python
protocol path. The VM must reproduce the Python replay's DualMSM entry
lists bit-for-bit (scalars AND base points, in order) for every circuit
family, hash, and multiopen backend, and reject malformed proofs."""

import pytest

from halo2_verifier_tpu.protocol.kzg import DualMSM
from halo2_verifier_tpu.protocol.verifier import verify_proof
from halo2_verifier_tpu.transcript import TRANSCRIPT_READERS, \
    TRANSCRIPT_WRITERS


def python_dual(params, vk, proof, instances, multiopen, hash_name):
    transcript = TRANSCRIPT_READERS[hash_name](proof)
    holder = {}

    class _Capture:
        def process(self, f):
            holder["dual"] = f(DualMSM(params))

    verify_proof(params, vk, _Capture(), [instances], transcript,
                 multiopen=multiopen)
    return holder["dual"]


def _require_vm():
    from halo2_verifier_tpu.protocol.replay_native import vm_available

    if not vm_available():
        pytest.skip("native VM unavailable (no compiler?)")


def assert_duals_equal(a, b):
    assert a.left.scalars == b.left.scalars
    assert a.left.bases == b.left.bases
    assert a.right.scalars == b.right.scalars
    assert a.right.bases == b.right.bases


@pytest.mark.parametrize("multiopen", ["shplonk", "gwc"])
@pytest.mark.parametrize("hash_name", ["blake2b", "keccak256"])
def test_vm_matches_python_vector_mul(multiopen, hash_name):
    _require_vm()
    from halo2_verifier_tpu.protocol.replay_native import CompiledReplay
    from halo2_verifier_tpu.prover.circuits import vector_mul_spec
    from halo2_verifier_tpu.prover.keygen import keygen
    from halo2_verifier_tpu.prover.prove import create_proof
    from halo2_verifier_tpu.prover.srs import load_srs

    srs = load_srs(8)
    spec, make_assignment = vector_mul_spec(8, 8)
    pk = keygen(spec, srs)
    params = srs.verifier_params()

    items = []
    for i in range(5):
        asg = make_assignment([i + 2] * 8, [3 * i + 5] * 8)
        proof = create_proof(pk, [asg], TRANSCRIPT_WRITERS[hash_name](),
                             seed=str(i).encode(), multiopen=multiopen)
        items.append((proof, asg.instance))

    shape = tuple(len(c) for c in items[0][1])
    cr = CompiledReplay(params, pk.vk, shape, multiopen=multiopen,
                        hash_name=hash_name)
    got = cr.replay_batch(items)
    for (proof, inst), dual in zip(items, got):
        expected = python_dual(params, pk.vk, proof, inst, multiopen,
                               hash_name)
        assert_duals_equal(dual, expected)


def test_vm_matches_python_lookup_shuffle():
    """Circuits exercising lookups, shuffles, multi-phase challenges."""
    _require_vm()
    from halo2_verifier_tpu.protocol.replay_native import CompiledReplay
    from halo2_verifier_tpu.prover.circuits import (
        lookup_spec,
        shuffle_spec,
    )
    from halo2_verifier_tpu.prover.keygen import keygen
    from halo2_verifier_tpu.prover.prove import create_proof
    from halo2_verifier_tpu.prover.srs import load_srs

    srs = load_srs(8)
    table = [1, 3, 4, 7, 9, 12, 15, 16]
    lk = lookup_spec(8, table, lookups_rows=16)
    spec_l, mk_l = lk[0], lk[1]
    W, H = 2, 8
    spec_s, mk_s = shuffle_spec(8, W, H)
    cols = [[(w * 31 + h * 7 + 1) for h in range(H)] for w in range(W)]
    perm = list(range(H - 1, -1, -1))
    cases = [
        (spec_l, lambda: mk_l([table[i % len(table)] for i in range(16)])),
        (spec_s, lambda: mk_s(cols, perm)),
    ]
    for spec, mk in cases:
        pk = keygen(spec, srs)
        params = srs.verifier_params()
        asg = mk()
        proof = create_proof(pk, [asg], TRANSCRIPT_WRITERS["blake2b"](),
                             seed=b"vm")
        inst = asg.instance
        shape = tuple(len(c) for c in inst)
        cr = CompiledReplay(params, pk.vk, shape)
        got = cr.replay_batch([(proof, inst)])[0]
        expected = python_dual(params, pk.vk, proof, inst, "shplonk",
                               "blake2b")
        assert_duals_equal(got, expected)


def test_vm_rejects_malformed():
    _require_vm()
    from halo2_verifier_tpu.protocol.replay_native import (
        CompiledReplay,
        MalformedProof,
    )
    from halo2_verifier_tpu.prover.circuits import vector_mul_spec
    from halo2_verifier_tpu.prover.keygen import keygen
    from halo2_verifier_tpu.prover.prove import create_proof
    from halo2_verifier_tpu.prover.srs import load_srs

    srs = load_srs(8)
    spec, make_assignment = vector_mul_spec(8, 8)
    pk = keygen(spec, srs)
    params = srs.verifier_params()
    asg = make_assignment([2] * 8, [3] * 8)
    proof = create_proof(pk, [asg], TRANSCRIPT_WRITERS["blake2b"](),
                         seed=b"x")
    shape = tuple(len(c) for c in asg.instance)
    cr = CompiledReplay(params, pk.vk, shape)

    # truncated
    with pytest.raises(MalformedProof) as e:
        cr.replay_batch([(proof[:-8], asg.instance)])
    assert e.value.indices == [0]
    # corrupted first point (invalid x encoding: set x >= p via high bits)
    bad = bytearray(proof)
    bad[0:32] = b"\xff" * 31 + b"\x7f"
    with pytest.raises(MalformedProof):
        cr.replay_batch([(bytes(bad), asg.instance)])
    # a good and a bad proof: index localized
    with pytest.raises(MalformedProof) as e:
        cr.replay_batch([(proof, asg.instance), (proof[:-8], asg.instance)])
    assert e.value.indices == [1]
    # tampered (but well-formed) proof still replays fine AND bit-matches
    # the Python replay of the same bytes: find a byte whose flip keeps the
    # stream parseable (a low eval byte), then compare
    for off in range(len(proof) - 32, -1, -32):
        tampered = bytes(proof[:off]) + bytes([proof[off] ^ 1]) \
            + bytes(proof[off + 1:])
        try:
            expected = python_dual(params, pk.vk, tampered, asg.instance,
                                   "shplonk", "blake2b")
        except Exception:
            continue
        duals = cr.replay_batch([(tampered, asg.instance)])
        assert_duals_equal(duals[0], expected)
        break
    else:
        pytest.fail("no parseable tampered offset found")
