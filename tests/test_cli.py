"""CLI end-to-end tests (parity with serialize/bin/convert_params.rs:9-40
plus the extra inspect-vk / verify tools)."""

import pytest

from halo2_verifier_tpu.cli import main
from halo2_verifier_tpu.prover.circuits import vector_mul_spec
from halo2_verifier_tpu.prover.keygen import keygen
from halo2_verifier_tpu.prover.prove import create_proof
from halo2_verifier_tpu.prover.srs import load_srs
from halo2_verifier_tpu.transcript import Blake2bWrite


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    srs = load_srs(8)
    spec, make_assignment = vector_mul_spec(8, 6)
    pk = keygen(spec, srs)
    asg = make_assignment([2] * 6, [5] * 6)
    proof = create_proof(pk, [asg], Blake2bWrite())

    srs_path = d / "fat.srs"
    srs_path.write_bytes(srs.to_bytes())
    vk_path = d / "vk.bin"
    vk_path.write_bytes(pk.vk.to_bytes("processed"))
    proof_path = d / "proof.bin"
    proof_path.write_bytes(proof)
    inst_path = d / "instances.txt"
    inst_path.write_text("\n".join(str(v) for v in asg.instance[0]) + "\n")
    return d, srs_path, vk_path, proof_path, inst_path


def test_convert_params(artifacts, capsys):
    d, srs_path, *_ = artifacts
    out = d / "params.srs"
    assert main(["convert-params", str(srs_path), str(out)]) == 0
    data = out.read_bytes()
    # the space-efficient verifier params are exactly 164 bytes
    # (kzg/commitment.rs:209-213)
    assert len(data) == 164
    assert "wrote verifier params (k=8)" in capsys.readouterr().out


def test_inspect_vk(artifacts, capsys):
    _, _, vk_path, _, _ = artifacts
    assert main(["inspect-vk", str(vk_path)]) == 0
    out = capsys.readouterr().out
    assert "k=8" in out and "gates=" in out and "transcript_repr=0x" in out


def test_verify_ok_and_tampered(artifacts, capsys):
    d, srs_path, vk_path, proof_path, inst_path = artifacts
    params_path = d / "p.srs"
    main(["convert-params", str(srs_path), str(params_path)])

    rc = main(["verify", str(params_path), str(vk_path), str(proof_path),
               "--instances", str(inst_path)])
    assert rc == 0
    assert "OK" in capsys.readouterr().out

    # tamper one instance value -> FAIL, exit 1
    lines = inst_path.read_text().splitlines()
    lines[0] = str(int(lines[0]) + 1)
    bad = d / "bad_instances.txt"
    bad.write_text("\n".join(lines) + "\n")
    rc = main(["verify", str(params_path), str(vk_path), str(proof_path),
               "--instances", str(bad)])
    assert rc == 1
    assert "FAIL" in capsys.readouterr().out
