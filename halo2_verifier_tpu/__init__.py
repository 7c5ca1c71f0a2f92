"""TPU-native Halo2/KZG proof verification framework.

Public API (mirroring the reference's surface, halo2_verifier/src/lib.rs,
re-designed for batched TPU verification):

- verify_proof / verify_proof_single — the protocol entry point (lib.rs:33)
- VerifyingKey, ParamsKZG — bit-exact codecs for the reference formats
- SingleStrategy, AccumulatorStrategy, GuardKZG, DualMSM, MSMKZG
- Blake2bRead/Write, Keccak256Read/Write transcripts
- BatchVerifier — the TPU serving pipeline (stream of proof batches, one
  pairing per batch, device MSMs, native replay VM)
- VerifierConfig — runtime configuration (multiopen x hash x strategy x
  serde format x mesh)
"""

from .config import VerifierConfig
from .protocol.kzg import (
    AccumulatorStrategy,
    Blind,
    ConstraintSystemFailure,
    DualMSM,
    GuardKZG,
    MSMKZG,
    ParamsKZG,
    SingleStrategy,
    VerifyFailure,
)
from .protocol.domain import EvaluationDomain, Rotation
from .protocol.verifier import verify_proof, verify_proof_single
from .protocol.vk import VerifyingKey
from .transcript import (
    Blake2bRead,
    Blake2bWrite,
    Keccak256Read,
    Keccak256Write,
)

__all__ = [
    "AccumulatorStrategy",
    "Blake2bRead",
    "Blake2bWrite",
    "Blind",
    "ConstraintSystemFailure",
    "DualMSM",
    "EvaluationDomain",
    "GuardKZG",
    "Keccak256Read",
    "Keccak256Write",
    "MSMKZG",
    "ParamsKZG",
    "Rotation",
    "SingleStrategy",
    "VerifierConfig",
    "VerifyFailure",
    "VerifyingKey",
    "verify_proof",
    "verify_proof_single",
]


def BatchVerifier(*args, **kwargs):
    """Lazy import: the orchestrator pulls in jax."""
    from .parallel.orchestrator import BatchVerifier as _BV

    return _BV(*args, **kwargs)
