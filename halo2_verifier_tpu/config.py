"""Runtime configuration (SURVEY.md §5: the reference configures via Rust
generics at compile time — commitment scheme x multiopen verifier x
transcript hash x strategy, lib.rs:33-40 — plus the SerdeFormat enum,
helpers.rs:7-19; here the same axes are one dataclass)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class VerifierConfig:
    multiopen: str = "shplonk"        # "shplonk" (BDFG20) | "gwc" (GWC19)
    hash: str = "blake2b"             # "blake2b" | "keccak256"
    strategy: str = "accumulator"     # "single" | "accumulator"
    pairing: str = "host"             # "host" (C++) | "device" (pairing_jax)
    serde_format: str = "processed"   # "processed"|"raw_bytes"|"raw_bytes_unchecked"
    mesh_shape: tuple = ()            # () = single chip; (D,) = D-way MSM TP
    batch_size: int = 512             # proofs per stream batch
    localize_failures: bool = True    # bisect failing batches

    def make_verifier(self, params, vk):
        """Build the batch verifier for this configuration."""
        from .parallel.mesh import make_mesh
        from .parallel.orchestrator import BatchVerifier

        mesh = None
        if self.mesh_shape:
            mesh = make_mesh(self.mesh_shape[0])
        return BatchVerifier(params, vk, multiopen=self.multiopen,
                             hash_name=self.hash, mesh=mesh,
                             strategy=self.strategy, pairing=self.pairing)
