"""SRS loading / generation for the test-only prover.

Parses the upstream "fat" SRS byte format (k LE u32 | n raw G1 | n raw
lagrange G1 | raw g2 | raw s_g2) produced by the reference's gen_srs
(tests/helpers.rs:87-105); the k=8 fixture shipped with the reference is
used directly. For other k a deterministic test-only SRS is generated
(toxic waste derived from a fixed seed, mirroring ParamsKZG::setup's
"MUST NOT be used in production" caveat, kzg/commitment.rs:54-112).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

from ..ops import hostcurve as hc
from ..ops.constants import FR_ROOT_OF_UNITY, FR_S, G1_GEN, G2_GEN, R
from ..protocol.kzg import ParamsKZG

# The reference repo ships a deterministic k=8 fixture; use it (read-only)
# when present for cross-implementation validation. Never copied into this
# repo — regenerated deterministically when absent.
REFERENCE_SRS_K8 = "/root/reference/halo2_verifier/params/kzg_bn254_8.srs"


@dataclass
class FullSRS:
    k: int
    g: list          # monomial basis [s^i]G1
    g_lagrange: list  # [L_i(s)]G1
    g2: tuple
    s_g2: tuple

    def verifier_params(self) -> ParamsKZG:
        """The space-efficient verifier params (convert_params,
        serialize/src/lib.rs:26-36)."""
        return ParamsKZG(self.k, 1 << self.k, self.g[0], self.g2, self.s_g2)

    # upstream fat codec ----------------------------------------------------
    def to_bytes(self) -> bytes:
        out = bytearray(int(self.k).to_bytes(4, "little"))
        for p in self.g:
            out += hc.g1_to_raw(p)
        for p in self.g_lagrange:
            out += hc.g1_to_raw(p)
        out += hc.g2_to_raw(self.g2)
        out += hc.g2_to_raw(self.s_g2)
        return bytes(out)

    @classmethod
    def from_bytes(cls, data: bytes) -> "FullSRS":
        k = int.from_bytes(data[:4], "little")
        n = 1 << k
        off = 4
        g = []
        for _ in range(n):
            g.append(hc.g1_from_raw(data[off: off + 64], check=False))
            off += 64
        g_lagrange = []
        for _ in range(n):
            g_lagrange.append(hc.g1_from_raw(data[off: off + 64], check=False))
            off += 64
        g2 = hc.g2_from_raw(data[off: off + 128], check=False)
        off += 128
        s_g2 = hc.g2_from_raw(data[off: off + 128], check=False)
        return cls(k, g, g_lagrange, g2, s_g2)


def _jacobian_scale_chain(base, scalars):
    """[scalars[i]] * base for many scalars, batching the final inversions."""
    # Jacobian double-and-add without per-step affine normalization.
    def jdouble(p):
        X, Y, Z = p
        if Y == 0 or Z == 0:
            return (0, 1, 0)
        A = X * X % hc.P
        B = Y * Y % hc.P
        C = B * B % hc.P
        D = 2 * ((X + B) ** 2 - A - C) % hc.P
        E = 3 * A % hc.P
        F = E * E % hc.P
        X3 = (F - 2 * D) % hc.P
        Y3 = (E * (D - X3) - 8 * C) % hc.P
        Z3 = 2 * Y * Z % hc.P
        return (X3, Y3, Z3)

    def jadd_affine(p, q):
        if q is None:
            return p
        X1, Y1, Z1 = p
        if Z1 == 0:
            return (q[0], q[1], 1)
        x2, y2 = q
        Z1Z1 = Z1 * Z1 % hc.P
        U2 = x2 * Z1Z1 % hc.P
        S2 = y2 * Z1 * Z1Z1 % hc.P
        if U2 == X1 and S2 == Y1:
            return jdouble(p)
        H = (U2 - X1) % hc.P
        HH = H * H % hc.P
        I = 4 * HH % hc.P
        J = H * I % hc.P
        rr = 2 * (S2 - Y1) % hc.P
        V = X1 * I % hc.P
        X3 = (rr * rr - J - 2 * V) % hc.P
        Y3 = (rr * (V - X3) - 2 * Y1 * J) % hc.P
        Z3 = (Z1 + H) ** 2 - Z1Z1 - HH
        return (X3, Y3, Z3 % hc.P)

    out = []
    for s in scalars:
        acc = (0, 1, 0)
        add = base
        k = s % R
        while k:
            if k & 1:
                acc = jadd_affine(acc, add)
            add = hc.g1_double(add)
            k >>= 1
        out.append(acc)
    # batch-normalize
    from ..ops.hostfield import batch_invert
    zs = [p[2] for p in out]
    zinvs = batch_invert(zs, hc.P)
    affine = []
    for (X, Y, Z), zi in zip(out, zinvs):
        if Z == 0:
            affine.append(None)
        else:
            zi2 = zi * zi % hc.P
            affine.append((X * zi2 % hc.P, Y * zi2 % hc.P * zi % hc.P))
    return affine


def generate_srs(k: int, seed: bytes = b"halo2-verifier-tpu-test-srs") -> FullSRS:
    """Deterministic test SRS; lagrange bases via the closed form
    L_i(s) = (s^n - 1)/n * omega^i / (s - omega^i) (kzg/commitment.rs:84-100)."""
    n = 1 << k
    s = int.from_bytes(hashlib.blake2b(seed + bytes([k])).digest(), "little") % R
    powers = [1] * n
    for i in range(1, n):
        powers[i] = powers[i - 1] * s % R
    g = _jacobian_scale_chain(G1_GEN, powers)

    root = FR_ROOT_OF_UNITY
    for _ in range(k, FR_S):
        root = root * root % R
    n_inv = pow(n, -1, R)
    multiplier = (pow(s, n, R) - 1) * n_inv % R
    from ..ops.hostfield import batch_invert
    root_pows = [1] * n
    for i in range(1, n):
        root_pows[i] = root_pows[i - 1] * root % R
    denoms = batch_invert([(s - rp) % R for rp in root_pows], R)
    lag_scalars = [multiplier * rp % R * d % R for rp, d in zip(root_pows, denoms)]
    g_lagrange = _jacobian_scale_chain(G1_GEN, lag_scalars)

    g2 = G2_GEN
    s_g2 = hc.g2_mul(G2_GEN, s)
    return FullSRS(k, g, g_lagrange, g2, s_g2)


_SRS_CACHE: dict[int, FullSRS] = {}


def load_srs(k: int, cache_dir: str | None = None) -> FullSRS:
    """Load the reference k=8 fixture, a cached file, or generate."""
    if k in _SRS_CACHE:
        return _SRS_CACHE[k]
    candidates = []
    if k == 8 and os.path.exists(REFERENCE_SRS_K8):
        candidates.append(REFERENCE_SRS_K8)
    if cache_dir:
        candidates.append(os.path.join(cache_dir, f"kzg_bn254_{k}.srs"))
    candidates.append(
        os.path.join(os.path.dirname(__file__), "..", "..", "params",
                     f"kzg_bn254_{k}.srs")
    )
    srs = None
    for path in candidates:
        if os.path.exists(path):
            with open(path, "rb") as f:
                srs = FullSRS.from_bytes(f.read())
            break
    if srs is None:
        srs = generate_srs(k)
        path = candidates[-1]
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(srs.to_bytes())
    _SRS_CACHE[k] = srs
    return srs
