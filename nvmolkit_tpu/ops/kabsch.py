"""Batched Kabsch-optimal RMSD.

TPU-native redesign of the reference's conformer RMSD kernel
(``src/conformer_rmsd.cu``: one CUDA block per conformer pair, CUB
block reductions + a closed-form 3x3 solve by thread 0). Two
formulations:

* :func:`batched_kabsch_rmsd` — explicit pair stacks [P, N, 3]
  (used by embed pruning, where the pair list is sparse).
* :func:`conformer_rms_matrices` — the all-pairs form: ONE Gram
  matmul ``[C*3, A] @ [A, C*3]`` per molecule yields every pairwise
  3x3 cross-covariance at once (the [M, C, C, 3, 3] blocks of the
  Gram matrix), so only the C conformers — not the C^2/2 pair stacks
  — are transferred and touched. This is the MXU-native shape of the
  problem.

The optimal-superposition trace max_R tr(R H) comes from the QCP
quaternion characteristic polynomial (Theobald, Acta Cryst. A61, 2005:
the largest eigenvalue of the 4x4 quaternion key matrix solves
P(l) = l^4 + C2 l^2 + C1 l + C0 = 0; Newton from l0 = (Ga+Gb)/2
converges monotonically from above). Fully elementwise — no SVD, no
QR panels, no scoped-vmem pressure at any batch size — and better
f32-conditioned than eigendecomposing H^T H (which halves the digits).
Covariance matmuls run at Precision.HIGHEST: the trace term cancels
against tr(P'P) + tr(Q'Q), so TPU default-bf16 passes are not enough.

    rmsd^2 = (tr(P'P) + tr(Q'Q) - 2 max_R tr(R H)) / N
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _qcp_max_eig(h: jnp.ndarray, e0: jnp.ndarray) -> jnp.ndarray:
    """Largest eigenvalue of the QCP 4x4 key matrix for cross-covariance
    blocks ``h`` [..., 3, 3] — equals max_R tr(R h) (the signed
    singular-value sum). ``e0 = (Ga+Gb)/2`` upper-bounds it and seeds
    Newton on the quartic characteristic polynomial."""
    sxx, sxy, sxz = h[..., 0, 0], h[..., 0, 1], h[..., 0, 2]
    syx, syy, syz = h[..., 1, 0], h[..., 1, 1], h[..., 1, 2]
    szx, szy, szz = h[..., 2, 0], h[..., 2, 1], h[..., 2, 2]

    sxx2, sxy2, sxz2 = sxx * sxx, sxy * sxy, sxz * sxz
    syx2, syy2, syz2 = syx * syx, syy * syy, syz * syz
    szx2, szy2, szz2 = szx * szx, szy * szy, szz * szz

    c2 = -2.0 * (sxx2 + sxy2 + sxz2 + syx2 + syy2 + syz2 + szx2 + szy2 + szz2)
    c1 = 8.0 * (
        sxx * syz * szy + syy * szx * sxz + szz * sxy * syx
        - sxx * syy * szz - syz * szx * sxy - szy * syx * sxz
    )

    sxz_p_szx, sxz_m_szx = sxz + szx, sxz - szx
    syz_p_szy, syz_m_szy = syz + szy, syz - szy
    sxy_p_syx, sxy_m_syx = sxy + syx, sxy - syx
    sxx_p_syy, sxx_m_syy = sxx + syy, sxx - syy
    d1 = syy2 + szz2 - sxx2 + syz2 + szy2
    d2 = 2.0 * (syz * szy - syy * szz)
    t0 = sxy2 + sxz2 - syx2 - szx2
    c0 = (
        t0 * t0
        + (d1 + d2) * (d1 - d2)
        + (-(sxz_p_szx) * syz_m_szy + sxy_m_syx * (sxx_m_syy - szz))
        * (-(sxz_m_szx) * syz_p_szy + sxy_m_syx * (sxx_m_syy + szz))
        + (-(sxz_p_szx) * syz_p_szy - sxy_p_syx * (sxx_p_syy - szz))
        * (-(sxz_m_szx) * syz_m_szy - sxy_p_syx * (sxx_p_syy + szz))
        + (sxy_p_syx * syz_p_szy + sxz_p_szx * (sxx_m_syy + szz))
        * (-(sxy_m_syx) * syz_m_szy + sxz_p_szx * (sxx_p_syy + szz))
        + (sxy_p_syx * syz_m_szy + sxz_m_szx * (sxx_m_syy - szz))
        * (-(sxy_m_syx) * syz_p_szy + sxz_m_szx * (sxx_p_syy - szz))
    )

    def newton(_, lam):
        x2 = lam * lam
        b = (x2 + c2) * lam
        a = b + c1
        dp = 2.0 * x2 * lam + b + a  # P'(lam)
        safe = jnp.where(jnp.abs(dp) > 0.0, dp, 1.0)
        return lam - (a * lam + c0) / safe

    return jax.lax.fori_loop(0, 12, newton, e0)


@functools.partial(jax.jit, static_argnames=())
def batched_kabsch_rmsd(
    pos_a: jnp.ndarray,   # [P, N, 3]
    pos_b: jnp.ndarray,   # [P, N, 3]
    mask: jnp.ndarray,    # [P, N] bool (atoms used for alignment+RMSD)
) -> jnp.ndarray:
    """Optimal-superposition RMSD per pair -> [P]."""
    w = mask.astype(pos_a.dtype)[..., None]
    n = jnp.maximum(jnp.sum(w, axis=(1, 2)), 1.0)  # [P] (counts per pair)
    ca = jnp.sum(pos_a * w, axis=1) / n[:, None]
    cb = jnp.sum(pos_b * w, axis=1) / n[:, None]
    pa = (pos_a - ca[:, None, :]) * w
    pb = (pos_b - cb[:, None, :]) * w
    # cross covariance [P, 3, 3]
    h = jnp.einsum("pni,pnj->pij", pa, pb,
                   precision=jax.lax.Precision.HIGHEST)
    e0 = 0.5 * (jnp.sum(pa * pa, axis=(1, 2)) + jnp.sum(pb * pb, axis=(1, 2)))
    trace = _qcp_max_eig(h, e0)
    return jnp.sqrt(jnp.maximum(2.0 * (e0 - trace), 0.0) / n)


@functools.partial(jax.jit, static_argnames=("prealigned",))
def conformer_rms_matrices(
    confs: jnp.ndarray,   # [M, C, A, 3] zero-padded conformer stacks
    mask: jnp.ndarray,    # [M, A] bool (atoms used, per molecule)
    prealigned: bool = False,
) -> jnp.ndarray:
    """Full symmetric RMSD matrices [M, C, C] over every conformer
    pair of every molecule. Zero-padded conformers / atoms contribute
    zero blocks; the caller slices out the valid triangle."""
    f = confs.dtype
    w = mask.astype(f)[:, None, :, None]                     # [M,1,A,1]
    n = jnp.maximum(jnp.sum(mask.astype(f), axis=-1), 1.0)   # [M]
    if prealigned:
        xm = confs * w
        g = jnp.sum(xm * confs, axis=(2, 3))                 # [M, C]
        dots = jnp.einsum("mcax,mdax->mcd", xm, confs,
                          precision=jax.lax.Precision.HIGHEST)
        sq = g[:, :, None] + g[:, None, :] - 2.0 * dots
        return jnp.sqrt(jnp.maximum(sq, 0.0) / n[:, None, None])
    cent = jnp.sum(confs * w, axis=2) / n[:, None, None]     # [M, C, 3]
    xc = (confs - cent[:, :, None, :]) * w                   # [M, C, A, 3]
    m_, c_, a_, _ = xc.shape
    x = xc.transpose(0, 1, 3, 2).reshape(m_, c_ * 3, a_)     # [M, C*3, A]
    gram = jnp.einsum("mia,mja->mij", x, x,
                      precision=jax.lax.Precision.HIGHEST)  # [M, C*3, C*3]
    h = gram.reshape(m_, c_, 3, c_, 3).transpose(0, 1, 3, 2, 4)
    g = jnp.sum(xc * xc, axis=(2, 3))                        # [M, C]
    e0 = 0.5 * (g[:, :, None] + g[:, None, :])               # [M, C, C]
    trace = _qcp_max_eig(h, e0)
    return jnp.sqrt(jnp.maximum(2.0 * (e0 - trace), 0.0) / n[:, None, None])


@functools.partial(jax.jit, static_argnames=())
def plain_rmsd(pos_a, pos_b, mask) -> jnp.ndarray:
    """RMSD without alignment (prealigned conformers)."""
    w = mask.astype(pos_a.dtype)[..., None]
    n = jnp.maximum(jnp.sum(w, axis=(1, 2)), 1.0)
    d = (pos_a - pos_b) * w
    return jnp.sqrt(jnp.sum(d * d, axis=(1, 2)) / n)
