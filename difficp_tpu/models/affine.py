"""Affine registration model (rigid / similarity / general affine /
translation) with optional logdet term — closed-form weighted fits.

Re-design of the reference ``AffineModel`` (reference diffICP/core/affine.py:21-172).
The registration energy is

    E(M, t) = sum_n z_n |M x_n + t - y_n|^2 - sum_n w_n log |M|

minimized in closed form per version (affine.py:100-166): SVD Procrustes with
determinant correction for rigid/similarity, linear solve or
complete-the-square + Cholesky + SVD for general affine with logdet.

TPU notes: all fits are pure jnp (jit/vmap-friendly — the per-frame affine
fits of an atlas run batched).  Masked points enter with zero weights z/w.
The continuous "shooting" trajectory interpolation uses the matrix logarithm
(reference affine.py:50-71 uses scipy.linalg.logm on CPU); it is a
visualization-only path, computed host-side via scipy exactly like the
reference.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class AffineConfig(NamedTuple):
    version: str = "rigid"  # rigid | similarity | general_affine | translation
    withlogdet: bool = True
    with_t: bool = True
    nt: int = 10


class AffineFit(NamedTuple):
    m: jax.Array       # (D, D)
    t: jax.Array       # (D,)
    tx: jax.Array      # (N, D) transformed points
    datal: jax.Array   # () quadratic data loss
    regl: jax.Array    # () logdet regularization loss


def regloss(cfg: AffineConfig, m, w):
    """- sum(w) * logdet(M) if withlogdet (affine.py:76-80)."""
    if not cfg.withlogdet:
        return jnp.zeros((), m.dtype)
    sign, logabs = jnp.linalg.slogdet(m)
    return -jnp.sum(w) * logabs


def optimize(cfg: AffineConfig, x, y, z, w=None, mask=None) -> AffineFit:
    """Closed-form minimization of E(M, t) (affine.py:89-172).

    :param x: (N, D) data points; :param y: (N, D) targets.
    :param z: (N,) data weights; :param w: (N,) logdet weights (default 1).
    :param mask: (N,) padding mask folded into both weights.
    """
    d = x.shape[1]
    dtype = x.dtype
    if w is None:
        w = jnp.ones(x.shape[0], dtype)
    if mask is not None:
        z = z * mask
        w = w * mask

    if cfg.with_t:
        zsum = jnp.sum(z)
        xm = jnp.sum(x * z[:, None], axis=0) / zsum
        ym = jnp.sum(y * z[:, None], axis=0) / zsum
        xc, yc = x - xm, y - ym
    else:
        xc, yc = x, y

    # E = Tr(A M' M) - 2 Tr(B' M) - c log|M| + const  (affine.py:108-111)
    b = jnp.matmul(yc.T, z[:, None] * xc, precision="highest")
    c = jnp.sum(w)
    eye = jnp.eye(d, dtype=dtype)

    if cfg.version in ("rigid", "similarity"):
        u, _, vh = jnp.linalg.svd(b)
        corr = eye.at[-1, -1].set(jnp.linalg.det(u) * jnp.linalg.det(vh))
        r = u @ corr @ vh
        if cfg.version == "rigid":
            m = r
        else:
            tr_a = jnp.sum((xc**2).sum(-1) * z)
            tr_br = jnp.sum(b * r)
            if cfg.withlogdet:
                lam = (tr_br + jnp.sqrt(tr_br**2 + 2 * c * d * tr_a)) / (2 * tr_a)
            else:
                lam = tr_br / tr_a
            m = lam * r
    elif cfg.version == "general_affine":
        a = jnp.matmul(xc.T, z[:, None] * xc, precision="highest")
        if not cfg.withlogdet:
            # M = B A^{-1}
            m = jnp.linalg.solve(a.T, b.T).T
        else:
            # complete the square (affine.py:140-158)
            k = 0.5 * jnp.linalg.solve(a.T, b.T).T
            f = 0.5 * (b @ k.T + c * eye)
            f = 0.5 * (f + f.T)
            ar = jnp.linalg.cholesky(a)
            fr = jnp.linalg.cholesky(f)
            wmat = ar.T @ jnp.linalg.inv(b) @ fr
            u, _, vh = jnp.linalg.svd(wmat)
            q = (u @ vh).T
            m = k + fr @ q @ jnp.linalg.inv(ar)
    elif cfg.version == "translation":
        m = eye
    else:
        raise ValueError(f"unknown affine version: {cfg.version}")

    if cfg.with_t:
        t = ym - m @ xm
    else:
        t = jnp.zeros((d,), dtype)

    tx = jnp.matmul(x, m.T, precision="highest") + t[None, :]
    resid = ((y - tx) ** 2).sum(-1) * z
    datal = jnp.sum(resid)
    regl = regloss(cfg, m, w)
    return AffineFit(m=m, t=t, tx=tx, datal=datal, regl=regl)


def apply(m, t, x):
    """T(X) = X M' + t'."""
    return jnp.matmul(x, m.T, precision="highest") + t[None, :]


def backward(m, t, y):
    """Inverse transform: X with T(X) = Y (reference registrations.py:117-122).

    X M' = Y - t  =>  X = (Y - t) M^{-T}, i.e. solve M Z = (Y - t)^T.
    """
    return jnp.linalg.solve(m, (y - t[None, :]).T).T


def shoot(cfg: AffineConfig, m, t, x, nt: Optional[int] = None):
    """Continuous interpolation path of the affine map (affine.py:50-71).

    Around the invariant point p = (I - M)^{-1} t, positions at time u are
    p + (x - p) exp(u log M)'.  Host-side (scipy logm/expm, like the
    reference); returns a list of nt position arrays (numpy).
    Visualization-only path.
    """
    from scipy.linalg import expm, logm

    nt = cfg.nt if nt is None else nt
    m_np = np.asarray(m, np.float64)
    t_np = np.asarray(t, np.float64)
    x_np = np.asarray(x, np.float64)
    d = m_np.shape[0]
    ts = np.linspace(0.0, 1.0, nt)
    if np.allclose(m_np, np.eye(d)):
        return [x_np + u * t_np[None, :] for u in ts]
    p = np.linalg.solve(np.eye(d) - m_np, t_np)
    log_m = logm(m_np, disp=False)[0].real
    out = []
    for u in ts:
        mu = expm(u * log_m).T
        out.append(p[None, :] + (x_np - p[None, :]) @ mu)
    return out


def skew_log(m):
    """Host-side skew-symmetric part of log(M) — the rigid-motion
    parametrization used by the standard algorithm's iterative affine fit
    (reference PSR_standard.py:653-666)."""
    from scipy.linalg import logm

    lm = logm(np.asarray(m, np.float64), disp=False)[0].real
    return ((lm - lm.T) / 2).astype(np.float32)
