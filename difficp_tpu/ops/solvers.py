"""Linear-algebra helpers: SVD pseudo-powers and RKHS kernel solves.

TPU-native equivalents of the reference's numpy/torch linear solves:
``SVDpow`` (kernel.py:31-44), ``KpinvSolve`` (kernel.py:227-232, numpy lstsq
with rcond) and ``KridgeSolve`` (kernel.py:234-242).  These ill-conditioned
solves only run at setup time (momenta initialization / projection,
LDDMM.py:235-253), so they use jnp.linalg on whatever backend is active.

Masked convention: padded support rows are replaced by identity rows in the
kernel matrix and zeroed right-hand sides, so solutions carry exact zeros in
padded slots.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def svd_pow(m: jax.Array, alpha: float, rcond: float | None = None) -> jax.Array:
    """SVD-based (pseudo-)power of a hermitian matrix: m ** alpha.

    With ``rcond``, singular values below rcond * s_max are dropped (crucial
    when alpha < 0).  (reference kernel.py:31-44)
    """
    u, s, vh = jnp.linalg.svd(m)
    if rcond is not None:
        keep = s > rcond * s[0]
        # static-shape variant of the reference's row-drop: zero the
        # contribution of discarded singular directions.
        spow = jnp.where(keep, jnp.where(keep, s, 1.0) ** alpha, 0.0)
    else:
        spow = s**alpha
    return (u * spow[None, :]) @ vh


def _masked_gram(q, sigma, mask=None, diag_boost=0.0):
    d2 = jnp.sum((q[:, None, :] - q[None, :, :]) ** 2, axis=-1)
    k = jnp.exp(-d2 / (2.0 * sigma**2))
    n = q.shape[0]
    eye = jnp.eye(n, dtype=q.dtype)
    if mask is not None:
        mm = mask[:, None] * mask[None, :]
        k = k * mm + (1.0 - mask)[:, None] * eye  # identity rows for padding
    if diag_boost:
        k = k + diag_boost * eye
    return k


def kpinv_solve(q, v, sigma, rcond=None, mask=None):
    """Least-squares solve of K(q,q) b = v via SVD pseudo-inverse with
    relative cutoff rcond (reference KpinvSolve, kernel.py:227-232)."""
    k = _masked_gram(q, sigma, mask)
    if mask is not None:
        v = v * mask[:, None]
    u, s, vh = jnp.linalg.svd(k)
    if rcond is None:
        cutoff = jnp.finfo(k.dtype).eps * max(k.shape) * s[0]
    else:
        cutoff = rcond * s[0]
    sinv = jnp.where(s > cutoff, 1.0 / jnp.where(s > cutoff, s, 1.0), 0.0)
    sol = vh.T @ (sinv[:, None] * (u.T @ v))
    if mask is not None:
        sol = sol * mask[:, None]
    return sol


def kridge_solve(q, v, sigma, alpha=1e-4, mask=None):
    """Ridge solve (K + alpha I) b = v (reference KridgeSolve, kernel.py:234-242)."""
    k = _masked_gram(q, sigma, mask, diag_boost=alpha)
    if mask is not None:
        v = v * mask[:, None]
    sol = jnp.linalg.solve(k, v)
    if mask is not None:
        sol = sol * mask[:, None]
    return sol


def rff_gaussian_field(q, sigma, key, n_cols, n_features=2048):
    """Draw f of shape (M, n_cols): each column an independent sample of a
    Gaussian field with Cov(f_i, f_j) ~= K_ij = exp(-|q_i - q_j|^2 / 2 sigma^2)
    — random Fourier features (Rahimi & Recht 2007), O(M * F) compute and
    memory, never materializing the (M, M) Gram matrix.

    Bochner: K(x, y) = E_w[cos(w . (x - y))] with w ~ N(0, I / sigma^2);
    phi_f(x) = sqrt(2/F) cos(w_f . x + b_f), b ~ U[0, 2 pi), gives
    E_{w,b}[phi(x) . phi(y)] = K(x, y), so f = Phi @ gamma with
    gamma ~ N(0, I_F) has covariance Phi Phi^T whose expectation is K.
    The approximation error is O(1 / sqrt(n_features)) in each entry."""
    m, d = q.shape
    kw, kb, kg = jax.random.split(key, 3)
    w = jax.random.normal(kw, (n_features, d), q.dtype) / sigma
    b = jax.random.uniform(kb, (n_features,), q.dtype, 0.0, 2.0 * jnp.pi)
    gamma = jax.random.normal(kg, (n_features, n_cols), q.dtype)
    phi = jnp.sqrt(2.0 / n_features) * jnp.cos(q @ w.T + b[None, :])
    return phi @ gamma


def kridge_solve_cg(q, v, sigma, alpha=1e-4, mask=None, tol=1e-6,
                    maxiter=500, tile=1024):
    """Matrix-free ridge solve (K + alpha I) b = v via conjugate gradients
    with a blockwise kernel matvec — the large-M path where the dense Gram
    matrix cannot exist (the solves the reference does with numpy lstsq /
    torch solve, kernel.py:227-242, capped at small M there too).

    K is PSD and alpha > 0 makes the system SPD, so plain CG converges;
    the matvec rides the dispatched kernel-sum (pallas payload-matmul on
    TPU, blockwise scan elsewhere; O(M) memory either way)."""
    from difficp_tpu.ops import backend as _red

    if mask is not None:
        v = v * mask[:, None]

    def matvec(b):
        out = _red.kred(
            q, q, b if mask is None else b * mask[:, None], sigma, mask
        )
        if mask is not None:
            # identity rows for padded slots (same convention as _masked_gram)
            out = mask[:, None] * out + (1.0 - mask)[:, None] * b
        return out + alpha * b

    sol, _ = jax.scipy.sparse.linalg.cg(
        matvec, v, tol=tol, maxiter=maxiter
    )
    if mask is not None:
        sol = sol * mask[:, None]
    return sol
