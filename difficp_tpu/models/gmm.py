"""Gaussian Mixture Model with uniform isotropic covariances — functional EM.

Re-design of the reference ``GaussianMixtureUnif`` (reference
diffICP/core/GMM.py:40-529) as a pure pytree state + jitted step functions:

- State: centroids ``mu`` (C, D), component log-scores ``w`` (C,), a single
  isotropic std ``sigma``, and (optionally) an outlier component encoded by
  log-odds-ratio ``eta0`` against a uniform density 1/vol0 on a reference
  volume ``vol0`` (GMM.py:56-64, 97-103).
- All formulas in log domain exactly as the reference: E step
  (GMM.py:263-282 / 402-428), M step (GMM.py:286-299 / 432-458), quadratic
  targets Y and free-energy offset Cfe (GMM.py:301-323 / 475-496).
- TPU-native: data points are padded to static shape with a ``mask``
  (1 = real point); a masked point contributes exactly zero to every sum
  (responsibility-weighted statistics, Cfe, FE).  This replaces the
  reference's ragged-concatenation of frames (PSR.py:248).
- ``em_step``/``em_optimization`` are pure and jittable (``lax.while_loop``
  on the free-energy tolerance, GMM.py:330-357).

The per-point computations here are also the "sharding unit": to run EM on
points sharded across devices, compute the same per-point terms locally and
``psum`` the sufficient statistics (see difficp_tpu/parallel/atlas.py).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from difficp_tpu.ops.reductions import second_min_sqdist


class GMMConfig(NamedTuple):
    """Static configuration (hashable; controls compiled code paths)."""
    use_outliers: bool = False
    optimize_mu: bool = True
    optimize_sigma: bool = True
    optimize_w: bool = True
    optimize_eta0: bool = True
    ensure_continuum: bool = False  # experimental floor sigma >= intrinsic_scale(mu)


class GMMState(NamedTuple):
    """Differentiable pytree state of the mixture."""
    mu: jax.Array      # (C, D) centroids
    w: jax.Array       # (C,)  component log-scores; pi = softmax(w)
    sigma: jax.Array   # ()    isotropic std
    eta0: jax.Array    # ()    outlier log-odds-ratio (unused if no outliers)
    vol0: jax.Array    # ()    outlier reference volume (0 = not yet set)


def create(mu, sigma=None, use_outliers: bool = False) -> tuple[GMMState, GMMConfig]:
    """Build a GMM state from initial centroids.

    ``sigma=None`` uses the reference's ad hoc initialization: 0.1 x the
    typical per-centroid radius (GMM.py:84-88).
    """
    mu = jnp.asarray(mu)
    c, d = mu.shape
    if sigma is None:
        r = float(jnp.sqrt(mu.var(axis=0).sum()))
        sigma = max(0.1 * (r / c ** (1.0 / d)), 1e-6)
    state = GMMState(
        mu=mu,
        w=jnp.zeros((c,), mu.dtype),
        sigma=jnp.asarray(sigma, mu.dtype),
        eta0=jnp.asarray(0.0, mu.dtype),
        vol0=jnp.asarray(0.0, mu.dtype),
    )
    return state, GMMConfig(use_outliers=use_outliers)


def fix(cfg: GMMConfig) -> GMMConfig:
    """Config with every parameter frozen (reference GMM.fix(), GMM.py:148-159)."""
    return cfg._replace(
        optimize_mu=False, optimize_sigma=False, optimize_w=False, optimize_eta0=False
    )


def bbox_volume(x, mask=None):
    """Bounding-box volume of (masked) points, the outlier reference volume
    vol0 (GMM.py:163-171)."""
    if mask is None:
        lo, hi = x.min(axis=0), x.max(axis=0)
    else:
        big = jnp.where(mask[:, None] > 0, x, jnp.inf)
        small = jnp.where(mask[:, None] > 0, x, -jnp.inf)
        lo, hi = big.min(axis=0), small.max(axis=0)
    return jnp.prod(hi - lo)


def set_vol0(state: GMMState, x, mask=None) -> GMMState:
    return state._replace(vol0=bbox_volume(x, mask))


def log_ratio_to_proba(eta):
    """(log p, log q) from a Bernoulli log-odds-ratio eta = log(p/q).
    (GMM.py:205-217)"""
    z = jnp.logaddexp(0.0, eta)  # log(1 + exp(eta))
    return eta - z, -z


def _log_gauss_norm(sigma, d):
    return d * (jnp.log(sigma) + 0.5 * math.log(2.0 * math.pi))


def log_responsibilities(state: GMMState, x):
    """lgamma_nc (N, C), without outliers (GMM.py:221-232)."""
    d2 = jnp.sum((x[:, None, :] - state.mu[None, :, :]) ** 2, axis=-1)
    t = state.w[None, :] - d2 / (2.0 * state.sigma**2)
    return jax.nn.log_softmax(t, axis=1)


class EMStepOut(NamedTuple):
    state: GMMState
    y: jax.Array    # (N, D) quadratic targets
    cfe: jax.Array  # ()  free-energy offset
    fe: jax.Array   # ()  free energy


def em_step(
    state: GMMState,
    x: jax.Array,
    mask: Optional[jax.Array],
    cfg: GMMConfig,
    skip_m: bool = False,
) -> EMStepOut:
    """One (E step, M step) alternation + EM values Y / Cfe / FE.

    Exact formula-for-formula port of the reference EM (GMM.py:236-325 for
    the math; post-M values use the *updated* parameters as in the keops
    variant GMM.py:462-496).  ``skip_m=True`` computes values only
    (GMM.py:247: used to initialize targets without touching parameters).
    """
    n_pts, d = x.shape
    if mask is None:
        mask = jnp.ones((n_pts,), x.dtype)
    n_eff = jnp.sum(mask)

    dtype = x.dtype
    d2 = jnp.sum((x[:, None, :] - state.mu[None, :, :]) ** 2, axis=-1)  # (N,C)

    ### E step (old parameters)
    log_norm = _log_gauss_norm(state.sigma, d)
    zw = jax.scipy.special.logsumexp(state.w)
    t_nc = state.w[None, :] - zw - d2 / (2.0 * state.sigma**2) - log_norm
    t_n = jax.scipy.special.logsumexp(t_nc, axis=1)  # total component score
    lgam = t_nc - t_n[:, None]
    gam = jnp.exp(lgam)

    if cfg.use_outliers:
        log_j0 = -jnp.log(state.vol0)
        eta0_n = state.eta0 + log_j0 - t_n
        lgam0_n, lgamt_n = log_ratio_to_proba(eta0_n)
        gamt_n = jnp.exp(lgamt_n)   # 1 - outlier responsibility
        gam0_n = jnp.exp(lgam0_n)
    else:
        gamt_n = jnp.ones((n_pts,), dtype)

    # masked log-weights for n-sums in log domain
    neg_inf = jnp.asarray(-jnp.inf, dtype)
    lmask = jnp.where(mask > 0, 0.0, neg_inf)

    ### M step
    new = state
    if not skip_m:
        if cfg.optimize_mu:
            # mu_c = sum_n m gamma_nc x_n / sum_n m gamma_nc (GMM.py:286-287)
            gm = gam * mask[:, None]
            denom = jnp.sum(gm, axis=0)
            mu = (gm.T @ x) / jnp.maximum(denom, 1e-30)[:, None]
            new = new._replace(mu=mu)
        if cfg.use_outliers and cfg.optimize_eta0:
            s0 = jax.scipy.special.logsumexp(lgam0_n + lmask)
            st = jax.scipy.special.logsumexp(lgamt_n + lmask)
            new = new._replace(eta0=s0 - st)
        if cfg.optimize_w:
            # w_c = log sum_n m gamma_nc (GMM.py:292-293)
            w = jax.scipy.special.logsumexp(lgam + lmask[:, None], axis=0)
            new = new._replace(w=w)
        if cfg.optimize_sigma:
            nd_sigma2 = jnp.sum(gam * d2 * mask[:, None])
            sigma = jnp.sqrt(nd_sigma2 / (d * n_eff))
            if cfg.ensure_continuum:
                intr = jnp.sqrt(jnp.mean(second_min_sqdist(new.mu)))
                sigma = jnp.maximum(sigma, intr)
            new = new._replace(sigma=sigma)

    ### EM values with (possibly) updated parameters (GMM.py:462-496)
    y = gam @ new.mu  # quadratic targets y_n = sum_c gamma_nc mu_c
    lpi = new.w - jax.scipy.special.logsumexp(new.w)
    log_norm_new = _log_gauss_norm(new.sigma, d)
    # Cfe_n = sum_c gamma_nc [ (|mu_c|^2 - |y_n|^2)/2sig^2 + lgam_nc - lpi_c ]
    #         + loggaussnorm                                    (GMM.py:305-314)
    mu_sq = jnp.sum(new.mu**2, axis=-1)
    y_sq = jnp.sum(y**2, axis=-1)
    inner = (mu_sq[None, :] - y_sq[:, None]) / (2.0 * new.sigma**2) + lgam - lpi[None, :]
    # gamma * lgam -> 0 when gamma == 0 (guard 0 * -inf)
    inner = jnp.where(gam > 0, inner, 0.0)
    cfe_n = jnp.sum(gam * inner, axis=1) + log_norm_new

    if cfg.use_outliers:
        lpi0, lpit = log_ratio_to_proba(new.eta0)
        log_j0 = -jnp.log(state.vol0)
        cfe = jnp.sum(
            mask
            * (
                gamt_n * (cfe_n + lgamt_n - lpit)
                + gam0_n * (-log_j0 + lgam0_n - lpi0)
            )
        )
    else:
        cfe = jnp.sum(mask * cfe_n)

    quad = jnp.sum(mask * gamt_n * jnp.sum((x - y) ** 2, axis=-1)) / (
        2.0 * new.sigma**2
    )
    fe = cfe + quad
    return EMStepOut(state=new, y=y, cfe=cfe, fe=fe)


class EMOptOut(NamedTuple):
    state: GMMState
    y: jax.Array
    cfe: jax.Array
    fe: jax.Array
    n_iters: jax.Array


def em_optimization(
    state: GMMState,
    x: jax.Array,
    mask: Optional[jax.Array],
    cfg: GMMConfig,
    max_iterations: int = 100,
    tol: float = 1e-5,
) -> EMOptOut:
    """Iterated EM to free-energy tolerance (GMM.py:330-357), as a
    ``lax.while_loop`` (jittable)."""
    if mask is None:
        mask = jnp.ones((x.shape[0],), x.dtype)

    def cond(carry):
        st, y, cfe, fe, last_fe, i = carry
        not_converged = jnp.abs(fe - last_fe) >= tol * jnp.abs(last_fe)
        return jnp.logical_and(i < max_iterations, jnp.logical_or(i < 2, not_converged))

    def body(carry):
        st, y, cfe, fe, last_fe, i = carry
        out = em_step(st, x, mask, cfg)
        return (out.state, out.y, out.cfe, out.fe, fe, i + 1)

    y0 = jnp.zeros_like(x)
    zero = jnp.asarray(0.0, x.dtype)
    carry = (state, y0, zero, jnp.asarray(jnp.inf, x.dtype), zero, jnp.asarray(0))
    st, y, cfe, fe, _, i = jax.lax.while_loop(cond, body, carry)
    return EMOptOut(state=st, y=y, cfe=cfe, fe=fe, n_iters=i)


def fit(
    x,
    c: int,
    key,
    mask=None,
    fixed_sigma: Optional[float] = None,
    optimize_w: bool = False,
    use_outliers: bool = False,
    max_iterations: int = 100,
    tol: float = 1e-5,
):
    """Convenience fit: GMM with C components initialized from C random data
    points then EM-optimized (reference get_GMM_model, GMM.py:361-383)."""
    x = jnp.asarray(x)
    if mask is None:
        idx = jax.random.randint(key, (c,), 0, x.shape[0])
    else:
        probs = mask / mask.sum()
        idx = jax.random.choice(key, x.shape[0], (c,), p=probs)
    state, cfg = create(x[idx], use_outliers=use_outliers)
    cfg = cfg._replace(optimize_w=optimize_w)
    if fixed_sigma is not None:
        cfg = cfg._replace(optimize_sigma=False)
        if fixed_sigma > 0:
            state = state._replace(sigma=jnp.asarray(fixed_sigma, x.dtype))
    if use_outliers:
        state = set_vol0(state, x, mask)
    out = em_optimization(state, x, mask, cfg, max_iterations, tol)
    return out.state, cfg


# ---------------------------------------------------------------------------
# Sampling and likelihoods (GMM.py:543-550, 694-721, 729-735)
# ---------------------------------------------------------------------------

def sample(state: GMMState, key, n: int):
    """N points drawn from the mixture (no outlier term), GMM.py:543-550."""
    kc, kn = jax.random.split(key)
    comps = jax.random.categorical(kc, state.w, shape=(n,))
    noise = state.sigma * jax.random.normal(kn, (n, state.mu.shape[1]), state.mu.dtype)
    return state.mu[comps] + noise


def log_likelihoods(state: GMMState, x):
    """Per-point log-density under the mixture (GMM.py:714-721).

    Note: correctly normalized, i.e. log sum_c pi_c N(mu_c, sigma^2 I)(x).
    (The reference carries an extra 1/sigma^D factor inherited from the KeOps
    tutorial's ``weights()``; it only affects plots and symm_kl_div there.)
    """
    d2 = jnp.sum((x[:, None, :] - state.mu[None, :, :]) ** 2, axis=-1)
    lpi = jax.nn.log_softmax(state.w)
    return jax.scipy.special.logsumexp(
        lpi[None, :] - d2 / (2 * state.sigma**2), axis=1
    ) - _log_gauss_norm(state.sigma, x.shape[1])


def likelihoods(state: GMMState, x):
    return jnp.exp(log_likelihoods(state, x))


def symm_kl_div(state_x: GMMState, state_y: GMMState, key, n_sample: int = 1000):
    """Monte-Carlo symmetric KL divergence between two GMMs (GMM.py:729-735)."""
    kx, ky = jax.random.split(key)
    xs = sample(state_x, kx, n_sample)
    ys = sample(state_y, ky, n_sample)
    kl_xy = jnp.mean(log_likelihoods(state_x, xs) - log_likelihoods(state_y, xs))
    kl_yx = jnp.mean(log_likelihoods(state_y, ys) - log_likelihoods(state_x, ys))
    return kl_xy + kl_yx
