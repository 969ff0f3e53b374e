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
    gamt: jax.Array  # (N,) inlier responsibility 1-gamma0 (all ones without
    #                  outliers) — the weight of each point's quadratic term
    #                  in F (GMM.py:323).  The reference's PSR-level
    #                  bookkeeping drops this weight (PSR.py:222), making its
    #                  outlier-case free energy inconsistent; we keep it.


class EStepOut(NamedTuple):
    """Per-point E-step values (local to a shard)."""
    lgam: jax.Array    # (N, C) log-responsibilities (GMM only)
    gam: jax.Array     # (N, C)
    d2: jax.Array      # (N, C) squared distances to centroids
    lgam0: jax.Array   # (N,) outlier log-responsibility (zeros if unused)
    lgamt: jax.Array   # (N,) log(1 - gamma0)
    gamt: jax.Array    # (N,)


class MStats(NamedTuple):
    """Sufficient statistics for the M step — everything the update needs is
    a sum over points, so sharded EM just psums this pytree
    (SURVEY §3.3 distribution note)."""
    s_gam: jax.Array    # (C,)   sum_n m gamma_nc
    s_gx: jax.Array     # (C, D) sum_n m gamma_nc x_n
    s_gd2: jax.Array    # ()     sum_n m sum_c gamma_nc D2_nc
    s_g0: jax.Array     # ()     sum_n m gamma0_n
    s_gt: jax.Array     # ()     sum_n m gammaT_n
    n_eff: jax.Array    # ()     sum_n m


def _e_step(state: GMMState, x, mask, cfg: GMMConfig) -> EStepOut:
    """E step with old parameters (GMM.py:263-282)."""
    n_pts, d = x.shape
    dtype = x.dtype
    d2 = jnp.sum((x[:, None, :] - state.mu[None, :, :]) ** 2, axis=-1)  # (N,C)
    log_norm = _log_gauss_norm(state.sigma, d)
    zw = jax.scipy.special.logsumexp(state.w)
    t_nc = state.w[None, :] - zw - d2 / (2.0 * state.sigma**2) - log_norm
    t_n = jax.scipy.special.logsumexp(t_nc, axis=1)  # total component score
    lgam = t_nc - t_n[:, None]
    gam = jnp.exp(lgam)
    if cfg.use_outliers:
        log_j0 = -jnp.log(state.vol0)
        eta0_n = state.eta0 + log_j0 - t_n
        lgam0, lgamt = log_ratio_to_proba(eta0_n)
        gamt = jnp.exp(lgamt)
    else:
        lgam0 = jnp.zeros((n_pts,), dtype)
        lgamt = jnp.zeros((n_pts,), dtype)
        gamt = jnp.ones((n_pts,), dtype)
    return EStepOut(lgam=lgam, gam=gam, d2=d2, lgam0=lgam0, lgamt=lgamt, gamt=gamt)


def _m_stats(e: EStepOut, x, mask) -> MStats:
    """Responsibility-weighted sufficient statistics (local sums)."""
    gm = e.gam * mask[:, None]
    return MStats(
        s_gam=jnp.sum(gm, axis=0),
        s_gx=jnp.matmul(gm.T, x, precision="highest"),
        s_gd2=jnp.sum(gm * e.d2),
        s_g0=jnp.sum(mask * jnp.exp(e.lgam0)),
        s_gt=jnp.sum(mask * e.gamt),
        n_eff=jnp.sum(mask),
    )


def _apply_stats(state: GMMState, stats: MStats, cfg: GMMConfig, d: int) -> GMMState:
    """M step from (possibly psum-reduced) sufficient statistics
    (GMM.py:286-299)."""
    new = state
    if cfg.optimize_mu:
        new = new._replace(
            mu=stats.s_gx / jnp.maximum(stats.s_gam, 1e-30)[:, None]
        )
    if cfg.use_outliers and cfg.optimize_eta0:
        new = new._replace(
            eta0=jnp.log(jnp.maximum(stats.s_g0, 1e-30))
            - jnp.log(jnp.maximum(stats.s_gt, 1e-30))
        )
    if cfg.optimize_w:
        new = new._replace(w=jnp.log(jnp.maximum(stats.s_gam, 1e-30)))
    if cfg.optimize_sigma:
        sigma = jnp.sqrt(stats.s_gd2 / (d * stats.n_eff))
        if cfg.ensure_continuum:
            intr = jnp.sqrt(jnp.mean(second_min_sqdist(new.mu)))
            sigma = jnp.maximum(sigma, intr)
        new = new._replace(sigma=sigma)
    return new


def _em_values(new: GMMState, old: GMMState, e: EStepOut, x, mask,
               cfg: GMMConfig):
    """Quadratic targets Y and local Cfe / quad sums with updated parameters
    (GMM.py:301-323 / 462-496)."""
    d = x.shape[1]
    y = jnp.matmul(e.gam, new.mu, precision="highest")
    lpi = new.w - jax.scipy.special.logsumexp(new.w)
    log_norm_new = _log_gauss_norm(new.sigma, d)
    mu_sq = jnp.sum(new.mu**2, axis=-1)
    y_sq = jnp.sum(y**2, axis=-1)
    inner = (mu_sq[None, :] - y_sq[:, None]) / (2.0 * new.sigma**2) + e.lgam - lpi[None, :]
    inner = jnp.where(e.gam > 0, inner, 0.0)  # guard 0 * -inf
    cfe_n = jnp.sum(e.gam * inner, axis=1) + log_norm_new
    if cfg.use_outliers:
        lpi0, lpit = log_ratio_to_proba(new.eta0)
        log_j0 = -jnp.log(old.vol0)
        gam0 = jnp.exp(e.lgam0)
        cfe_local = jnp.sum(
            mask
            * (
                e.gamt * (cfe_n + e.lgamt - lpit)
                + gam0 * (-log_j0 + e.lgam0 - lpi0)
            )
        )
    else:
        cfe_local = jnp.sum(mask * cfe_n)
    quad_local = jnp.sum(mask * e.gamt * jnp.sum((x - y) ** 2, axis=-1)) / (
        2.0 * new.sigma**2
    )
    return y, cfe_local, quad_local


def _em_step_dense(state, x, mask, cfg, skip_m, axis_name):
    d = x.shape[1]
    e = _e_step(state, x, mask, cfg)

    if skip_m:
        new = state
    else:
        stats = _m_stats(e, x, mask)
        if axis_name is not None:
            stats = jax.lax.psum(stats, axis_name)
        # log-domain w as in the reference (w_c = log sum_n gamma): computed
        # from the reduced linear-domain stat (C is tiny; overflow-safe since
        # counts are O(N))
        new = _apply_stats(state, stats, cfg, d)

    y, cfe_local, quad_local = _em_values(new, state, e, x, mask, cfg)
    if axis_name is not None:
        cfe_local = jax.lax.psum(cfe_local, axis_name)
        quad_local = jax.lax.psum(quad_local, axis_name)
    return EMStepOut(
        state=new, y=y, cfe=cfe_local, fe=cfe_local + quad_local, gamt=e.gamt
    )


def _em_step_tiled(state, x, mask, cfg, skip_m, axis_name, tile):
    """EM step streamed over point tiles — the KeOps symbolic-E-step role
    (reference GMM.py:402-428): the (N, C) responsibility matrix is never
    materialized, only (tile, C) blocks inside a ``lax.scan``.

    Two passes: (1) accumulate the M-step sufficient statistics with the old
    parameters; (2) recompute the E-step per tile and emit targets / energy
    terms with the updated parameters (recompute trades FLOPs for O(N*C)
    memory — the flash-softmax discipline).  Components C stay resident
    (C is small; SURVEY §5: replicate C).
    """
    n, d = x.shape
    nt = -(-n // tile)
    npad = nt * tile
    pad = npad - n
    xt = jnp.pad(x, ((0, pad), (0, 0))).reshape(nt, tile, d)
    mt = jnp.pad(mask, (0, pad)).reshape(nt, tile)

    if skip_m:
        new = state
    else:
        c = state.mu.shape[0]
        zero_stats = MStats(
            s_gam=jnp.zeros((c,), x.dtype),
            s_gx=jnp.zeros((c, d), x.dtype),
            s_gd2=jnp.zeros((), x.dtype),
            s_g0=jnp.zeros((), x.dtype),
            s_gt=jnp.zeros((), x.dtype),
            n_eff=jnp.zeros((), x.dtype),
        )

        def stat_body(acc, tin):
            xti, mti = tin
            e = _e_step(state, xti, mti, cfg)
            s = _m_stats(e, xti, mti)
            return jax.tree.map(jnp.add, acc, s), None

        stats, _ = jax.lax.scan(stat_body, zero_stats, (xt, mt))
        if axis_name is not None:
            stats = jax.lax.psum(stats, axis_name)
        new = _apply_stats(state, stats, cfg, d)

    def val_body(carry, tin):
        cfe, quad = carry
        xti, mti = tin
        e = _e_step(state, xti, mti, cfg)
        y, cfe_l, quad_l = _em_values(new, state, e, xti, mti, cfg)
        return (cfe + cfe_l, quad + quad_l), (y, e.gamt)

    zero = jnp.zeros((), x.dtype)
    (cfe_local, quad_local), (ys, gamts) = jax.lax.scan(
        val_body, (zero, zero), (xt, mt)
    )
    y = ys.reshape(npad, d)[:n]
    gamt = gamts.reshape(npad)[:n]
    if axis_name is not None:
        cfe_local = jax.lax.psum(cfe_local, axis_name)
        quad_local = jax.lax.psum(quad_local, axis_name)
    return EMStepOut(
        state=new, y=y, cfe=cfe_local, fe=cfe_local + quad_local, gamt=gamt
    )


def em_step(
    state: GMMState,
    x: jax.Array,
    mask: Optional[jax.Array],
    cfg: GMMConfig,
    skip_m: bool = False,
    axis_name: Optional[str] = None,
    tile: Optional[int] = None,
) -> EMStepOut:
    """One (E step, M step) alternation + EM values Y / Cfe / FE.

    Exact formula-for-formula port of the reference EM (GMM.py:236-325 for
    the math; post-M values use the *updated* parameters as in the keops
    variant GMM.py:462-496).  ``skip_m=True`` computes values only
    (GMM.py:247: used to initialize targets without touching parameters).

    With ``axis_name`` (inside ``shard_map``/``pmap``), ``x``/``mask`` are
    the local shard and the M-step sufficient statistics and energy sums are
    ``psum``-reduced across devices — the distributed EM of SURVEY §3.3.
    Every device ends with identical parameters.

    Above the dense-pair limit (N*C entries; same dispatch policy as the
    kernel backend, reference kernel.py:99-104) the E-step streams point
    tiles instead of materializing (N, C); ``tile`` forces a tile size.
    """
    if mask is None:
        mask = jnp.ones((x.shape[0],), x.dtype)

    if tile is not None:
        return _em_step_tiled(state, x, mask, cfg, skip_m, axis_name, tile)

    from difficp_tpu.ops import backend as _backend

    if _backend._use_dense(x.shape[0], state.mu.shape[0]):
        return _em_step_dense(state, x, mask, cfg, skip_m, axis_name)
    return _em_step_tiled(state, x, mask, cfg, skip_m, axis_name, tile=8192)


class EMOptOut(NamedTuple):
    state: GMMState
    y: jax.Array
    cfe: jax.Array
    fe: jax.Array
    n_iters: jax.Array
    gamt: jax.Array


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
        st, y, cfe, fe, last_fe, gamt, i = carry
        not_converged = jnp.abs(fe - last_fe) >= tol * jnp.abs(last_fe)
        return jnp.logical_and(i < max_iterations, jnp.logical_or(i < 2, not_converged))

    def body(carry):
        st, y, cfe, fe, last_fe, gamt, i = carry
        out = em_step(st, x, mask, cfg)
        return (out.state, out.y, out.cfe, out.fe, fe, out.gamt, i + 1)

    y0 = jnp.zeros_like(x)
    zero = jnp.asarray(0.0, x.dtype)
    carry = (
        state, y0, zero, jnp.asarray(jnp.inf, x.dtype), zero,
        jnp.ones((x.shape[0],), x.dtype), jnp.asarray(0),
    )
    st, y, cfe, fe, _, gamt, i = jax.lax.while_loop(cond, body, carry)
    return EMOptOut(state=st, y=y, cfe=cfe, fe=fe, n_iters=i, gamt=gamt)


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
