"""LDDMM geodesic shooting for point sets (classic or with logdet term).

Functional re-design of the reference ``LDDMMModel`` (reference
diffICP/core/LDDMM.py:28-398):

- Vector fields v(x) = sum_j [ p_j K(x - q_j) - eta (grad K)(x - q_j) ] with
  eta = 1/lambda (gradcomponent) or 0 (LDDMM.py:24-26, 100-116).
- Hamiltonian H(q, p) (LDDMM.py:142-159) and the hand-derived Hamiltonian
  ODE dq/dt = v(q), dp/dt = -grad_q H with the logdet divergence cost
  accumulated along the trajectory (LDDMM.py:176-227).  The RHS uses the
  *fused* reductions in ``difficp_tpu.ops.reductions`` (kernel terms
  computed once per evaluation).
- Model versions "classic" / "logdet" / "hybrid" via the same
  (gradcomponent, withlogdet) switches (LDDMM.py:43-49).
- ``shoot`` is a ``lax.scan`` (Euler / Ralston), so dL/dp0 comes from
  ``jax.grad`` straight through the integrator — replacing torch autograd
  through an unrolled Python loop.
- ``optimize`` minimizes trajloss + dataloss over p0 with the jittable,
  vmappable L-BFGS in ``difficp_tpu.utils.lbfgs`` (reference optim contract).

Masking: ``qmask`` marks real support rows, ``xmask`` real data rows.  With
``p`` zero on padded rows and the RHS row-masked, padded slots stay exactly
frozen through the shoot.
"""

from __future__ import annotations

import warnings
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from difficp_tpu.ops import backend as red
from difficp_tpu.ops.solvers import (
    kpinv_solve, kridge_solve, kridge_solve_cg, rff_gaussian_field, svd_pow,
)
from difficp_tpu.utils.integrators import integrate
from difficp_tpu.utils.lbfgs import lbfgs_optimize, seed_alpha_for


class LDDMMConfig(NamedTuple):
    """Static model configuration (reference LDDMM.py:33-65)."""
    sigma: float = 1.0
    lambd: float = 2.0
    gradcomponent: bool = True
    withlogdet: bool = True
    nt: int = 10
    scheme: str = "Ralston"

    @property
    def eta(self) -> float:
        return 1.0 / self.lambd if self.gradcomponent else 0.0


def make_config(
    sigma: float,
    lambd: float,
    version: Optional[str] = None,
    gradcomponent: bool = True,
    withlogdet: bool = True,
    nt: int = 10,
    scheme: str = "Ralston",
) -> LDDMMConfig:
    """Version shortcut resolution (reference LDDMM.py:43-49):
    classic = no gradcomponent, no logdet; logdet = both; hybrid = logdet
    energy with a classic vector field."""
    if version == "classic":
        gradcomponent, withlogdet = False, False
    elif version == "logdet":
        gradcomponent, withlogdet = True, True
    elif version == "hybrid":
        gradcomponent, withlogdet = False, True
    elif version is not None:
        raise ValueError(f"unknown LDDMM version: {version}")
    return LDDMMConfig(
        sigma=float(sigma), lambd=float(lambd), gradcomponent=gradcomponent,
        withlogdet=withlogdet, nt=int(nt), scheme=scheme,
    )


# ---------------------------------------------------------------------------


def v(cfg: LDDMMConfig, x, q, p, qmask=None):
    """RKHS vector field at points x (LDDMM.py:100-116)."""
    return red.v_field(x, q, p, cfg.sigma, cfg.eta, qmask)


def hamiltonian(cfg: LDDMMConfig, q, p, qmask=None):
    """H(q, p) (LDDMM.py:142-159)."""
    return red.hamiltonian(q, p, cfg.sigma, cfg.eta, qmask)


def mdivsum(cfg: LDDMMConfig, x, q, p, qmask=None, xmask=None):
    """Sum of -div(v) over data points x (LDDMM.py:120-138)."""
    return red.mdivsum(x, q, p, cfg.sigma, cfg.eta, qmask, xmask)


class ShootState(NamedTuple):
    q: jax.Array
    p: jax.Array
    cost: jax.Array          # accumulated divergence cost (scalar)
    x: Optional[jax.Array]   # advected external points, or None


def _ode(cfg: LDDMMConfig, qmask, xmask):
    """Hamiltonian ODE right-hand side (LDDMM.py:176-227), fused."""

    def fn(s: ShootState) -> ShootState:
        if s.x is None:
            vq, mgq, dcost = red.lddmm_rhs_self(
                s.q, s.p, cfg.sigma, cfg.eta, cfg.withlogdet, qmask
            )
            return ShootState(q=vq, p=mgq, cost=dcost, x=None)
        vq, mgq, dcost, vx = red.lddmm_rhs_ext(
            s.q, s.p, s.x, cfg.sigma, cfg.eta, cfg.withlogdet, qmask, xmask
        )
        return ShootState(q=vq, p=mgq, cost=dcost, x=vx)

    return fn


def shoot(
    cfg: LDDMMConfig,
    q0,
    p0,
    x0=None,
    qmask=None,
    xmask=None,
    save_traj: bool = False,
):
    """Simulate the geodesic ODE from (q0, p0), optionally advecting an
    external point set x0 (LDDMM.py:286-299).

    :return: (final ShootState, trajectory ShootState with nt+1 leading dim
        or None)
    """
    state0 = ShootState(
        q=q0, p=p0, cost=jnp.zeros((), q0.dtype), x=x0
    )
    return integrate(
        _ode(cfg, qmask, xmask), state0, nt=cfg.nt, scheme=cfg.scheme,
        save_traj=save_traj,
    )


def trajloss(cfg: LDDMMConfig, q0, p0, final_cost, qmask=None):
    """LDDMM trajectory energy lambda * H(q0, p0) + divcost (LDDMM.py:318-334)."""
    return cfg.lambd * hamiltonian(cfg, q0, p0, qmask) + final_cost


class OptimizeResult(NamedTuple):
    p0: jax.Array
    final: ShootState     # arrival state of the last shoot
    trajl: jax.Array
    datal: jax.Array
    n_steps: jax.Array
    change: jax.Array
    alpha: jax.Array = jnp.asarray(0.0)  # accepted line-search step size
    #   (warm-start the next optimize on the same frame with alpha0=alpha)
    alpha_qn: jax.Array = jnp.asarray(1.0)  # adaptive quasi-Newton trial
    #   scale (thread as alpha_qn0 — see utils/lbfgs.LBFGSResult.alpha_qn)
    memory: any = None  # L-BFGS curvature memory — thread into the next
    #   optimize on the same frame (memory0=...) so watchdog-split short
    #   calls keep quasi-Newton convergence instead of restarting as
    #   steepest descent (utils/lbfgs.LBFGSMemory)
    grad: any = None  # dL/dp0 AT the returned p0.  Thread
    #   ``warm_vg=(grad, final, trajl, datal)`` into the next optimize on
    #   the UNCHANGED objective (same q0/x0/dataloss) to skip its entry
    #   value_and_grad — at scale that eval is a full fwd+bwd shoot, half
    #   of a steady nmax=1 step
    n_evals: any = None  # total line-search loss+grad evaluations (each a
    #   full fwd+bwd shoot) — observability for watchdog program sizing
    stalled: any = None  # lane converged at f32 resolution this call (no
    #   step found / tolerance-frozen).  Thread as ``stall0`` into the next
    #   optimize while the objective is UNCHANGED; see
    #   utils/lbfgs.LBFGSResult.stalled


def _make_lossfn(cfg, dataloss, q0, x0, qmask, xmask):
    def lossfn(p):
        final, _ = shoot(cfg, q0, p, x0, qmask, xmask)
        pts = final.x if x0 is not None else final.q
        return trajloss(cfg, q0, p, final.cost, qmask) + dataloss(pts)

    return lossfn


def seed_alpha(cfg, dataloss, q0, p0, x0=None, qmask=None, xmask=None):
    """Zoom line-search seed ~ min(1, 1/||g0||) for ``optimize`` on this
    problem (the classical first-step heuristic; same norm convention as
    utils/lbfgs.py's internal seeding).

    Computing the seed OUTSIDE ``optimize`` lets every call take the warm
    ``alpha0`` path: one compiled L-BFGS program per configuration instead
    of separate cold/warm variants — at 131k points each variant costs a
    5-10 min remote compile, while this one fwd+bwd shoot compiles in
    seconds."""
    lossfn = _make_lossfn(cfg, dataloss, jax.lax.stop_gradient(q0),
                          None if x0 is None else jax.lax.stop_gradient(x0),
                          qmask, xmask)
    return seed_alpha_for(lossfn, p0)


def optimize(
    cfg: LDDMMConfig,
    dataloss: Callable,
    q0,
    p0,
    x0=None,
    qmask=None,
    xmask=None,
    nmax: int = 10,
    tol: float = 1e-3,
    errthresh: float = 1e8,
    inner: int = 20,
    max_linesearch_steps: int = 25,
    alpha0=None,
    alpha_qn0=None,
    memory0=None,
    warm_vg=None,
    stall0=None,
) -> OptimizeResult:
    """min_{p0} trajloss(p0) + dataloss(arrival points)  (LDDMM.py:338-398).

    ``dataloss(pts)`` consumes the warped data points (x1 if x0 given, else
    q1).  Gradients flow by ``jax.grad`` through the scan-based shoot.

    ``warm_vg``: ``(grad, final, trajl, datal)`` of a previous result at
    ``p0`` on the IDENTICAL objective — skips the entry value+grad (a full
    fwd+bwd shoot).  Only valid when q0/x0/dataloss have not changed since
    (watchdog-split calls between EM target updates).
    """
    q0 = jax.lax.stop_gradient(q0)
    if x0 is not None:
        x0 = jax.lax.stop_gradient(x0)

    def lossfn_aux(p):
        final, _ = shoot(cfg, q0, p, x0, qmask, xmask)
        pts = final.x if x0 is not None else final.q
        trajl = trajloss(cfg, q0, p, final.cost, qmask)
        datal = dataloss(pts)
        return trajl + datal, (final, trajl, datal)

    # the arrival state / loss terms of the BEST evaluation thread out as
    # aux, so there is no re-shoot at the returned params (the reference
    # re-shoots once for reporting, LDDMM.py:394-396; at 131k points that
    # final shoot was ~0.75 s of every Reg_opt step)
    if warm_vg is not None:
        grad0, final0, trajl0, datal0 = warm_vg
        value0 = trajl0 + datal0
        aux0 = (final0, trajl0, datal0)
    else:
        grad0 = value0 = aux0 = None
    res = lbfgs_optimize(
        lossfn_aux, p0, nmax=nmax, inner=inner, tol=tol,
        errthresh=errthresh, max_linesearch_steps=max_linesearch_steps,
        alpha0=alpha0, alpha_qn0=alpha_qn0, has_aux=True, memory0=memory0,
        value0=value0, grad0=grad0, aux0=aux0, stall0=stall0,
    )
    final, trajl, datal = res.aux
    return OptimizeResult(
        p0=res.params, final=final, trajl=trajl, datal=datal,
        n_steps=res.n_steps, change=res.change, alpha=res.alpha,
        alpha_qn=res.alpha_qn,
        memory=res.memory, grad=res.grad, n_evals=res.n_evals,
        stalled=res.stalled,
    )


# ---------------------------------------------------------------------------
# v <-> p conversions and prior sampling (LDDMM.py:235-280)
# ---------------------------------------------------------------------------

def v2p(cfg: LDDMMConfig, q, v_target, rcond=1e-3, alpha=1e-4,
        version: str = "pinv", qmask=None):
    """Estimate momenta p with v(q, q, p) ~= v_target (ill-posed; pinv or
    ridge regularized, LDDMM.py:235-253).

    Above the dense pair limit the O(M^3) SVD pseudo-inverse is infeasible
    (the reference's numpy-lstsq path has the same wall, kernel.py:227-232);
    'pinv' then falls back to the matrix-free CG ridge solve with a
    blockwise kernel matvec, and the gradcomponent right-hand side streams
    through the dispatched grad_kred."""
    rhs = v_target
    if cfg.eta != 0.0:
        rhs = rhs + cfg.eta * red.grad_kred(q, q, cfg.sigma, qmask)
    m = q.shape[0]
    if version in ("pinv", "ridge", "ridge_keops", "ridge_pytorch") and (
        m * m > red.DENSE_PAIR_LIMIT
    ):
        version = "ridge_cg"
    if version == "pinv":
        return kpinv_solve(q, rhs, cfg.sigma, rcond=rcond, mask=qmask)
    elif version in ("ridge", "ridge_keops", "ridge_pytorch"):
        return kridge_solve(q, rhs, cfg.sigma, alpha=alpha, mask=qmask)
    elif version == "ridge_cg":
        return kridge_solve_cg(q, rhs, cfg.sigma, alpha=alpha, mask=qmask)
    raise ValueError(f"unknown v2p version: {version}")


def random_p(cfg: LDDMMConfig, q, key, rcond=1e-3, alpha=1e-4,
             version: str = "svd", qmask=None, n_features=2048,
             cg_tol=1e-6, cg_maxiter=500):
    """Sample momenta from the Bayesian prior P(p) ~ exp(-lambda H(q, p))
    (LDDMM.py:257-280).  Only for eta == 0, like the reference.

    'svd' / 'ridge' require a dense matrix root of K(q, q): O(M^2) memory /
    O(M^3) compute (same wall as the reference's SVD/Cholesky,
    LDDMM.py:272-279).  Above the dense pair limit, 'ridge' auto-routes to
    'rff_cg' — pathwise sampling (Wilson et al. 2020 style): draw
    u ~ N(0, K + alpha I) as an O(M * F) random-Fourier-feature field plus
    sqrt(alpha) * white noise, then p = (K + alpha I)^{-1} u / sqrt(lambda)
    by matrix-free CG (kernel matvec via the dispatched kernel-sum), giving
    Cov(p) = (K + alpha I)^{-1} / lambda — the same distribution as 'ridge',
    up to the O(1/sqrt(n_features)) RFF covariance error.  'svd' has no
    matrix-free analog (its pseudo-inverse cutoff is spectral) and raises."""
    if cfg.eta != 0.0:
        raise NotImplementedError("random_p requires gradcomponent=False")
    m = q.shape[0]
    if m * m > red.DENSE_PAIR_LIMIT and version == "ridge":
        warnings.warn(
            f"random_p: M={m} exceeds the dense pair limit; rerouting "
            "version='ridge' to the matrix-free 'rff_cg' sampler (same "
            "target distribution, up to O(1/sqrt(n_features)) RFF "
            "covariance error). Pass version='rff_cg' to silence.",
            stacklevel=2,
        )
        version = "rff_cg"
    if version == "rff_cg":
        kf, kxi = jax.random.split(key)
        f = rff_gaussian_field(q, cfg.sigma, kf, q.shape[1],
                               n_features=n_features)
        xi = jax.random.normal(kxi, q.shape, q.dtype)
        u = f + jnp.sqrt(alpha) * xi
        if qmask is not None:
            u = u * qmask[:, None]
        p = kridge_solve_cg(q, u, cfg.sigma, alpha=alpha, mask=qmask,
                            tol=cg_tol, maxiter=cg_maxiter)
        return p / jnp.sqrt(cfg.lambd)
    if m * m > red.DENSE_PAIR_LIMIT:
        raise ValueError(
            f"random_p version='{version}' needs a dense (M, M) kernel "
            f"matrix root; M={m} is above the dense pair limit "
            f"({red.DENSE_PAIR_LIMIT} pairs). Use version='rff_cg' (matrix-"
            "free pathwise sampling, same distribution as 'ridge'), sample "
            "on a decimated/grid support set (the prior is an RKHS prior — "
            "a coarse support spans the same fields), or raise "
            "DIFFICP_DENSE_PAIR_LIMIT explicitly."
        )
    d2 = jnp.sum((q[:, None, :] - q[None, :, :]) ** 2, axis=-1)
    k = jnp.exp(-d2 / (2.0 * cfg.sigma**2))
    if qmask is not None:
        mm = qmask[:, None] * qmask[None, :]
        k = k * mm + (1.0 - qmask)[:, None] * jnp.eye(q.shape[0], dtype=q.dtype)
    zeta = jax.random.normal(key, q.shape, q.dtype) / jnp.sqrt(cfg.lambd)
    if version == "svd":
        p = svd_pow(k, -0.5, rcond) @ zeta
    elif version == "ridge":
        chol = jnp.linalg.cholesky(k + alpha * jnp.eye(k.shape[0], dtype=q.dtype))
        p = jax.scipy.linalg.solve_triangular(chol, zeta, lower=True)
    else:
        raise ValueError(f"unknown random_p version: {version}")
    if qmask is not None:
        p = p * qmask[:, None]
    return p


def quad_dataloss(y, cmul: float = 1.0):
    """Basic quadratic landmark dataloss functor: x -> cmul * |x - y|^2 / 2
    (reference BasicQuadLossFunctor, LDDMM.py:303-314)."""
    y = jax.lax.stop_gradient(y)

    def dataloss(x):
        return jnp.sum((x - y) ** 2) * cmul / 2.0

    return dataloss
