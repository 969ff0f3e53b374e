"""Regression tests for the round-3 optimizer findings.

1. Line-search zoom could only bisect (the cubic safeguard rejected
   out-of-interior proposals to bisection), so a seed 3-4 orders above the
   Wolfe step burned the whole budget without accepting — measured 13.0
   evals per 131k Reg_opt call, every call.  The clamped-cubic zoom
   (>=10x shrink per step toward a pinned edge) + cubic-extrapolation
   growth fix that.
2. The warm-start trust window refused genuinely tiny accepted steps
   (shrink floor at seed * 2^-(ls-1)), so the landscape scale never
   threaded through.  True strong-Wolfe accepts may now shrink the seed up
   to 4096x; budget-exhausted fallbacks still keep the previous seed.
3. A watchdog-split sequence of short L-BFGS calls restarted from an EMPTY
   curvature memory every call == steepest descent, which stalls on stiff
   objectives (at 131k the useful steepest-descent step is below the f32
   resolution of the iterate).  ``memory0`` / ``LBFGSResult.memory``
   threading makes the split sequence equivalent to one long call
   (reference semantics: optim.py runs max_iter=20 in ONE torch call).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difficp_tpu.models import gmm, lddmm
from difficp_tpu.models.psr import DiffPSR
from difficp_tpu.utils.lbfgs import lbfgs_optimize, zero_memory


@pytest.fixture()
def spiral_frames():
    spiral = np.load("tests/goldens/spiral.npz")
    return [spiral[f"x{k}"] for k in range(4)]


def test_memory_threading_matches_single_long_call():
    """Chained short calls with threaded memory == one long call, exactly;
    fresh-memory chaining (old behavior) stalls on a stiff quadratic."""
    n = 50
    scales = jnp.asarray(np.logspace(0, 6, n), jnp.float32)

    def loss(p):
        return 0.5 * jnp.sum(scales * p * p)

    p0 = jnp.ones(n)
    r_long = lbfgs_optimize(loss, p0, nmax=1, inner=40, tol=0.0)

    p, a, mem = p0, None, zero_memory(n)
    for _ in range(10):
        r = lbfgs_optimize(loss, p, nmax=1, inner=4, tol=0.0, alpha0=a,
                           memory0=mem)
        p, a, mem = r.params, r.alpha, r.memory
    assert float(r.loss) == pytest.approx(float(r_long.loss), rel=1e-6)

    p, a = p0, None
    for _ in range(10):
        rf = lbfgs_optimize(loss, p, nmax=1, inner=4, tol=0.0, alpha0=a)
        p, a = rf.params, rf.alpha
    assert float(rf.loss) > 2.0 * float(r_long.loss)


def test_zoom_accepts_seed_overshoot_within_budget():
    """Wolfe step ~1e-4 x the warm seed: the clamped-cubic zoom must truly
    accept within a 12-step budget and thread the tiny scale through the
    (now asymmetric) trust window — the old bisection-only zoom needed ~13
    halvings and the old window clamped the result back to seed/16."""
    # f(p) = 0.5 * kappa * p^2 with huge curvature: alpha* = 1/kappa
    kappa = 1e6

    def loss(p):
        return 0.5 * kappa * jnp.sum(p * p)

    p0 = jnp.ones(2)
    seed = jnp.asarray(0.5, jnp.float32)  # alpha* = 1e-6 => 5e5x overshoot
    res = lbfgs_optimize(loss, p0, nmax=1, inner=1, tol=0.0,
                         max_linesearch_steps=12, alpha0=seed)
    # a true accept happened and its scale threads (well below seed/16,
    # which the old window forbade)
    assert float(res.loss) < 0.5 * kappa * 2 * 0.9  # moved measurably
    assert float(res.alpha) < float(seed) / 16.0
    assert float(res.alpha) > float(seed) / 4096.0 - 1e-12


def test_carry_memory_stepwise_improves_fe(spiral_frames):
    """Stepwise Reg_opt with carry_memory reaches at-least-as-good FE at an
    identical budget, stays monotone, and memory is invalidated when the
    support scheme (the parameter space) changes."""
    rng = np.random.default_rng(0)
    mu0 = spiral_frames[0][rng.integers(0, spiral_frames[0].shape[0], 20)]
    state, _ = gmm.create(jnp.asarray(mu0))
    gcfg = gmm.GMMConfig(optimize_eta0=False)
    lcfg = lddmm.make_config(sigma=0.2, lambd=5e2, version="hybrid",
                             nt=5, scheme="Euler")

    fes = {}
    for cm in (False, True):
        psr = DiffPSR(spiral_frames, state, gcfg, lcfg)
        psr.printstuff = False
        psr.GMM_opt(max_iterations=5, tol=1e-4)
        for _ in range(4):
            psr.Reg_opt(tol=1e-3, nmax=1, inner=3, ls_steps=8,
                        carry_memory=cm)
            psr.GMM_opt(max_iterations=5, tol=1e-4)
        assert psr.fe_increase_events == 0
        fes[cm] = psr.FE
    assert fes[True] <= fes[False] + 1e-3 * abs(fes[False])

    # support change invalidates the carried memory (new parameter space).
    # NOTE: the switch itself re-projects momenta (update_a0, rcond=1e-1),
    # which may legitimately bump FE once — the oracle here is only that
    # the carried-memory Reg_opt runs on the new space without error and
    # repopulates the memory.
    psr.set_support_scheme("grid", rho=1.0)
    assert psr._reg_memory is None
    inc_before = psr.fe_increase_events
    psr.Reg_opt(tol=1e-3, nmax=1, inner=2, ls_steps=8, carry_memory=True)
    assert psr._reg_memory is not None
    psr.Reg_opt(tol=1e-3, nmax=1, inner=2, ls_steps=8, carry_memory=True)
    # after the one projection-induced update, the optimizer itself must
    # stay monotone
    assert psr.fe_increase_events <= inc_before + 1


def test_carry_memory_fused_run_monotone(spiral_frames):
    """Fused run(carry_memory=True) threads memory through the scan carry
    and across chunks; FE stays monotone and matches-or-beats the default
    at the same budget."""
    rng = np.random.default_rng(1)
    mu0 = spiral_frames[0][rng.integers(0, spiral_frames[0].shape[0], 20)]
    state, _ = gmm.create(jnp.asarray(mu0))
    gcfg = gmm.GMMConfig(optimize_eta0=False)
    lcfg = lddmm.make_config(sigma=0.2, lambd=5e2, version="hybrid",
                             nt=5, scheme="Euler")

    fes = {}
    for cm in (False, True):
        psr = DiffPSR(spiral_frames, state, gcfg, lcfg)
        psr.printstuff = False
        psr.run(4, max_em=5, reg_nmax=1, reg_inner=3, reg_ls=8,
                chunk=2, carry_memory=cm)
        assert psr.fe_increase_events == 0
        fes[cm] = psr.FE
    assert fes[True] <= fes[False] + 1e-3 * abs(fes[False])
