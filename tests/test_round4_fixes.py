"""Regression tests for the round-4 optimizer work.

1. Entry-eval elimination: a watchdog-split sequence of short L-BFGS calls
   on the SAME objective pays a mandatory entry ``value_and_grad`` per call
   — at 131k points that is a full fwd+bwd shoot, half the cost of a steady
   nmax=1 step.  ``value0``/``grad0``/``aux0`` threading (fed from
   ``LBFGSResult.loss``/``.grad``/``.aux``) skips it; the trajectory must be
   IDENTICAL to the unthreaded chain (the threaded pair equals what the
   entry eval would have computed), with exactly one fewer evaluation per
   threaded call.
2. PSR plumbing: ``DiffPSR.Reg_opt(carry_value=True)`` threads the batched
   (grad, final, trajl, datal) across split calls and EVERY objective
   change (EM target update, support change, momenta re-projection) must
   invalidate it — a stale Armijo baseline silently corrupts the search.
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


def _counting_loss(counter):
    n = 24
    rng = np.random.default_rng(3)
    a = rng.normal(size=(n, n))
    a = a @ a.T + np.diag(np.linspace(1.0, 200.0, n))
    A = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(rng.normal(size=n), jnp.float32)

    def loss(p):
        jax.debug.callback(lambda: counter.__setitem__(0, counter[0] + 1))
        return 0.5 * p @ A @ p - b @ p

    return loss, n


def _chain(loss, n, ncalls, thread_vg):
    p, a, mem = jnp.zeros(n), None, zero_memory(n)
    v = g = None
    results = []
    for _ in range(ncalls):
        r = lbfgs_optimize(loss, p, nmax=1, inner=3, tol=0.0, alpha0=a,
                           memory0=mem,
                           value0=v if thread_vg else None,
                           grad0=g if thread_vg else None)
        p, a, mem = r.params, r.alpha, r.memory
        if thread_vg:
            v, g = r.loss, r.grad
        results.append(r)
    return results


def test_vg_threading_identical_trajectory_one_fewer_eval_per_call():
    """value0/grad0 threading == unthreaded chain EXACTLY (the threaded
    pair is what the entry eval would have computed), and each threaded
    call saves exactly one objective evaluation."""
    ncalls = 4
    cnt = [0]
    loss, n = _counting_loss(cnt)

    cnt[0] = 0
    plain = _chain(loss, n, ncalls, thread_vg=False)
    evals_plain = cnt[0]

    cnt[0] = 0
    threaded = _chain(loss, n, ncalls, thread_vg=True)
    evals_threaded = cnt[0]

    # calls 2..ncalls skip their entry eval; call 1 still pays it
    assert evals_threaded == evals_plain - (ncalls - 1)
    # trajectory is bit-identical: same params, loss, alpha at every call
    for rp, rt in zip(plain, threaded):
        np.testing.assert_array_equal(np.asarray(rp.params),
                                      np.asarray(rt.params))
        assert float(rp.loss) == float(rt.loss)
        assert float(rp.alpha) == float(rt.alpha)


def test_grad_result_is_gradient_at_params():
    """LBFGSResult.grad must be the true gradient AT LBFGSResult.params
    (the contract value0/grad0 threading relies on)."""
    cnt = [0]
    loss, n = _counting_loss(cnt)
    r = lbfgs_optimize(loss, jnp.ones(n), nmax=1, inner=4, tol=0.0)
    g_true = jax.grad(loss)(r.params)
    np.testing.assert_allclose(np.asarray(r.grad), np.asarray(g_true),
                               rtol=1e-6, atol=1e-6)


def test_vg_requires_both_and_aux():
    loss, n = _counting_loss([0])
    with pytest.raises(ValueError):
        lbfgs_optimize(loss, jnp.ones(n), value0=jnp.asarray(1.0))
    with pytest.raises(ValueError):
        lbfgs_optimize(lambda p: (loss(p), ()), jnp.ones(n), has_aux=True,
                       value0=jnp.asarray(1.0), grad0=jnp.ones(n))


def test_carry_value_stepwise_matches_plain_and_invalidates(spiral_frames):
    """Stepwise Reg_opt(carry_value=True) between EM updates: FE stays
    monotone, matches the unthreaded sequence, and every objective change
    nulls the carried pair."""
    rng = np.random.default_rng(0)
    mu0 = spiral_frames[0][rng.integers(0, spiral_frames[0].shape[0], 20)]
    state, _ = gmm.create(jnp.asarray(mu0))
    gcfg = gmm.GMMConfig(optimize_eta0=False)
    lcfg = lddmm.make_config(sigma=0.2, lambd=5e2, version="hybrid",
                             nt=5, scheme="Euler")

    fes = {}
    for cv in (False, True):
        psr = DiffPSR(spiral_frames, state, gcfg, lcfg)
        psr.printstuff = False
        psr.GMM_opt(max_iterations=5, tol=1e-4)
        # several split Reg_opt calls between EM updates — the carry_value
        # payoff pattern (the 131k stepwise mode)
        for _ in range(2):
            for _ in range(3):
                psr.Reg_opt(tol=1e-3, nmax=1, inner=2, ls_steps=8,
                            carry_memory=True, carry_value=cv)
            psr.GMM_opt(max_iterations=5, tol=1e-4)
            if cv:
                # EM target update must invalidate the carried pair
                assert psr._reg_vg is None
        assert psr.fe_increase_events == 0
        fes[cv] = psr.FE
    # identical optimization trajectory => identical free energy
    assert fes[True] == pytest.approx(fes[False], rel=1e-5)

    # support change invalidates through update_a0
    psr.Reg_opt(tol=1e-3, nmax=1, inner=2, ls_steps=8, carry_value=True)
    assert psr._reg_vg is not None
    psr.set_support_scheme("grid", rho=1.0)
    assert psr._reg_vg is None
    # and the first threaded call after it re-evaluates without error
    psr.Reg_opt(tol=1e-3, nmax=1, inner=2, ls_steps=8, carry_memory=True,
                carry_value=True)
    assert psr._reg_vg is not None


def test_api_carry_memory_option(spiral_frames):
    """numerical_options['carry_memory_LDDMM'] reaches Reg_opt: the atlas
    run stays monotone and threads a populated memory."""
    from difficp_tpu.api.icp_atlas import icp_atlas

    psr, _ = icp_atlas(
        spiral_frames,
        GMM_parameters={"init_components": ("set", 0)},
        registration_parameters={"type": "diffeomorphic",
                                 "sigma_LDDMM": 0.2,
                                 "lambda_LDDMM": 500.0},
        numerical_options={"integration_nt_LDDMM": 5,
                           "carry_memory_LDDMM": True},
        optim_options={"max_iterations": 2},
        printstuff=False,
    )
    assert psr.fe_increase_events == 0
    assert psr._reg_memory is not None


def test_linesearch_divergent_seed_backoff():
    """A cold seed landing orders of magnitude past the objective's finite
    region must still accept a step within a watchdog-sized ls budget: a
    divergent (non-finite / > errthresh) BRACKETING trial backs the step
    off geometrically (a/64) instead of opening a NaN-endpoint bracket
    that can only bisect (measured at K=10 x 65k atlas: the 1/||g0|| seed
    sits ~5 orders above the Wolfe window with NaN in between; ~14
    bisections never fit ls<=8, so NO step was ever accepted and the
    registration made exactly zero FE progress)."""
    import jax
    import jax.numpy as jnp
    from difficp_tpu.utils.lbfgs import lbfgs_optimize

    # quartic blow-up: finite descent only for steps |p| <~ 1e-3 from the
    # start; 1/||g0|| seeds ~ 5e-5 * scale overshoots hugely
    scale = 1e4

    def loss(p):
        t = jnp.sum(p * p)
        quart = (scale * t) ** 2
        return jnp.where(quart > 1e6, jnp.nan, scale * t + quart)

    p0 = jnp.full((8,), 3e-4, jnp.float32)  # loss finite at start
    res = lbfgs_optimize(loss, p0, nmax=1, inner=2, tol=0.0,
                         max_linesearch_steps=8)
    l0 = float(loss(p0))
    assert float(res.loss) < l0 - 1e-6, (float(res.loss), l0)
    assert bool(jnp.isfinite(res.loss))
    # and the accepted alpha threads out as a warm seed (> degenerate)
    assert float(res.alpha) > 0.0
