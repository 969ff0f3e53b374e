"""Round-5 regression tests: device-derived VMEM budgets, the sym-table
mask-monomial ValueError, and the okf-gated bracket flip in the line
search (ADVICE r4 + VERDICT r4 items 7/9)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difficp_tpu.ops import pallas_reductions as pr
from difficp_tpu.ops import pair_poly as pp


def test_vmem_budget_derived_from_device():
    # on the CPU test mesh the default capacity is 16 MB, and the derived
    # budget must reproduce the hand-calibrated v5e value of rounds 2-4
    assert pr._sym_budget_floats() == (15 * 1024 * 1024) // 8
    assert pr._sym_max_mpad() == 81920


def test_vmem_budget_env_override(monkeypatch):
    monkeypatch.setenv("DIFFICP_VMEM_BYTES", str(32 * 1024 * 1024))
    pr._device_vmem_bytes.cache_clear()
    pr._sym_budget_floats.cache_clear()
    pr._sym_max_mpad.cache_clear()
    try:
        assert pr._device_vmem_bytes() == 32 * 1024 * 1024
        assert pr._sym_budget_floats() == (31 * 1024 * 1024) // 8
    finally:
        monkeypatch.delenv("DIFFICP_VMEM_BYTES")
        pr._device_vmem_bytes.cache_clear()
        pr._sym_budget_floats.cache_clear()
        pr._sym_max_mpad.cache_clear()


def test_sym_table_mask_monomial_raises_valueerror():
    # must be a ValueError (survives python -O), not a bare assert
    x = jnp.zeros((16, 2), jnp.float32)
    col_vals = {
        "q0": x[:, 0], "q1": x[:, 1], "m": jnp.ones((16,), jnp.float32),
        "w": jnp.ones((16,), jnp.float32),
    }
    with pytest.raises(ValueError, match="mask"):
        pp._sym_table([("w",)], x, col_vals, 0.5, t=8)


def test_linesearch_aberrant_bracket_trial_recovers():
    """A finite-but-aberrant (> errthresh) trial with positive directional
    derivative during BRACKETING must not open a degenerate zoom bracket:
    the search still finds a strong-Wolfe point on a 1-D objective built to
    hit that path (f finite but > errthresh beyond x=2, rising slope)."""
    from difficp_tpu.utils.lbfgs import lbfgs_optimize

    def f(x):
        v = x[0]
        # parabola with minimum at 1; beyond 2 the value jumps finite-huge
        base = (v - 1.0) ** 2
        spike = jnp.where(v > 2.0, 1e12, 0.0)
        return base + spike

    x0 = jnp.array([0.0], jnp.float32)
    res = lbfgs_optimize(f, x0, nmax=2, inner=8, max_linesearch_steps=12,
                         errthresh=1e6)
    xs = float(res.params[0])
    # converged toward the parabola minimum, never stuck at the spike
    assert np.isfinite(float(res.loss))
    assert 0.0 < xs <= 2.0
    assert float(res.loss) < float(f(x0))


def test_blocked_scratch_pipeline_matches_plain():
    """The ping-pong VMEM-scratch pipeline of the blocked wide-table
    kernel-sum is bit-identical to the plain loop (same contraction order,
    only the exp tile's residence changes)."""
    from difficp_tpu.ops import pallas_ksum as pk

    rng = np.random.default_rng(0)
    n = 1024
    x = jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)
    pay = jnp.asarray(rng.normal(size=(n, 70)), jnp.float32)
    keep = (pk._BLOCKED_MIN_ROWS, pk._BLOCKED_MIN_N,
            pk._BLOCKED_BUDGET_FLOATS, pk._BLOCKED_PIPELINE)
    try:
        pk._BLOCKED_MIN_ROWS = 8
        pk._BLOCKED_MIN_N = 512
        pk._BLOCKED_BUDGET_FLOATS = 200_000  # force several y blocks
        pk._BLOCKED_PIPELINE = None
        a = pk.pairwise_ksum(x, y, pay, 0.3, None, ti=256, tj=256)
        pk._BLOCKED_PIPELINE = "scratch"
        b = pk.pairwise_ksum(x, y, pay, 0.3, None, ti=256, tj=256)
    finally:
        (pk._BLOCKED_MIN_ROWS, pk._BLOCKED_MIN_N,
         pk._BLOCKED_BUDGET_FLOATS, pk._BLOCKED_PIPELINE) = keep
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_alpha_qn_no_collapse_near_convergence():
    """Near-converged lanes accepting tiny true-Wolfe steps must NOT drag
    the adaptive quasi-Newton trial scale down (the r5 bench regression:
    aqn lanes collapsed to ~3e-5 on the tiny-K fused workload, and every
    later line search re-paid the 10x/eval growth).  On a well-scaled
    quadratic driven to convergence the returned alpha_qn stays 1.0."""
    from difficp_tpu.utils.lbfgs import lbfgs_optimize

    def f(x):
        return jnp.sum((x - 0.5) ** 2)

    res = lbfgs_optimize(f, jnp.zeros((4,), jnp.float32), nmax=6, inner=10,
                         max_linesearch_steps=12)
    assert float(res.loss) < 1e-10
    assert float(res.alpha_qn) == 1.0


def test_alpha_qn_adapts_on_stiff_objective():
    """A stiff objective whose Wolfe step sits orders below 1.0 but which
    makes real relative progress per step must still thread a reduced
    alpha_qn (the K=10 x 65k atlas case the machinery exists for)."""
    from difficp_tpu.utils.lbfgs import lbfgs_optimize

    # log-barrier, ONE inner step: the first accepted step is tiny
    # (~0.0099 toward the barrier) with large relative progress -> the
    # returned trial scale tracks it (8x, clamped).  Note aqn recovers
    # toward 1.0 once later steps accept near the natural trial — it is a
    # last-productive-scale tracker, so the single-step call pins the
    # assertion deterministically.
    def f(x):
        return -jnp.sum(jnp.log(1.0 - x)) + 50.0 * jnp.sum(x * x)

    res = lbfgs_optimize(f, jnp.zeros((4,), jnp.float32) + 0.01, nmax=1,
                         inner=1, max_linesearch_steps=20)
    assert float(res.alpha_qn) < 0.1


def test_alpha_qn_untouched_by_fallback_steps():
    """Budget-fallback (non-strong-Wolfe) steps must NOT move the adaptive
    trial scale: fallback sizes encode where the budget ran out, not the
    landscape, and letting them update aqn degraded single-lane
    convergence quality measurably (chui diffeomorphic FE went from 0.7%
    to 8% off the torch reference).  No-step budget exhaustion is handled
    by the SEED bootstrap + stall flag instead (tests above)."""
    from difficp_tpu.utils.lbfgs import lbfgs_optimize

    def g(x):
        return -jnp.sum(x) + jnp.where(jnp.max(jnp.abs(x)) > 1e-12,
                                       jnp.inf, 0.0)

    res = lbfgs_optimize(g, jnp.zeros((4,), jnp.float32), nmax=1, inner=1,
                         max_linesearch_steps=3)
    assert float(res.alpha_qn) == 1.0


def test_stall_threading_skips_all_work():
    """A stalled-in lane must contribute ZERO line-search evaluations and
    return its entry state unchanged (torch long-call freeze semantics
    across watchdog-split calls)."""
    from difficp_tpu.utils.lbfgs import lbfgs_optimize

    def f(x):
        return jnp.sum((x - 0.5) ** 2)

    x0 = jnp.zeros((4,), jnp.float32)
    res = lbfgs_optimize(f, x0, nmax=3, inner=5, stall0=jnp.asarray(True))
    assert float(res.n_evals) == 0
    np.testing.assert_array_equal(np.asarray(res.params), np.asarray(x0))
    assert bool(res.stalled)  # stays stalled for the next call

    # un-stalled control on the same problem: works normally
    res2 = lbfgs_optimize(f, x0, nmax=3, inner=5,
                          stall0=jnp.asarray(False))
    assert float(res2.loss) < 1e-8


def test_stalled_flag_set_when_no_step_found():
    """A WARM lane whose entire budget finds no step reports stalled=True
    (the f32-converged lanes observed at K=10 x 65k).  A COLD lane in the
    same state must NOT stall — it only proves the budget could not
    descend from the 1/||g0|| seed to the Wolfe zone (marking it stalled
    deadlocked the whole K=10 x 131k registration); instead its returned
    seed bootstraps down by the probed range."""
    from difficp_tpu.utils.lbfgs import lbfgs_optimize

    def g(x):
        return -jnp.sum(x) + jnp.where(jnp.max(jnp.abs(x)) > 1e-12,
                                       jnp.inf, 0.0)

    # warm evidence (a threaded accepted step scale) -> stall
    res = lbfgs_optimize(g, jnp.zeros((4,), jnp.float32), nmax=1, inner=1,
                         max_linesearch_steps=3, alpha0=0.5)
    assert bool(res.stalled)

    # cold -> no stall; seed shrunk by the probed descent range 10^-(ls-1)
    res_c = lbfgs_optimize(g, jnp.zeros((4,), jnp.float32), nmax=1,
                           inner=1, max_linesearch_steps=3)
    assert not bool(res_c.stalled)
    assert float(res_c.alpha) < 0.01  # seed (0.5) x 10^-2

    # a healthy run on a quadratic from far away is NOT stalled after one
    # productive outer step capped by nmax
    def f(x):
        return jnp.sum((x - 5.0) ** 2)

    res2 = lbfgs_optimize(f, jnp.zeros((4,), jnp.float32), nmax=1, inner=1,
                          max_linesearch_steps=20)
    assert not bool(res2.stalled)


def test_reg_opt_frame_chunk_matches_unchunked():
    """Reg_opt(frame_chunk=...) slices all threaded per-frame state and
    must reproduce the unchunked call exactly (vmap lanes are
    independent)."""
    import os

    from difficp_tpu.models import gmm as gmm_mod
    from difficp_tpu.models import lddmm as lddmm_mod
    from difficp_tpu.models.psr import DiffPSR

    here = os.path.dirname(__file__)
    spiral = np.load(os.path.join(here, "goldens", "spiral.npz"))
    x = [spiral[f"x{k}"] for k in range(6)]
    lcfg = lddmm_mod.make_config(sigma=0.2, lambd=500.0, version="hybrid",
                                 nt=3, scheme="Euler")

    def build():
        state = gmm_mod.GMMState(
            mu=jnp.asarray(spiral["mu0"]) + 0.01, w=jnp.zeros(20),
            sigma=jnp.asarray(0.1), eta0=jnp.asarray(0.0),
            vol0=jnp.asarray(0.0),
        )
        psr = DiffPSR(x, state, gmm_mod.GMMConfig(), lcfg)
        psr.printstuff = False
        psr.GMM_opt(max_iterations=3, tol=0.0)
        return psr

    a = build()
    b = build()
    for _ in range(2):
        a.Reg_opt(tol=1e-3, nmax=1, inner=4, ls_steps=8,
                  carry_memory=True, carry_value=True)
        b.Reg_opt(tol=1e-3, nmax=1, inner=4, ls_steps=8,
                  carry_memory=True, carry_value=True, frame_chunk=2)
    np.testing.assert_allclose(np.asarray(a.a0), np.asarray(b.a0),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(a.FE, b.FE, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(a._reg_stall),
                                  np.asarray(b._reg_stall))
