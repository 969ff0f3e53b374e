"""Scale path of the standard algorithm (VERDICT round-1 item 5):

- data_distance rides the backend dispatch (dense == blockwise, gradients
  included);
- the skip_xx flag drops exactly the constant term;
- DiffPSRStd.run() fused loop ~ stepwise Reg_opt/Template_opt alternation
  (same algorithm, one compiled program) with monotone energy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difficp_tpu.models import lddmm as lddmm_mod
from difficp_tpu.models.psr_standard import DiffPSRStd, data_distance
from difficp_tpu.ops import backend as red


@pytest.fixture()
def rng():
    return np.random.default_rng(3)


def _sets(rng, k=2, n=40, ny=25):
    x = [rng.normal(size=(n, 2)).astype(np.float32) * 0.5 for _ in range(k)]
    y = rng.normal(size=(ny, 2)).astype(np.float32) * 0.5
    return x, y


def test_data_distance_backend_parity(rng):
    x = jnp.asarray(rng.normal(size=(60, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(45, 2)), jnp.float32)
    mx = jnp.asarray((np.arange(60) < 50).astype(np.float32))
    w = jnp.asarray(rng.uniform(0.5, 1.5, size=45), jnp.float32) / 45

    def dist(xx, yy):
        return data_distance(xx, yy, 0.4, w=w, mask_x=mx)

    red.set_backend("dense")
    try:
        d_dense = dist(x, y)
        g_dense = jax.grad(lambda yy: dist(x, yy))(y)
    finally:
        red.set_backend(None)
    red.set_backend("blockwise")
    try:
        d_block = dist(x, y)
        g_block = jax.grad(lambda yy: dist(x, yy))(y)
    finally:
        red.set_backend(None)

    assert abs(float(d_dense - d_block)) < 1e-6 * max(1.0, abs(float(d_dense)))
    np.testing.assert_allclose(
        np.asarray(g_dense), np.asarray(g_block), rtol=1e-5, atol=1e-7
    )


def test_skip_xx_is_exactly_the_constant(rng):
    x = jnp.asarray(rng.normal(size=(30, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(20, 2)), jnp.float32)
    full = float(data_distance(x, y, 0.3))
    part = float(data_distance(x, y, 0.3, skip_xx=True))
    other_y = jnp.asarray(rng.normal(size=(20, 2)), jnp.float32)
    full2 = float(data_distance(x, other_y, 0.3))
    part2 = float(data_distance(x, other_y, 0.3, skip_xx=True))
    # the dropped term is independent of y
    assert abs((full - part) - (full2 - part2)) < 1e-6


def _make_psr(rng, support=None):
    x, y = _sets(rng)
    lcfg = lddmm_mod.make_config(
        sigma=0.5, lambd=200.0, version="classic", nt=4
    )
    psr = DiffPSRStd(x, y, noise_std=0.2, lcfg=lcfg, data_sigma=0.3)
    psr.printstuff = False
    if support == "grid":
        psr.set_support_scheme("grid", rho=1.0)
    return psr


@pytest.mark.parametrize("support", [None, "grid"])
def test_fused_run_matches_stepwise(rng, support):
    opts = dict(nmax=3, tol=1e-4)
    psr_a = _make_psr(rng, support)
    e0 = psr_a.E
    for _ in range(2):
        psr_a.Reg_opt(**opts)
        psr_a.Template_opt(**opts)
    assert psr_a.e_increase_events == 0

    psr_b = _make_psr(np.random.default_rng(3), support)
    es = psr_b.run(2, reg_nmax=3, reg_tol=1e-4, tmpl_nmax=3, tmpl_tol=1e-4)
    assert psr_b.e_increase_events == 0
    assert es.shape == (2, 2)
    # fused starts from the same energy and reaches a comparable optimum
    assert es[-1, -1] < e0
    rel = abs(psr_b.E - psr_a.E) / max(abs(psr_a.E), 1e-9)
    assert rel < 0.05, (psr_a.E, psr_b.E)
    # warped templates agree loosely: the fused loop's first registration
    # starts the zoom line search cold (no 1/||g0|| seeding eval inside the
    # scan) so the two optimizers take different but equally valid paths —
    # the energy agreement above is the strong oracle
    da = np.asarray(psr_a.y1)
    db = np.asarray(psr_b.y1)
    assert float(np.mean(np.abs(da - db))) < 0.15


def test_fused_run_zero_iters(rng):
    psr = _make_psr(rng)
    es = psr.run(0)
    assert es.shape == (0, 2)


def test_fused_run_energy_includes_const(rng):
    """run()'s reported E must be directly comparable to update_E's."""
    psr = _make_psr(rng)
    psr.run(1, reg_nmax=2, tmpl_nmax=2)
    e_run = psr.E
    psr.update_datalosses()
    psr.E = None
    psr.update_E()
    assert abs(psr.E - e_run) < 1e-3 * max(1.0, abs(e_run))


def test_stepwise_knobs_and_cached_dataloss(rng):
    """inner/ls_steps knobs on the stepwise methods (the short-program
    regime at scale) keep the energy monotone, and the cached-<fx,fx>
    update_datalosses matches the eager per-(k,s) computation exactly."""
    psr = _make_psr(rng)
    for _ in range(2):
        psr.Reg_opt(nmax=1, tol=1e-3, inner=4, ls_steps=12)
        psr.Template_opt(nmax=1, tol=1e-3, inner=4, ls_steps=12)
    assert psr.e_increase_events == 0

    # cached const + batched ydep == eager full data_distance per (k, s)
    batched = np.asarray(psr.dataloss)
    eager = np.zeros_like(batched)
    for k in range(psr.K):
        for s in range(psr.S):
            eager[k, s] = psr._dataloss_ks(k, s)
    assert np.allclose(batched, eager, rtol=1e-4, atol=1e-6)


def test_stepwise_carry_memory_std(rng):
    """carry_memory on the std stepwise Reg_opt: monotone, memory persists
    across Reg calls and invalidates when the template (= support) moves."""
    psr = _make_psr(rng)
    psr.Reg_opt(nmax=1, tol=1e-3, inner=3, ls_steps=8, carry_memory=True)
    assert psr._reg_memory is not None
    psr.Reg_opt(nmax=1, tol=1e-3, inner=3, ls_steps=8, carry_memory=True)
    assert psr.e_increase_events == 0
    psr.Template_opt(nmax=1, tol=1e-3, inner=3, ls_steps=8)
    # dense support == template: the move re-fits a0 and wipes the memory
    assert psr._reg_memory is None
    psr.Reg_opt(nmax=1, tol=1e-3, inner=3, ls_steps=8, carry_memory=True)
    assert psr.e_increase_events == 0


def test_stepwise_carry_value_std(rng):
    """carry_value on the std stepwise Reg_opt: threaded calls produce the
    same energy trajectory as unthreaded ones, stay monotone, and the pair
    invalidates on every template/support move (grid support included,
    where a0 stays put but the dataloss target moved)."""
    es = {}
    for cv in (False, True):
        psr = _make_psr(np.random.default_rng(7))
        seq = []
        for _ in range(2):
            for _ in range(2):
                psr.Reg_opt(nmax=1, tol=1e-3, inner=3, ls_steps=8,
                            carry_memory=True, carry_value=cv)
                seq.append(psr.E)
            psr.Template_opt(nmax=1, tol=1e-3, inner=3, ls_steps=8)
            seq.append(psr.E)
            if cv:
                assert psr._reg_vg is None  # template moved
        assert psr.e_increase_events == 0
        es[cv] = seq
    np.testing.assert_allclose(es[True], es[False], rtol=1e-5)

    # grid support: Template_opt leaves q0/a0 alone, but the target moved —
    # the vg pair must STILL be invalidated
    psr = _make_psr(np.random.default_rng(7), support="grid")
    psr.Reg_opt(nmax=1, tol=1e-3, inner=3, ls_steps=8, carry_value=True)
    assert psr._reg_vg is not None
    psr.Template_opt(nmax=1, tol=1e-3, inner=3, ls_steps=8)
    assert psr._reg_vg is None
    psr.Reg_opt(nmax=1, tol=1e-3, inner=3, ls_steps=8, carry_value=True)
    assert psr.e_increase_events == 0


def test_template_opt_carry_grid_and_dense_invalidation(rng):
    """Template_opt carry_memory/carry_value: with GRID support the
    objective is unchanged between split template calls (q0/a0 fixed), so
    threaded splits stay monotone and match the unthreaded trajectory; any
    Reg_opt drops the value pair; DENSE support moves q0 with the template
    and must drop everything."""
    es = {}
    for cv in (False, True):
        psr = _make_psr(np.random.default_rng(11), support="grid")
        seq = []
        for _ in range(2):
            for _ in range(2):
                psr.Template_opt(nmax=1, tol=1e-3, inner=3, ls_steps=8,
                                 carry_memory=cv, carry_value=cv)
                seq.append(psr.E)
            psr.Reg_opt(nmax=1, tol=1e-3, inner=3, ls_steps=8)
            seq.append(psr.E)
            if cv:
                assert psr._tmpl_vg is None  # a0 moved
        assert psr.e_increase_events == 0
        es[cv] = seq
    # threading must not change the first split (cold) and keeps the whole
    # trajectory monotone; exact-match is not required once the carried
    # memory deepens the quasi-Newton state (it may legitimately descend
    # FASTER than fresh-memory calls)
    assert es[True][0] == pytest.approx(es[False][0], rel=1e-6)
    assert es[True][-1] <= es[False][-1] + 1e-3 * abs(es[False][-1])

    # dense support: the follow-up moves q0 with the template — carried
    # template state must not survive
    psr = _make_psr(np.random.default_rng(11))
    psr.Template_opt(nmax=1, tol=1e-3, inner=3, ls_steps=8,
                     carry_memory=True, carry_value=True)
    assert psr._tmpl_vg is None or all(v is None for v in psr._tmpl_vg)
    assert psr._tmpl_mem is None or all(m is None for m in psr._tmpl_mem)
    psr.Template_opt(nmax=1, tol=1e-3, inner=3, ls_steps=8,
                     carry_memory=True, carry_value=True)
    assert psr.e_increase_events == 0
