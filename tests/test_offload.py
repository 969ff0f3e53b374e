"""Host-offload atlas (models/offload.py — the reference's
compspec/dataspec split, PSR.py:46-63): streaming chunked EM + registration
must match the all-on-device DiffPSR computation and keep the free energy
monotone; chunking must not change the result."""

import os

import numpy as np
import jax.numpy as jnp

from difficp_tpu.models import gmm as gmm_mod
from difficp_tpu.models import lddmm as lddmm_mod
from difficp_tpu.models.offload import HostOffloadAtlas

HERE = os.path.dirname(__file__)
SPIRAL = np.load(os.path.join(HERE, "goldens", "spiral.npz"))
X = [SPIRAL[f"x{k}"] for k in range(8)]


def make_gmm():
    state = gmm_mod.GMMState(
        mu=jnp.asarray(SPIRAL["mu0"]) + 0.01,
        w=jnp.zeros(20),
        sigma=jnp.asarray(0.1),
        eta0=jnp.asarray(0.0),
        vol0=jnp.asarray(0.0),
    )
    return state, gmm_mod.GMMConfig()


LCFG = lddmm_mod.make_config(sigma=0.2, lambd=500.0, version="hybrid",
                             nt=3, scheme="Euler")
RUN_KW = dict(max_em=4, em_tol=0.0, reg_nmax=1, reg_inner=8, reg_ls=8)


def run_offload(chunk):
    state, gcfg = make_gmm()
    atlas = HostOffloadAtlas(X, state, gcfg, LCFG, chunk_frames=chunk)
    fes = atlas.run(2, **RUN_KW)
    return atlas, fes


def test_offload_monotone_and_chunk_invariant():
    atlas4, fes4 = run_offload(4)
    atlas8, fes8 = run_offload(8)
    assert atlas4.fe_increase_events == 0
    assert atlas8.fe_increase_events == 0
    # chunking reorders the EM's partial float sums, which nudges the GMM
    # targets by ~eps; the line search's binary decisions (Armijo /
    # progress gates) can amplify an eps objective difference into a
    # visibly different (still monotone, still converging) step sequence —
    # measured 0.16% FE divergence after 2 iterations once the r5 adaptive
    # trial-scale gates landed.  The invariant worth asserting is
    # same-trajectory-class, not bitwise-equal optimization.
    np.testing.assert_allclose(fes4, fes8, rtol=5e-3)
    # the functional invariant: both chunkings register the frames to the
    # same warped configuration (raw momenta are NOT elementwise stable
    # across diverged-but-equivalent step sequences)
    np.testing.assert_allclose(
        np.asarray(atlas4.x1[: atlas4.K]), np.asarray(atlas8.x1[: atlas8.K]),
        rtol=5e-2, atol=5e-3,
    )


def test_offload_matches_diffpsr():
    from difficp_tpu.models.psr import DiffPSR

    atlas, fes = run_offload(4)

    state, gcfg = make_gmm()
    psr = DiffPSR(X, state, gcfg, LCFG)
    psr.printstuff = False
    for _ in range(2):
        psr.GMM_opt(max_iterations=RUN_KW["max_em"], tol=0.0)
        psr.Reg_opt(tol=1e-3, nmax=RUN_KW["reg_nmax"],
                    inner=RUN_KW["reg_inner"], ls_steps=RUN_KW["reg_ls"])

    assert psr.fe_increase_events == 0
    np.testing.assert_allclose(fes[-1], psr.FE, rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(atlas.x1[: atlas.K]), np.asarray(psr.x1), rtol=5e-2,
        atol=5e-3,
    )


def _multi_structure_data(k=6, seed=0):
    """K frames x S=2 structures (spiral subset + a shifted circle),
    ragged sizes."""
    rng = np.random.default_rng(seed)
    x = []
    for kk in range(k):
        s0 = SPIRAL[f"x{kk}"][: 60 + 5 * kk]
        th = rng.uniform(0, 2 * np.pi, 40 + 3 * kk).astype(np.float32)
        s1 = np.stack([1.5 + 0.3 * np.cos(th), 1.5 + 0.3 * np.sin(th)], 1)
        s1 = s1 + 0.02 * rng.standard_normal(s1.shape).astype(np.float32)
        x.append([s0, s1.astype(np.float32)])
    return x


def test_offload_multistructure_grid_support_matches_diffpsr():
    """S=2 structures + grid support: the streamed host-offload driver ==
    DiffPSR (the reference compspec/dataspec generality, PSR.py:46-63 with
    PSR.py:430-493 support schemes)."""
    from difficp_tpu.models.psr import DiffPSR

    x = _multi_structure_data()
    states_cfgs = [make_gmm(), make_gmm()]
    states = [sc[0] for sc in states_cfgs]
    cfgs = [sc[1] for sc in states_cfgs]

    atlas = HostOffloadAtlas(x, states, cfgs, LCFG, chunk_frames=3)
    atlas.set_support_scheme("grid", rho=1.5)
    fes = atlas.run(2, **RUN_KW)
    assert atlas.fe_increase_events == 0

    psr = DiffPSR(x, states, cfgs, LCFG)
    psr.printstuff = False
    psr.set_support_scheme("grid", rho=1.5)
    for _ in range(2):
        psr.GMM_opt(max_iterations=RUN_KW["max_em"], tol=0.0)
        psr.Reg_opt(tol=1e-3, nmax=RUN_KW["reg_nmax"],
                    inner=RUN_KW["reg_inner"], ls_steps=RUN_KW["reg_ls"])
    assert psr.fe_increase_events == 0
    np.testing.assert_allclose(fes[-1], psr.FE, rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(atlas.x1[: atlas.K]), np.asarray(psr.x1), rtol=5e-2,
        atol=5e-3,
    )


def test_offload_decim_support_runs_monotone():
    x = _multi_structure_data(k=4)
    states_cfgs = [make_gmm(), make_gmm()]
    atlas = HostOffloadAtlas(x, [sc[0] for sc in states_cfgs],
                             [sc[1] for sc in states_cfgs], LCFG,
                             chunk_frames=4)
    atlas.set_support_scheme("decim", rho=2.0)
    atlas.run(2, **RUN_KW)
    assert atlas.fe_increase_events == 0
