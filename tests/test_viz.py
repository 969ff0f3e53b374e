"""Smoke tests for the visualization layer (reference visu.py / grid.py):
every public function renders on the Agg backend without touching a display,
and the grid deformation paths agree with the registration handles."""

import matplotlib

matplotlib.use("Agg")

import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np
import pytest

from difficp_tpu.models import gmm, lddmm
from difficp_tpu.models.registration import LDDMMRegistration
from difficp_tpu.viz.grid import Gridlines
from difficp_tpu.viz.visu import (
    get_bounds, my_scatter, plot_gmm, plot_gmm_clusters, plot_trajectories,
)

rng = np.random.default_rng(0)
PTS = rng.normal(size=(60, 2)).astype(np.float32) * 0.4


@pytest.fixture()
def gmm_state():
    mu = jnp.asarray(PTS[:5])
    state, _ = gmm.create(mu)
    return state


def test_get_bounds_and_scatter():
    xmin, xmax, ymin, ymax = get_bounds(PTS, relmargin=0.1)
    assert xmin < PTS[:, 0].min() and xmax > PTS[:, 0].max()
    assert ymin < PTS[:, 1].min() and ymax > PTS[:, 1].max()
    fig = plt.figure()
    my_scatter(jnp.asarray(PTS))
    plt.close(fig)


def test_plot_gmm_variants(gmm_state):
    fig = plt.figure()
    plot_gmm(gmm_state, jnp.asarray(PTS), heatmap=True)
    plt.close(fig)
    fig = plt.figure()
    plot_gmm(gmm_state, heatmap=False)
    plt.close(fig)
    fig = plt.figure()
    plot_gmm_clusters(gmm_state, jnp.asarray(PTS))
    plt.close(fig)


def test_gridlines_register_and_shoot():
    lcfg = lddmm.make_config(sigma=0.3, lambd=100.0, version="classic",
                             nt=4, scheme="Euler")
    q0 = jnp.asarray(PTS[:20])
    p0 = jnp.asarray(0.05 * rng.normal(size=(20, 2)).astype(np.float32))
    reg = LDDMMRegistration(cfg=lcfg, q0=q0, a0=p0)
    grid = Gridlines(np.linspace(-1, 1, 5), np.linspace(-1, 1, 5),
                     points_per_line=10)
    warped = grid.register(reg)
    pts0 = grid.get_points()
    pts1 = warped.get_points()
    assert pts1.shape == pts0.shape
    # the deformation actually moved the grid, and matches reg.apply
    assert np.abs(pts1 - pts0).max() > 1e-4
    np.testing.assert_allclose(
        pts1, np.asarray(reg.apply(jnp.asarray(pts0))), atol=1e-5
    )
    fig = plt.figure()
    warped.plot()
    plt.close(fig)


def test_plot_trajectories_smoke():
    from difficp_tpu.models.psr import DiffPSR

    x = [PTS[:30], PTS[30:]]
    state, _ = gmm.create(jnp.asarray(PTS[:5]))
    gcfg = gmm.GMMConfig(optimize_eta0=False)
    lcfg = lddmm.make_config(sigma=0.3, lambd=100.0, version="classic",
                             nt=3, scheme="Euler")
    psr = DiffPSR(x, state, gcfg, lcfg)
    psr.printstuff = False
    psr.GMM_opt(max_iterations=3)
    psr.Reg_opt(nmax=1, inner=3, ls_steps=6)
    fig = plt.figure()
    plot_trajectories(psr, k=0)
    plt.close(fig)
