"""Parity tests for the tiled/streaming reduction families added in round 2
(SURVEY §2.5 families 2-3): blockwise + pallas Kmin/top-2 vs the dense
reference, and the tile-scanned GMM E-step vs the dense EM step."""

import numpy as np
import jax.numpy as jnp
import pytest

from difficp_tpu.models import gmm as gmm_mod
from difficp_tpu.ops import backend as backend_mod
from difficp_tpu.ops import blockwise as block
from difficp_tpu.ops import reductions as dense
from difficp_tpu.ops.pallas_reductions import kmin2_pallas


@pytest.fixture(autouse=True)
def _reset_backend():
    yield
    backend_mod.set_backend(None)


def make_points(n, d=2, seed=0, with_dup=True):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    if with_dup:
        x[n // 2] = x[0]  # exact duplicate: tie-robustness of top-2
    mask = (rng.uniform(size=n) > 0.15).astype(np.float32)
    mask[0] = 1.0
    mask[n // 2] = 1.0
    return jnp.asarray(x), jnp.asarray(mask)


def dense_top2(x, y, mask_y, exclude_self):
    d2 = np.sum(
        (np.asarray(x)[:, None, :] - np.asarray(y)[None, :, :]) ** 2, -1
    )
    d2 = np.where(np.asarray(mask_y)[None, :] > 0, d2, np.inf)
    if exclude_self:
        np.fill_diagonal(d2, np.inf)
    s = np.sort(d2, axis=1)
    return s[:, 0], s[:, 1]


@pytest.mark.parametrize("d", [2, 3])
def test_blockwise_min_sqdist_matches_dense(d):
    x, mx = make_points(130, d, seed=1)
    y, my = make_points(275, d, seed=2)
    got = block.min_sqdist(x, y, my, tile=64)
    want = dense.min_sqdist(x, y, my)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


@pytest.mark.parametrize("d", [2, 3])
def test_blockwise_second_min_matches_dense(d):
    x, mx = make_points(201, d, seed=3)
    got = block.second_min_sqdist(x, mx, tile=64)
    want = dense.second_min_sqdist(x, mx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_blockwise_second_min_tie_duplicate():
    """Exact duplicate points: nearest-excluding-self distance must be 0."""
    x, m = make_points(64, 2, seed=4, with_dup=True)
    got = np.asarray(block.second_min_sqdist(x, m, tile=16))
    assert got[0] == 0.0 and got[32] == 0.0


@pytest.mark.parametrize("exclude_self", [False, True])
def test_pallas_kmin2_matches_dense(exclude_self):
    x, mx = make_points(150, 2, seed=5)
    if exclude_self:
        y, my = x, mx
    else:
        y, my = make_points(330, 2, seed=6)
    m1, m2 = kmin2_pallas(x, y, my, exclude_self=exclude_self, ti=64, tj=128)
    w1, w2 = dense_top2(x, y, my, exclude_self)
    np.testing.assert_allclose(np.asarray(m1), w1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m2), w2, rtol=1e-6)


def test_backend_dispatch_forced_modes(monkeypatch):
    x, m = make_points(100, 2, seed=7)
    want = np.asarray(dense.second_min_sqdist(x, m))

    backend_mod.set_backend("blockwise")
    np.testing.assert_allclose(
        np.asarray(backend_mod.second_min_sqdist(x, m)), want, rtol=1e-6
    )
    backend_mod.set_backend("pallas")
    np.testing.assert_allclose(
        np.asarray(backend_mod.second_min_sqdist(x, m)), want, rtol=1e-6
    )
    backend_mod.set_backend("dense")
    np.testing.assert_allclose(
        np.asarray(backend_mod.second_min_sqdist(x, m)), want, rtol=1e-6
    )


def test_backend_check_coverage_matches_dense():
    x, mx = make_points(90, 2, seed=8)
    y, my = make_points(40, 2, seed=9)
    want = np.asarray(dense.check_coverage(x, y, 0.3, 2.0, mx, my))
    backend_mod.set_backend("blockwise")
    got = np.asarray(backend_mod.check_coverage(x, y, 0.3, 2.0, mx, my))
    np.testing.assert_array_equal(got, want)


def test_intrinsic_scale_large_uses_tiled_path():
    """intrinsic_scale works beyond the dense pair limit (no (N,N) buffer)."""
    from difficp_tpu.utils.point_sets import intrinsic_scale

    x, m = make_points(400, 2, seed=10, with_dup=False)
    ref = float(intrinsic_scale(x, m))
    backend_mod.set_backend("blockwise")
    got = float(intrinsic_scale(x, m))
    assert abs(got - ref) < 1e-6 * max(abs(ref), 1.0)


@pytest.mark.parametrize("use_outliers", [False, True])
@pytest.mark.parametrize("skip_m", [False, True])
def test_tiled_em_matches_dense(use_outliers, skip_m):
    rng = np.random.default_rng(11)
    n, c, d = 333, 7, 2  # n deliberately not a tile multiple
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=n) > 0.2).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    state = gmm_mod.GMMState(
        mu=mu, w=jnp.zeros(c), sigma=jnp.asarray(0.5),
        eta0=jnp.asarray(-1.0), vol0=jnp.asarray(0.0),
    )
    if use_outliers:
        state = gmm_mod.set_vol0(state, x, mask)
    cfg = gmm_mod.GMMConfig(use_outliers=use_outliers)

    ref = gmm_mod.em_step(state, x, mask, cfg, skip_m=skip_m)
    got = gmm_mod.em_step(state, x, mask, cfg, skip_m=skip_m, tile=64)

    np.testing.assert_allclose(got.state.mu, ref.state.mu, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        float(got.state.sigma), float(ref.state.sigma), rtol=1e-6
    )
    np.testing.assert_allclose(got.y, ref.y, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got.gamt, ref.gamt, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(got.cfe), float(ref.cfe), rtol=1e-5)
    np.testing.assert_allclose(float(got.fe), float(ref.fe), rtol=1e-5)


def test_tiled_em_auto_dispatch(monkeypatch):
    """Above the dense limit the auto path uses tiles (spy on the tiled fn)."""
    calls = {"n": 0}
    orig = gmm_mod._em_step_tiled

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(gmm_mod, "_em_step_tiled", spy)
    monkeypatch.setattr(
        backend_mod, "DENSE_PAIR_LIMIT", 100, raising=True
    )
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(64, 2)).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=(4, 2)).astype(np.float32))
    state = gmm_mod.GMMState(mu=mu, w=jnp.zeros(4), sigma=jnp.asarray(0.5),
                             eta0=jnp.asarray(0.0), vol0=jnp.asarray(0.0))
    gmm_mod.em_step(state, x, None, gmm_mod.GMMConfig())
    assert calls["n"] == 1
