"""GMM EM tests: golden parity with the torch reference, masking, and the
free-energy monotonicity oracle (reference PSR.py:234-235 / SURVEY §4.3)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difficp_tpu.models import gmm

GOLD = os.path.join(os.path.dirname(__file__), "goldens", "gmm.npz")
G = np.load(GOLD)


def make_state(use_out):
    state = gmm.GMMState(
        mu=jnp.asarray(G["mu0"]),
        w=jnp.asarray(G["w0"]),
        sigma=jnp.asarray(float(G["sigma0"])),
        eta0=jnp.asarray(-1.0 if use_out else 0.0),
        vol0=jnp.asarray(float(G["out_vol0"]) if use_out else 0.0),
    )
    cfg = gmm.GMMConfig(use_outliers=use_out)
    return state, cfg


@pytest.mark.parametrize("use_out", [False, True])
def test_skipM_values_match_reference(use_out):
    tag = "out" if use_out else "noout"
    state, cfg = make_state(use_out)
    out = gmm.em_step(state, jnp.asarray(G["x"]), None, cfg, skip_m=True)
    np.testing.assert_allclose(out.y, G[f"{tag}_skipM_Y"], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        float(out.cfe), float(G[f"{tag}_skipM_Cfe"]), rtol=2e-4
    )
    np.testing.assert_allclose(float(out.fe), float(G[f"{tag}_skipM_FE"]), rtol=2e-4)


@pytest.mark.parametrize("use_out", [False, True])
def test_M_step_matches_reference(use_out):
    tag = "out" if use_out else "noout"
    state, cfg = make_state(use_out)
    out = gmm.em_step(state, jnp.asarray(G["x"]), None, cfg)
    np.testing.assert_allclose(out.state.mu, G[f"{tag}_M_mu"], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        float(out.state.sigma), float(G[f"{tag}_M_sigma"]), rtol=2e-4
    )
    # w is defined up to an additive constant in the reference; compare log-pis
    lpi_ours = np.asarray(jax.nn.log_softmax(out.state.w))
    wg = G[f"{tag}_M_w"]
    lpi_ref = wg - np.log(np.exp(wg).sum())
    np.testing.assert_allclose(lpi_ours, lpi_ref, rtol=2e-3, atol=2e-4)
    if use_out:
        np.testing.assert_allclose(
            float(out.state.eta0), float(G[f"{tag}_M_eta0"]), rtol=2e-3, atol=2e-4
        )
    np.testing.assert_allclose(out.y, G[f"{tag}_M_Y"], rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("use_out", [False, True])
def test_em_iterations_track_reference(use_out):
    tag = "out" if use_out else "noout"
    state, cfg = make_state(use_out)
    x = jnp.asarray(G["x"])
    fes = []
    for _ in range(20):
        out = gmm.em_step(state, x, None, cfg)
        state = out.state
        fes.append(float(out.fe))
    ref = G[f"{tag}_FE_seq"]
    # The torch reference evaluates the Gaussian-norm part of Cfe at the
    # pre-M-step sigma (GMM.py:264 vs 313), while we use the updated sigma
    # consistently (as the reference's keops path does, GMM.py:483).  While
    # sigma still drifts the two FE bookkeepings differ by ~N*D*dlog(sigma);
    # compare with a matching tolerance.  Parameters must agree tightly.
    np.testing.assert_allclose(fes[-1], ref[-1], rtol=5e-3)
    np.testing.assert_allclose(state.mu, G[f"{tag}_final_mu"], rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(
        float(state.sigma), float(G[f"{tag}_final_sigma"]), rtol=1e-3
    )
    # monotone decrease (the reference's invariant) with float32 tolerance
    fes = np.asarray(fes)
    assert np.all(fes[1:] <= fes[:-1] + 1e-3 * np.abs(fes[:-1]) + 1e-4)


def test_masked_em_equals_subset():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(60, 2)).astype(np.float32)
    mask = (rng.uniform(size=60) > 0.4).astype(np.float32)
    idx = np.nonzero(mask)[0]
    state, cfg = make_state(False)

    out_m = gmm.em_step(state, jnp.asarray(x), jnp.asarray(mask), cfg)
    out_s = gmm.em_step(state, jnp.asarray(x[idx]), None, cfg)
    np.testing.assert_allclose(out_m.state.mu, out_s.state.mu, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        float(out_m.state.sigma), float(out_s.state.sigma), rtol=1e-5
    )
    np.testing.assert_allclose(float(out_m.fe), float(out_s.fe), rtol=1e-4)
    np.testing.assert_allclose(out_m.y[idx], out_s.y, rtol=1e-4, atol=1e-5)


def test_em_optimization_converges_and_counts():
    state, cfg = make_state(False)
    out = gmm.em_optimization(state, jnp.asarray(G["x"]), None, cfg, 100, 1e-4)
    assert int(out.n_iters) <= 100
    # FE at/below the reference's 20-step value (we run at least as far)
    assert float(out.fe) <= float(G["noout_FE_seq"][-1]) + 0.5
    # a quick-tolerance run stops early
    out2 = gmm.em_optimization(state, jnp.asarray(G["x"]), None, cfg, 100, 1e-2)
    assert int(out2.n_iters) < 20


def test_kmeans_limit():
    """sigma -> 0 limit: EM with tiny fixed sigma behaves like K-means
    (reference GMM.py:861-891 demo)."""
    rng = np.random.default_rng(5)
    centers = np.array([[0.0, 0.0], [3.0, 0.0], [0.0, 3.0]], np.float32)
    x = np.concatenate(
        [c + 0.05 * rng.normal(size=(50, 2)).astype(np.float32) for c in centers]
    )
    state = gmm.GMMState(
        mu=jnp.asarray(centers + 0.3),
        w=jnp.zeros(3),
        sigma=jnp.asarray(1e-2),
        eta0=jnp.asarray(0.0),
        vol0=jnp.asarray(0.0),
    )
    cfg = gmm.GMMConfig(optimize_sigma=False, optimize_w=False)
    for _ in range(10):
        out = gmm.em_step(state, jnp.asarray(x), None, cfg)
        state = out.state
    want = np.stack([x[i * 50 : (i + 1) * 50].mean(0) for i in range(3)])
    np.testing.assert_allclose(state.mu, want, atol=1e-3)


def test_sampling_and_loglik():
    state, cfg = make_state(False)
    key = jax.random.PRNGKey(0)
    s = gmm.sample(state, key, 500)
    assert s.shape == (500, 2)
    ll = gmm.log_likelihoods(state, s)
    assert np.isfinite(np.asarray(ll)).all()
    # density integrates to ~1 over a grid (normalization check)
    g = np.linspace(-4, 4, 200, dtype=np.float32)
    xx, yy = np.meshgrid(g, g)
    pts = np.stack([xx.ravel(), yy.ravel()], 1)
    dens = np.asarray(gmm.likelihoods(state, jnp.asarray(pts)))
    integral = dens.sum() * (g[1] - g[0]) ** 2
    assert abs(integral - 1.0) < 2e-2


def test_symm_kl_positive():
    state, cfg = make_state(False)
    other = state._replace(mu=state.mu + 0.5)
    div = gmm.symm_kl_div(state, other, jax.random.PRNGKey(1))
    assert float(div) > 0
