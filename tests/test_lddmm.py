"""LDDMM tests: golden parity with the torch reference shoot/Hamiltonian,
plus the reference's property checks (v2p round trip, time-reversal,
version consistency — reference LDDMM.py:777-824, registrations.py:66-69)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difficp_tpu.models import lddmm

GOLD = os.path.join(os.path.dirname(__file__), "goldens", "lddmm.npz")
G = np.load(GOLD)

Q0 = jnp.asarray(G["q0"])
P0 = jnp.asarray(G["p0"])
X0 = jnp.asarray(G["x0"])

VERSIONS = ["classic", "logdet", "hybrid"]
SCHEMES = ["Euler", "Ralston"]


def cfg_for(version, scheme):
    return lddmm.make_config(sigma=0.4, lambd=3.0, version=version,
                             nt=10, scheme=scheme)


@pytest.mark.parametrize("version", VERSIONS)
def test_hamiltonian_matches_reference(version):
    cfg = cfg_for(version, "Euler")
    h = lddmm.hamiltonian(cfg, Q0, P0)
    np.testing.assert_allclose(float(h), float(G[f"{version}_Euler_H"]), rtol=2e-4)


@pytest.mark.parametrize("version", VERSIONS)
@pytest.mark.parametrize("scheme", SCHEMES)
def test_shoot_matches_reference(version, scheme):
    cfg = cfg_for(version, scheme)
    tag = f"{version}_{scheme}"
    final, _ = lddmm.shoot(cfg, Q0, P0)
    np.testing.assert_allclose(final.q, G[f"{tag}_q1"], rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(final.p, G[f"{tag}_p1"], rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(
        float(final.cost), float(G[f"{tag}_cost1"]), rtol=1e-3, atol=2e-4
    )
    tl = lddmm.trajloss(cfg, Q0, P0, final.cost)
    np.testing.assert_allclose(float(tl), float(G[f"{tag}_trajloss"]), rtol=1e-3)

    final_x, _ = lddmm.shoot(cfg, Q0, P0, X0)
    np.testing.assert_allclose(final_x.x, G[f"{tag}_x1"], rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(
        float(final_x.cost), float(G[f"{tag}_costx1"]), rtol=1e-3, atol=2e-4
    )


def test_v2p_matches_reference():
    cfg = cfg_for("classic", "Euler")
    p = lddmm.v2p(cfg, Q0, jnp.asarray(G["v2p_v"]), rcond=1e-3)
    # pseudo-inverse of an ill-conditioned matrix: compare the *effect*
    # (reconstructed speeds), not the raw momenta
    v_ref = lddmm.v(cfg, Q0, Q0, jnp.asarray(G["v2p_p"]))
    v_ours = lddmm.v(cfg, Q0, Q0, p)
    np.testing.assert_allclose(v_ours, v_ref, rtol=5e-2, atol=5e-3)


def test_v2p_v_round_trip():
    """v2p(v(p)) reconstructs the speeds (reference LDDMM.py:810-818)."""
    cfg = cfg_for("logdet", "Euler")
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=Q0.shape).astype(np.float32) * 0.1)
    v0 = lddmm.v(cfg, Q0, Q0, p)
    p2 = lddmm.v2p(cfg, Q0, v0, rcond=1e-6)
    v1 = lddmm.v(cfg, Q0, Q0, p2)
    np.testing.assert_allclose(v1, v0, rtol=1e-2, atol=1e-3)


def test_time_reversal_inverse():
    """Shooting from (q1, -p1) returns to q0 (reference registrations.py:66-69:
    backward registration = shoot from arrival with negated momenta)."""
    cfg = cfg_for("classic", "Ralston")
    final, _ = lddmm.shoot(cfg, Q0, 0.5 * P0)
    back, _ = lddmm.shoot(cfg, final.q, -final.p)
    np.testing.assert_allclose(back.q, Q0, atol=2e-3)


def test_trajloss_version_consistency():
    """classic trajloss = lam*H; logdet adds divcost; hybrid = classic field
    with logdet cost (reference LDDMM.py:786-806)."""
    cfg_c = cfg_for("classic", "Euler")
    cfg_h = cfg_for("hybrid", "Euler")
    f_c, _ = lddmm.shoot(cfg_c, Q0, P0)
    f_h, _ = lddmm.shoot(cfg_h, Q0, P0)
    # same vector field -> same trajectory
    np.testing.assert_allclose(f_c.q, f_h.q, rtol=1e-5)
    tl_c = lddmm.trajloss(cfg_c, Q0, P0, f_c.cost)
    tl_h = lddmm.trajloss(cfg_h, Q0, P0, f_h.cost)
    # hybrid = classic + divcost
    np.testing.assert_allclose(
        float(tl_h) - float(tl_c), float(f_h.cost), rtol=1e-4, atol=1e-4
    )


def test_masked_shoot_equals_subset():
    cfg = cfg_for("logdet", "Ralston")
    rng = np.random.default_rng(1)
    m = Q0.shape[0]
    mask = (rng.uniform(size=m) > 0.3).astype(np.float32)
    idx = np.nonzero(mask)[0]
    p_masked = P0 * mask[:, None]
    xmask = np.ones(X0.shape[0], np.float32)

    f_m, _ = lddmm.shoot(cfg, Q0, p_masked, X0, jnp.asarray(mask), jnp.asarray(xmask))
    f_s, _ = lddmm.shoot(cfg, Q0[idx], P0[idx], X0)
    np.testing.assert_allclose(f_m.q[idx], f_s.q, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(f_m.x, f_s.x, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(f_m.cost), float(f_s.cost), rtol=1e-3, atol=1e-3)
    h_m = lddmm.hamiltonian(cfg, Q0, p_masked, jnp.asarray(mask))
    h_s = lddmm.hamiltonian(cfg, Q0[idx], P0[idx])
    np.testing.assert_allclose(float(h_m), float(h_s), rtol=1e-4, atol=1e-5)


def test_grad_through_shoot_matches_fd():
    """jax.grad through the scan-based shoot vs central finite differences."""
    cfg = lddmm.make_config(sigma=0.4, lambd=3.0, version="logdet", nt=5,
                            scheme="Euler")
    y_t = Q0 + 0.05

    def loss(p):
        final, _ = lddmm.shoot(cfg, Q0, p)
        return lddmm.trajloss(cfg, Q0, p, final.cost) + jnp.sum(
            (final.q - y_t) ** 2
        )

    g = jax.grad(loss)(P0)
    rng = np.random.default_rng(2)
    for _ in range(3):
        dp = rng.normal(size=P0.shape).astype(np.float32)
        eps = 1e-3
        fd = (float(loss(P0 + eps * dp)) - float(loss(P0 - eps * dp))) / (2 * eps)
        an = float(jnp.sum(g * dp))
        assert abs(fd - an) < 2e-2 * max(1.0, abs(an))


def test_optimize_decreases_loss_and_fits():
    """End-to-end registration of a point set onto a shifted copy."""
    cfg = lddmm.make_config(sigma=0.5, lambd=1.0, version="classic", nt=8,
                            scheme="Euler")
    target = Q0 + jnp.asarray([0.3, -0.2])

    def dataloss(pts):
        return 10.0 * jnp.sum((pts - target) ** 2)

    p_init = jnp.zeros_like(Q0)
    res = lddmm.optimize(cfg, dataloss, Q0, p_init, nmax=6, tol=1e-4)
    loss0 = float(dataloss(Q0))
    loss1 = float(res.datal)
    assert loss1 < 0.05 * loss0
    assert float(res.trajl) > 0.0


def test_random_p_prior_scale():
    cfg = lddmm.make_config(sigma=0.4, lambd=3.0, version="classic", nt=10)
    key = jax.random.PRNGKey(0)
    ps = jax.vmap(lambda k: lddmm.random_p(cfg, Q0, k, version="ridge", alpha=0.1))(
        jax.random.split(key, 64)
    )
    hs = jax.vmap(lambda p: lddmm.hamiltonian(cfg, Q0, p))(ps)
    # E[lambda * H] should be ~ M*D/2 per sample for the exact prior;
    # with ridge regularization it is below that, but the right order
    md_half = Q0.shape[0] * Q0.shape[1] / 2
    mean_lh = float(jnp.mean(cfg.lambd * hs))
    assert 0.02 * md_half < mean_lh < 8.0 * md_half


def test_lbfgs_divergence_recovery():
    """A loss that turns NaN away from the origin: the optimizer must
    return finite best-seen params (reference optim.py:60-97 contract)."""
    from difficp_tpu.utils.lbfgs import lbfgs_optimize

    def nasty(p):
        l = jnp.sum((p - 0.3) ** 2)
        # NaN cliff away from the start: overshooting line searches diverge
        return jnp.where(l < 1.0, l, jnp.nan)

    p0 = jnp.zeros((4, 2))  # finite start (l = 0.72), optimum inside the ball
    res = lbfgs_optimize(nasty, p0, nmax=4, inner=5, tol=1e-6)
    assert np.isfinite(float(res.loss))
    assert np.isfinite(np.asarray(res.params)).all()
    assert float(res.loss) <= float(nasty(p0))
