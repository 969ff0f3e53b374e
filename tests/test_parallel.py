"""Sharding-equivalence tests on the virtual 8-device CPU mesh:
frame-sharded EM and the fused atlas train step must match the
single-device computation (SURVEY §4.6)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difficp_tpu.models import gmm as gmm_mod
from difficp_tpu.models import lddmm as lddmm_mod
from difficp_tpu.parallel.atlas import (
    em_step_frames_sharded,
    make_atlas_train_step,
    make_mesh,
    shard_psr,
)
from difficp_tpu.utils.io import pad_frames

HERE = os.path.dirname(__file__)
SPIRAL = np.load(os.path.join(HERE, "goldens", "spiral.npz"))

K = 8
FRAMES = pad_frames([SPIRAL[f"x{k}"] for k in range(8)])


def make_gmm():
    state = gmm_mod.GMMState(
        mu=jnp.asarray(SPIRAL["mu0"]) + 0.01,
        w=jnp.zeros(20),
        sigma=jnp.asarray(0.1),
        eta0=jnp.asarray(0.0),
        vol0=jnp.asarray(0.0),
    )
    return state, gmm_mod.GMMConfig()


def test_sharded_em_matches_single_device():
    state, cfg = make_gmm()
    mesh = make_mesh(8)

    st_sh, y_sh, cfe_sh, fe_sh = em_step_frames_sharded(
        state, FRAMES.x, FRAMES.mask, cfg, mesh
    )

    k, n, d = FRAMES.x.shape
    out = gmm_mod.em_step(
        state, FRAMES.x.reshape(k * n, d), FRAMES.mask.reshape(k * n), cfg
    )
    np.testing.assert_allclose(st_sh.mu, out.state.mu, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        float(st_sh.sigma), float(out.state.sigma), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(y_sh).reshape(k * n, d), out.y, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(float(fe_sh), float(out.fe), rtol=1e-4)


def test_atlas_train_step_sharded_matches_unsharded():
    state, gcfg = make_gmm()
    lcfg = lddmm_mod.make_config(sigma=0.2, lambd=500.0, version="hybrid",
                                 nt=5, scheme="Euler")
    mesh8 = make_mesh(8)
    mesh1 = make_mesh(1)

    q0 = FRAMES.x  # dense support = data points; use_ext=False
    a0 = jnp.zeros_like(q0)
    step8 = make_atlas_train_step(gcfg, lcfg, mesh8, em_iters=3, reg_nmax=1,
                                  use_ext=False)
    step1 = make_atlas_train_step(gcfg, lcfg, mesh1, em_iters=3, reg_nmax=1,
                                  use_ext=False)

    out8 = step8(state, q0, a0, FRAMES.x, FRAMES.x, FRAMES.mask, FRAMES.mask)
    out1 = step1(state, q0, a0, FRAMES.x, FRAMES.x, FRAMES.mask, FRAMES.mask)

    np.testing.assert_allclose(out8.gmm.mu, out1.gmm.mu, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        float(out8.gmm.sigma), float(out1.gmm.sigma), rtol=1e-5
    )
    # L-BFGS line searches amplify cross-device reduction-order noise;
    # warped points agree to optimizer tolerance, energies tightly
    np.testing.assert_allclose(out8.x1, out1.x1, rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(float(out8.fe), float(out1.fe), rtol=2e-3)


def test_shard_psr_runs_and_matches():
    """DiffPSR with sharded per-frame arrays produces the same FE as
    unsharded (jit auto-partitioner path)."""
    from difficp_tpu.models.psr import DiffPSR

    state, gcfg = make_gmm()
    lcfg = lddmm_mod.make_config(sigma=0.2, lambd=500.0, version="hybrid",
                                 nt=5, scheme="Euler")
    x = [SPIRAL[f"x{k}"] for k in range(8)]

    psr_a = DiffPSR(x, state, gcfg, lcfg)
    psr_a.printstuff = False
    psr_b = DiffPSR(x, state, gcfg, lcfg)
    psr_b.printstuff = False
    shard_psr(psr_b, make_mesh(8))

    for psr in (psr_a, psr_b):
        psr.GMM_opt(max_iterations=5, tol=1e-4)
        psr.Reg_opt(tol=1e-3, nmax=1)

    assert abs(psr_a.FE - psr_b.FE) < 1e-3 * abs(psr_a.FE)
    # weak oracle: momenta agree loosely.  sharded psum vs serial sum
    # rounding differs, and the line search's discrete decisions (bracket
    # vs zoom, cubic vs bisect) amplify it on a few points — FE equality
    # above is the strong oracle.
    np.testing.assert_allclose(
        np.asarray(psr_b.a0), np.asarray(psr_a.a0), rtol=5e-2, atol=1e-2
    )


def test_ring_rhs_matches_single_device():
    """Point-sharded ring reduction == dense single-device RHS."""
    from difficp_tpu.ops import reductions as R
    from difficp_tpu.parallel.ring import make_ring_shoot, ring_rhs_self
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(8, axis="points")
    rng = np.random.default_rng(0)
    m = 8 * 32
    q = jnp.asarray(rng.normal(size=(m, 2)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(m, 2)).astype(np.float32) * 0.2)
    mask = jnp.asarray((rng.uniform(size=m) > 0.2).astype(np.float32))

    fn = jax.jit(
        jax.shard_map(
            lambda q, p, mk: ring_rhs_self(q, p, mk, 0.5, True, "points"),
            mesh=mesh,
            in_specs=(P("points"), P("points"), P("points")),
            out_specs=(P("points"), P("points"), P()),
            check_vma=False,
        )
    )
    vq, mgq, dc = fn(q, p * mask[:, None], mask)
    vq_d, mgq_d, dc_d = R.lddmm_rhs_self(q, p * mask[:, None], 0.5, 0.0, True, mask)
    np.testing.assert_allclose(np.asarray(vq), np.asarray(vq_d), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mgq), np.asarray(mgq_d), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(dc), float(dc_d), rtol=1e-3, atol=1e-4)


def test_ring_shoot_matches_single_device():
    from difficp_tpu.models import lddmm as lddmm_mod
    from difficp_tpu.parallel.ring import make_ring_shoot

    mesh = make_mesh(8, axis="points")
    rng = np.random.default_rng(1)
    m = 8 * 16
    q = jnp.asarray(rng.normal(size=(m, 2)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(m, 2)).astype(np.float32) * 0.1)
    mask = jnp.ones((m,), jnp.float32)

    shoot_fn = make_ring_shoot(0.5, 100.0, True, nt=5, mesh=mesh, scheme="Euler")
    q1, p1, cost = shoot_fn(q, p, mask)

    lcfg = lddmm_mod.make_config(sigma=0.5, lambd=100.0, version="hybrid",
                                 nt=5, scheme="Euler")
    final, _ = lddmm_mod.shoot(lcfg, q, p)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(final.q), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(float(cost), float(final.cost), rtol=1e-3,
                               atol=1e-4)


def test_atlas_step_alpha_and_memory_threading():
    """r4: the frame-sharded atlas step threads per-frame warm-start step
    sizes and (carry_memory) the batched curvature memory across steps —
    monotone FE, and the carried sequence reaches at-least-as-good FE at an
    identical budget (the single-chip run(carry_memory=True) parity)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from difficp_tpu.models import gmm as gmm_mod
    from difficp_tpu.models import lddmm as lddmm_mod
    from difficp_tpu.parallel.atlas import (
        make_atlas_train_step, make_mesh, zero_atlas_memory,
    )

    rng = np.random.default_rng(5)
    k, n, c, d = 8, 24, 5, 2
    x = jnp.asarray(rng.normal(size=(k, n, d)), jnp.float32)
    mask = jnp.ones((k, n), jnp.float32)
    gstate = gmm_mod.GMMState(
        mu=jnp.asarray(rng.normal(size=(c, d)), jnp.float32),
        w=jnp.zeros((c,), jnp.float32),
        sigma=jnp.asarray(0.5, jnp.float32),
        eta0=jnp.asarray(0.0, jnp.float32),
        vol0=jnp.asarray(0.0, jnp.float32),
    )
    gcfg = gmm_mod.GMMConfig()
    lcfg = lddmm_mod.make_config(sigma=0.5, lambd=100.0, version="hybrid",
                                 nt=3, scheme="Euler")
    mesh = make_mesh(8)
    fsh = NamedSharding(mesh, P("frames"))
    x = jax.device_put(x, fsh)
    mask = jax.device_put(mask, fsh)

    fes = {}
    for cm in (False, True):
        step = make_atlas_train_step(
            gcfg, lcfg, mesh, em_iters=2, reg_nmax=1, use_ext=False,
            reg_inner=3, reg_ls=8, carry_memory=cm, memory_size=4,
        )
        a0 = jax.device_put(jnp.zeros_like(x), fsh)
        st, x1 = gstate, x
        al = jnp.zeros((k,), jnp.float32)
        mem = zero_atlas_memory(a0, 4) if cm else None
        seq = []
        for _ in range(3):
            if cm:
                out = step(st, x, a0, x, x1, mask, mask, al, mem)
                mem = out.memory
            else:
                out = step(st, x, a0, x, x1, mask, mask, al)
            st, a0, x1, al = out.gmm, out.a0, out.x1, out.alpha
            seq.append(float(out.fe))
        assert all(np.isfinite(seq))
        assert all(b <= a_ + 1e-3 * abs(a_) for a_, b in zip(seq, seq[1:]))
        fes[cm] = seq
    assert fes[True][-1] <= fes[False][-1] + 1e-3 * abs(fes[False][-1])
