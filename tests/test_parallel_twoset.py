"""End-to-end point-sharded two-set registration on the virtual 8-device
CPU mesh: ring reductions (incl. eta != 0 and external advected points)
match the single-device kernels, the fully sharded EM + L-BFGS step matches
the single-device alternation, and the sharded registration loss compiles
at 1M points (SURVEY §2.5 ring row; the reference has no multi-device
analog at all)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from difficp_tpu.models import gmm as gmm_mod
from difficp_tpu.models import lddmm as lddmm_mod
from difficp_tpu.parallel.atlas import make_mesh
from difficp_tpu.parallel.ring import (
    ring_hamiltonian,
    ring_rhs_ext,
    ring_rhs_self,
)
from difficp_tpu.parallel.twoset import (
    make_sharded_reg_loss,
    make_twoset_step,
)

HERE = os.path.dirname(__file__)


def _points(m, seed=0, scale=0.2):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(m, 2)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(m, 2)).astype(np.float32) * scale)
    mask = jnp.asarray((rng.uniform(size=m) > 0.15).astype(np.float32))
    return q, p * mask[:, None], mask


def test_ring_rhs_self_eta_matches_dense():
    """eta != 0 (gradcomponent) ring == dense reference reduction."""
    from difficp_tpu.ops import reductions as R

    mesh = make_mesh(8, axis="points")
    q, p, mask = _points(8 * 24)
    eta, sig = 0.05, 0.5

    fn = jax.jit(
        jax.shard_map(
            lambda q, p, mk: ring_rhs_self(q, p, mk, sig, True, "points",
                                           eta=eta, tile=16),
            mesh=mesh,
            in_specs=(P("points"),) * 3,
            out_specs=(P("points"), P("points"), P()),
            check_vma=False,
        )
    )
    vq, mgq, dc = fn(q, p, mask)
    vq_d, mgq_d, dc_d = R.lddmm_rhs_self(q, p, sig, eta, True, mask)
    np.testing.assert_allclose(np.asarray(vq), np.asarray(vq_d), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(mgq), np.asarray(mgq_d), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(float(dc), float(dc_d), rtol=1e-3, atol=1e-4)


def test_ring_rhs_ext_matches_dense():
    """Both sets sharded: ring ext reduction == dense lddmm_rhs_ext."""
    from difficp_tpu.ops import reductions as R

    mesh = make_mesh(8, axis="points")
    q, p, mq = _points(8 * 16, seed=2)
    x, _, mx = _points(8 * 24, seed=3)
    sig = 0.5

    fn = jax.jit(
        jax.shard_map(
            lambda q, p, x, mq, mx: ring_rhs_ext(
                q, p, x, mq, mx, sig, True, "points", tile=16
            ),
            mesh=mesh,
            in_specs=(P("points"),) * 5,
            out_specs=(P("points"), P("points"), P(), P("points")),
            check_vma=False,
        )
    )
    vq, mgq, dc, vx = fn(q, p, x, mq, mx)
    vq_d, mgq_d, dc_d, vx_d = R.lddmm_rhs_ext(q, p, x, sig, 0.0, True, mq, mx)
    np.testing.assert_allclose(np.asarray(vq), np.asarray(vq_d), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(mgq), np.asarray(mgq_d), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(vx), np.asarray(vx_d), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(float(dc), float(dc_d), rtol=1e-3, atol=1e-4)


def test_ring_hamiltonian_matches_blockwise():
    from difficp_tpu.ops import blockwise as bw

    mesh = make_mesh(8, axis="points")
    q, p, mask = _points(8 * 24, seed=4)
    eta, sig = 0.03, 0.4

    fn = jax.jit(
        jax.shard_map(
            lambda q, p, mk: ring_hamiltonian(q, p, mk, sig, eta, "points",
                                              tile=16),
            mesh=mesh,
            in_specs=(P("points"),) * 3,
            out_specs=P(),
            check_vma=False,
        )
    )
    h = fn(q, p, mask)
    h_ref = bw.hamiltonian(q, p, sig, eta, mask, tile=32)
    np.testing.assert_allclose(float(h), float(h_ref), rtol=1e-4, atol=1e-6)


def test_sharded_twoset_step_matches_single_device():
    """The fully sharded EM + ring L-BFGS alternation reproduces the
    single-device free-energy trajectory (monotone both ways)."""
    spiral = np.load(os.path.join(HERE, "goldens", "spiral.npz"))
    x_all = np.concatenate([spiral[f"x{k}"] for k in range(3)], 0)
    n = (x_all.shape[0] // 8) * 8
    q0 = jnp.asarray(x_all[:n], jnp.float32)
    mask = jnp.ones((n,), jnp.float32)
    a0 = jnp.zeros_like(q0)

    gstate = gmm_mod.GMMState(
        mu=jnp.asarray(spiral["mu0"]) + 0.01,
        w=jnp.zeros(20),
        sigma=jnp.asarray(0.1),
        eta0=jnp.asarray(0.0),
        vol0=jnp.asarray(0.0),
    )
    gcfg = gmm_mod.GMMConfig()
    lcfg = lddmm_mod.make_config(sigma=0.2, lambd=500.0, version="hybrid",
                                 nt=3, scheme="Euler")
    mesh = make_mesh(8, axis="points")
    kw = dict(em_iters=3, reg_nmax=1, reg_inner=8, reg_ls=8, tol=1e-3)
    step = make_twoset_step(gcfg, lcfg, mesh, ring_tile=32, **kw)

    # --- sharded: 2 alternations
    fes = []
    st, a, x1 = gstate, a0, q0
    al = jnp.zeros((), jnp.float32)
    for _ in range(2):
        out = step(st, q0, a, x1, mask, al)
        st, a, x1, al = out.gmm, out.a0, out.x1, out.alpha
        fes.append(float(out.fe))
    assert np.isfinite(float(al)) and float(al) > 0.0
    assert fes[1] <= fes[0] + 1e-3 * abs(fes[0])

    # --- single-device equivalent alternation
    from difficp_tpu.utils.lbfgs import lbfgs_optimize

    def single_step(st, a, x1, al):
        for _ in range(kw["em_iters"]):
            st = gmm_mod.em_step(st, x1, mask, gcfg).state
        out = gmm_mod.em_step(st, x1, mask, gcfg, skip_m=True)
        y, cfe, ptw = out.y, out.cfe, out.gamt
        sig2 = st.sigma ** 2

        def dataloss(pts):
            return jnp.sum((mask * ptw)[:, None] * (pts - y) ** 2) / (2 * sig2)

        res = lddmm_mod.optimize(
            lcfg, dataloss, q0, a, None, mask, None, nmax=kw["reg_nmax"],
            tol=kw["tol"], inner=kw["reg_inner"],
            max_linesearch_steps=kw["reg_ls"],
            # warm-start like the sharded step threads out.alpha
            alpha0=al if al is not None else None,
        )
        fe = float(out.cfe + res.trajl + res.datal)
        return st, res.p0, res.final.q, fe, res.alpha

    st1, a1, x11 = gstate, a0, q0
    al1 = None
    fes_1 = []
    for _ in range(2):
        st1, a1, x11, fe, al1 = single_step(st1, a1, x11, al1)
        fes_1.append(fe)

    # sharded psums reorder the float reductions feeding the line search's
    # binary gates (Armijo / progress / trial-scale updates), so the
    # sharded and single-device step sequences are equivalent-quality but
    # not bitwise-coupled — measured 0.26% FE divergence after 2 steps
    # under the r5 adaptive trial-scale machinery (was <0.2% before).
    np.testing.assert_allclose(fes, fes_1, rtol=1e-2)


def test_sharded_reg_loss_compiles_at_1m_points():
    """AOT-compile the sharded registration loss+grad at M = 2^20 on the
    8-device mesh — proves the SPMD program (ring + streamed tiles) exists
    with O(M/nd x tile) per-device memory; nothing is executed."""
    mesh = make_mesh(8, axis="points")
    lcfg = lddmm_mod.make_config(sigma=0.2, lambd=500.0, version="hybrid",
                                 nt=3, scheme="Euler")
    loss = make_sharded_reg_loss(lcfg, mesh, ring_tile=4096)

    m = 1 << 20
    sh = NamedSharding(mesh, P("points"))
    rep = NamedSharding(mesh, P())
    vec = jax.ShapeDtypeStruct((m, 2), jnp.float32, sharding=sh)
    msk = jax.ShapeDtypeStruct((m,), jnp.float32, sharding=sh)
    scl = jax.ShapeDtypeStruct((), jnp.float32, sharding=rep)

    fn = jax.jit(jax.value_and_grad(loss))
    compiled = fn.lower(vec, vec, vec, msk, msk, scl).compile()
    assert compiled is not None


def test_twoset_step_carry_memory_monotone_and_better():
    """r4: carry_memory threads the sharded L-BFGS curvature memory across
    twoset steps (the EM drift tolerance of DiffPSR.run(carry_memory) on
    the SPMD path) and the best-eval aux replaced the final re-shoot.
    Oracle: monotone FE, and the carried sequence reaches at-least-as-good
    FE at an identical budget."""
    spiral = np.load(os.path.join(HERE, "goldens", "spiral.npz"))
    x_all = np.concatenate([spiral[f"x{k}"] for k in range(3)], 0)
    n = (x_all.shape[0] // 8) * 8
    q0 = jnp.asarray(x_all[:n], jnp.float32)
    mask = jnp.ones((n,), jnp.float32)
    a0 = jnp.zeros_like(q0)
    gstate = gmm_mod.GMMState(
        mu=jnp.asarray(spiral["mu0"]) + 0.01,
        w=jnp.zeros(20),
        sigma=jnp.asarray(0.1),
        eta0=jnp.asarray(0.0),
        vol0=jnp.asarray(0.0),
    )
    gcfg = gmm_mod.GMMConfig()
    lcfg = lddmm_mod.make_config(sigma=0.2, lambd=500.0, version="hybrid",
                                 nt=3, scheme="Euler")
    mesh = make_mesh(8, axis="points")
    kw = dict(em_iters=3, reg_nmax=1, reg_inner=4, reg_ls=8, tol=1e-3)

    from difficp_tpu.parallel.twoset import zero_twoset_memory

    fes = {}
    for cm in (False, True):
        step = make_twoset_step(gcfg, lcfg, mesh, ring_tile=32,
                                carry_memory=cm, **kw)
        st, a, x1 = gstate, a0, q0
        al = jnp.zeros((), jnp.float32)
        mem = zero_twoset_memory(a0) if cm else None
        seq = []
        for _ in range(3):
            if cm:
                out = step(st, q0, a, x1, mask, al, mem)
                mem = out.memory
                assert mem is not None
            else:
                out = step(st, q0, a, x1, mask, al)
            st, a, x1, al = out.gmm, out.a0, out.x1, out.alpha
            seq.append(float(out.fe))
        assert all(b <= a_ + 1e-3 * abs(a_) for a_, b in zip(seq, seq[1:]))
        fes[cm] = seq
    assert fes[True][-1] <= fes[False][-1] + 1e-3 * abs(fes[False][-1])
