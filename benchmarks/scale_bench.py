"""Large-scale single-chip benchmarks (run on TPU; results -> BASELINE.md).

1. Fused LDDMM RHS (pallas) throughput sweep over M.
2. Full atlas outer iteration at K frames x N=16k points each, dense
   support (the regime where the reference's dense-torch backend cannot run
   at all — kernel.py:99-104).

3. Standard (RKHS-loss) atlas at K x N=16k through the fused
   DiffPSRStd.run loop (streaming data_distance).

Usage:  python benchmarks/scale_bench.py [rhs|atlas|std|all]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def sync_read(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def bench_rhs(dim=2):
    import jax
    import jax.numpy as jnp

    from difficp_tpu.ops.pallas_reductions import make_rhs_self

    rng = np.random.default_rng(0)
    out = {}
    for m in (16384, 65536, 131072):
        q = jnp.asarray(rng.normal(size=(m, dim)), jnp.float32)
        p = jnp.asarray(rng.normal(size=(m, dim)), jnp.float32)
        mask = jnp.ones((m,), jnp.float32)
        op = make_rhs_self(0.2, 0.0, True, ti=256, tj=512)
        fwd = jax.jit(op)
        o = fwd(q, p, mask)
        sync_read(o[0])
        n_calls = 8
        t0 = time.time()
        for _ in range(n_calls):
            o = fwd(q, p, mask)
        sync_read(o[0])
        dt = (time.time() - t0) / n_calls
        gpairs = m * m / dt / 1e9

        # backward: VJP with unit cotangents (the L-BFGS hot path)
        def loss(qq, pp):
            vq, mgq, dc = op(qq, pp, mask)
            return jnp.sum(vq) + jnp.sum(mgq) + dc

        bwd = jax.jit(jax.grad(loss, argnums=(0, 1)))
        g = bwd(q, p)
        sync_read(g[0])
        t0 = time.time()
        for _ in range(n_calls):
            g = bwd(q, p)
        sync_read(g[0])
        dtb = (time.time() - t0) / n_calls
        gpairs_b = m * m / dtb / 1e9
        out[f"M={m}"] = {"ms_per_call": round(dt * 1e3, 3),
                         "Gpairs_per_s": round(gpairs, 1),
                         "bwd_ms_per_call": round(dtb * 1e3, 3),
                         "bwd_Gpairs_per_s": round(gpairs_b, 1)}
        print(f"pallas fused RHS M={m} D={dim}: fwd {dt*1e3:.2f} ms -> "
              f"{gpairs:.0f} Gpair/s | bwd {dtb*1e3:.2f} ms -> "
              f"{gpairs_b:.0f} Gpair/s", flush=True)
    return out


def bench_atlas(k=10, n=16384, n_iter=3, carry=False, inner=4, c=40,
                ls_steps=None, reg_calls=2, em_iters=10, frame_chunk=None):
    """Stepwise loop with reg_nmax=1 per call: the axon TPU worker kills
    single program executions running much beyond ~60 s, so at scale each
    partial step is its own (short) program; the pallas fwd+bwd kernels keep
    every Reg_opt call well under that.

    ``carry=True`` (r4): the split Reg_opt calls thread the L-BFGS curvature
    memory AND the previous call's (loss, gradient, arrival) — the second
    call of each iteration skips its entry value+grad entirely (the EM
    update before the first call invalidates the carried pair, so that one
    re-evaluates as it must)."""
    import jax
    import jax.numpy as jnp

    from difficp_tpu.models import gmm, lddmm
    from difficp_tpu.models.psr import DiffPSR

    rng = np.random.default_rng(0)
    # synthetic spiral-ish clouds at scale
    base_t = rng.uniform(0, 2 * np.pi, size=(k, n)).astype(np.float32)
    x = []
    for kk in range(k):
        t = base_t[kk]
        pts = np.stack([
            0.5 + 0.4 * (t / 7) * np.cos(t), 0.5 + 0.3 * np.sin(t)
        ], 1) + 0.02 * rng.normal(size=(n, 2))
        x.append(pts.astype(np.float32))

    mu0 = x[0][rng.integers(0, n, c)]
    state, _ = gmm.create(jnp.asarray(mu0))
    gcfg = gmm.GMMConfig()
    lcfg = lddmm.make_config(sigma=0.2, lambd=5e2, version="hybrid",
                             nt=10, scheme="Euler")
    psr = DiffPSR(x, state, gcfg, lcfg)
    psr.printstuff = False
    # dense support: support = all 16k data points per frame (pallas path)

    def one_iter():
        psr.GMM_opt(max_iterations=em_iters, tol=1e-3)
        # short registration programs: the axon runtime kills device
        # programs running much past ~60 s, so cap L-BFGS work per program
        # (inner steps x linesearch evals x nt x fwd+bwd kernel time)
        ls_kw = {} if ls_steps is None else {"ls_steps": ls_steps}
        for _ in range(reg_calls):
            psr.Reg_opt(tol=1e-3, nmax=1, inner=inner,
                        carry_memory=carry, carry_value=carry,
                        frame_chunk=frame_chunk, **ls_kw)
            mem = getattr(psr, "_reg_memory", None)
            cnt = np.asarray(mem.count) if mem is not None else None
            print(f"  reg evals/lane: {np.asarray(psr.last_reg_evals)} "
                  f"FE={psr.FE:.1f} alpha={np.asarray(psr._reg_alpha)} "
                  f"aqn={np.asarray(psr._reg_alpha_qn)} memcnt={cnt}",
                  flush=True)

    t0 = time.time()
    one_iter()
    print(f"atlas compile+first iter: {time.time()-t0:.1f}s FE={psr.FE:.1f}",
          flush=True)

    fe0 = psr.FE
    t0 = time.time()
    for _ in range(n_iter):
        one_iter()
    dt = (time.time() - t0) / n_iter
    frames_per_s = k / dt
    print(
        f"atlas K={k} x N={n} (carry={carry}): {dt:.2f} s/outer-iter -> "
        f"{frames_per_s:.2f} frames/s per iteration; FE {fe0:.1f} -> "
        f"{psr.FE:.1f}, increases={psr.fe_increase_events}", flush=True,
    )
    return {"K": k, "N": n, "carry": carry, "s_per_iter": round(dt, 2),
            "frames_per_s_iter": round(frames_per_s, 2),
            "FE": round(psr.FE, 1), "increases": psr.fe_increase_events}


def bench_std2(k=10, n=16384, ny=1024, n_iter=3):
    """r4: within-phase carry threading on the std atlas.  At dense support
    the template IS the support, so every Template_opt invalidates the reg
    carries (momenta re-projection) and vice versa — the threading only
    lives BETWEEN the watchdog-split calls of one phase.  Schedule
    [Reg_opt x2, Template_opt x1] per outer iteration, measured twice in one
    process: plain, then with carry_memory+carry_value (the second Reg call
    of each iteration skips its entry value+grad and keeps its curvature
    pairs)."""
    import jax.numpy as jnp

    from difficp_tpu.models import lddmm
    from difficp_tpu.models.psr_standard import DiffPSRStd

    rng = np.random.default_rng(0)
    base_t = rng.uniform(0, 2 * np.pi, size=(k, n)).astype(np.float32)
    x = []
    for kk in range(k):
        t = base_t[kk]
        pts = np.stack([
            0.5 + 0.4 * (t / 7) * np.cos(t), 0.5 + 0.3 * np.sin(t)
        ], 1) + 0.02 * rng.normal(size=(n, 2))
        x.append(pts.astype(np.float32))
    tpl = x[0][rng.integers(0, n, ny)] + 0.01 * rng.normal(size=(ny, 2)).astype(np.float32)

    lcfg = lddmm.make_config(sigma=0.2, lambd=2.0, version="classic",
                             nt=10, scheme="Euler")
    psr = DiffPSRStd(x, tpl.astype(np.float32), noise_std=0.2, lcfg=lcfg,
                     data_sigma=0.1)
    psr.printstuff = False
    out = {"K": k, "N": n, "Ny": ny}

    for carry in (False, True):
        def one_iter():
            psr.Reg_opt(nmax=1, tol=1e-3, inner=4, ls_steps=12,
                        carry_memory=carry, carry_value=carry)
            psr.Reg_opt(nmax=1, tol=1e-3, inner=4, ls_steps=12,
                        carry_memory=carry, carry_value=carry)
            psr.Template_opt(nmax=1, tol=1e-3, inner=4, ls_steps=12)

        t0 = time.time()
        one_iter()
        print(f"std2 carry={carry} compile+first iter: {time.time()-t0:.1f}s "
              f"E={psr.E:.4f}", flush=True)
        e0 = psr.E
        t0 = time.time()
        for _ in range(n_iter):
            one_iter()
        dt = (time.time() - t0) / n_iter
        tag = "carry" if carry else "plain"
        print(f"std2[{tag}] K={k} x N={n}: {dt:.2f} s/outer-iter "
              f"(Reg x2 + Tmpl x1), E {e0:.4f} -> {psr.E:.4f}, "
              f"increases={psr.e_increase_events}", flush=True)
        out[tag] = {"s_per_iter": round(dt, 2), "E": round(psr.E, 4),
                    "increases": psr.e_increase_events}
    return out


def bench_std(k=10, n=16384, ny=1024, n_iter=3):
    """Standard (RKHS-loss) atlas at scale through the fused DiffPSRStd.run
    loop — data_distance streams via the backend dispatch (no (Nx, Ny) Gram
    materialization; reference PSR_standard.py:37-58 rides KeOps here).

    Stepwise programs (Reg_opt / Template_opt each its own short device
    program, inner=4 / ls=12): the fused run(1) at this size was killed by
    the axon ~60 s device-program watchdog on its second execution — the
    split keeps every program well under it."""
    import jax.numpy as jnp

    from difficp_tpu.models import lddmm
    from difficp_tpu.models.psr_standard import DiffPSRStd

    rng = np.random.default_rng(0)
    base_t = rng.uniform(0, 2 * np.pi, size=(k, n)).astype(np.float32)
    x = []
    for kk in range(k):
        t = base_t[kk]
        pts = np.stack([
            0.5 + 0.4 * (t / 7) * np.cos(t), 0.5 + 0.3 * np.sin(t)
        ], 1) + 0.02 * rng.normal(size=(n, 2))
        x.append(pts.astype(np.float32))
    tpl = x[0][rng.integers(0, n, ny)] + 0.01 * rng.normal(size=(ny, 2)).astype(np.float32)

    lcfg = lddmm.make_config(sigma=0.2, lambd=2.0, version="classic",
                             nt=10, scheme="Euler")
    psr = DiffPSRStd(x, tpl.astype(np.float32), noise_std=0.2, lcfg=lcfg,
                     data_sigma=0.1)
    psr.printstuff = False

    def one_iter():
        psr.Reg_opt(nmax=1, tol=1e-3, inner=4, ls_steps=12)
        psr.Template_opt(nmax=1, tol=1e-3, inner=4, ls_steps=12)

    t0 = time.time()
    one_iter()
    print(f"std atlas compile+first iter: {time.time()-t0:.1f}s "
          f"E={psr.E:.4f}", flush=True)

    t0 = time.time()
    for _ in range(n_iter):
        one_iter()
    dt = (time.time() - t0) / n_iter
    print(
        f"std atlas K={k} x N={n} (template {ny}): {dt:.2f} s/outer-iter, "
        f"E={psr.E:.4f}, energy-increase events={psr.e_increase_events}",
        flush=True,
    )
    return {"K": k, "N": n, "Ny": ny, "s_per_iter": round(dt, 2),
            "E": round(psr.E, 4), "increase_events": psr.e_increase_events}


def bench_phases(m=131072, c=64, nt=10, ls_steps=12):
    """Per-phase wall-clock breakdown of a large two-set outer iteration
    (VERDICT r1 item 10): EM step, geodesic shoot (nt fwd RHS), full
    registration loss value+grad (fwd+bwd shoot), and a one-step Reg_opt
    program — so the line-search eval count is measured, not guessed."""
    import jax
    import jax.numpy as jnp

    from difficp_tpu.models import gmm, lddmm
    from difficp_tpu.models.psr import DiffPSR

    rng = np.random.default_rng(0)
    t = rng.uniform(0, 2 * np.pi, size=m).astype(np.float32)
    x_a = np.stack([0.5 + 0.4 * (t / 7) * np.cos(t),
                    0.5 + 0.3 * np.sin(t)], 1).astype(np.float32)
    x_a += 0.02 * rng.normal(size=(m, 2)).astype(np.float32)
    mu0 = x_a[rng.integers(0, m, c)]
    state, _ = gmm.create(jnp.asarray(mu0), sigma=0.05)
    gcfg = gmm.GMMConfig(optimize_eta0=False)
    lcfg = lddmm.make_config(sigma=0.1, lambd=200.0, version="hybrid",
                             nt=nt, scheme="Euler")

    xa = jnp.asarray(x_a)
    mask = jnp.ones((m,), jnp.float32)
    out = {}

    def timeit(name, fn, n_calls=4):
        r = fn()
        sync_read(r if isinstance(r, jax.Array) else r[0])
        t0 = time.time()
        for _ in range(n_calls):
            r = fn()
        sync_read(r if isinstance(r, jax.Array) else r[0])
        dt = (time.time() - t0) / n_calls
        out[name] = round(dt * 1e3, 1)
        print(f"phase {name}: {dt*1e3:.1f} ms", flush=True)
        return r

    em = jax.jit(lambda s, x: gmm.em_step(s, x, mask, gcfg).state.mu)
    timeit("em_step_ms", lambda: em(state, xa))

    shoot = jax.jit(
        lambda p: lddmm.shoot(lcfg, xa, p, None, mask)[0].q
    )
    p0 = jnp.zeros_like(xa) + 1e-3
    timeit("shoot_fwd_ms", lambda: shoot(p0))

    y = xa + 0.01
    sig2 = jnp.asarray(0.0025, jnp.float32)

    def lossfn(p):
        final, _ = lddmm.shoot(lcfg, xa, p, None, mask)
        quad = jnp.sum(mask[:, None] * (final.q - y) ** 2) / (2.0 * sig2)
        return lddmm.trajloss(lcfg, xa, p, final.cost, mask) + quad

    lg = jax.jit(jax.value_and_grad(lossfn))
    timeit("loss_grad_ms", lambda: lg(p0)[1])

    psr = DiffPSR(x_a, state, gcfg, lcfg)
    psr.printstuff = False
    psr.GMM_opt(max_iterations=3, tol=1e-3)
    t0 = time.time()
    psr.Reg_opt(tol=1e-3, nmax=1, inner=1, ls_steps=ls_steps)
    first = time.time() - t0
    out["regopt_first_s"] = round(first, 2)
    print(f"Reg_opt(nmax=1, inner=1) first (compile): {first:.1f}s",
          flush=True)
    # successive calls: call 2 is the first zoom warm-started from call 1's
    # accepted step (psr._reg_alpha threading)
    for j in (2, 3, 4):
        t0 = time.time()
        psr.Reg_opt(tol=1e-3, nmax=1, inner=1, ls_steps=ls_steps)
        dt = time.time() - t0
        out[f"regopt_call{j}_s"] = round(dt, 2)
        evals = dt * 1e3 / out["loss_grad_ms"]
        print(f"Reg_opt call {j}: {dt:.1f}s ~= {evals:.1f} loss+grad evals",
              flush=True)
    out["inferred_ls_evals_steady"] = round(
        out["regopt_call4_s"] * 1e3 / out["loss_grad_ms"], 1
    )
    # carried L-BFGS memory across the watchdog-split calls (r3): the
    # quasi-Newton state survives, so steady-state steps run ~2 evals and
    # make real progress instead of steepest-descent crawling
    fe0 = psr.FE
    for j in (1, 2, 3):
        t0 = time.time()
        psr.Reg_opt(tol=1e-3, nmax=1, inner=1, ls_steps=ls_steps,
                    carry_memory=True)
        dt = time.time() - t0
        out[f"regopt_mem_call{j}_s"] = round(dt, 2)
        evals = dt * 1e3 / out["loss_grad_ms"]
        print(f"Reg_opt carry_memory call {j}: {dt:.1f}s ~= {evals:.1f} "
              f"loss+grad evals (dFE={psr.FE - fe0:.1f})", flush=True)
        fe0 = psr.FE
    out["inferred_ls_evals_mem"] = round(
        out["regopt_mem_call3_s"] * 1e3 / out["loss_grad_ms"], 1
    )
    # r4: carry_value threads the previous call's (loss, grad, arrival)
    # into the next call's entry — the mandatory entry value+grad (a full
    # fwd+bwd shoot, ~half the 2-eval steady state) disappears; steady
    # steps should run ~1 eval
    for j in (1, 2, 3):
        t0 = time.time()
        psr.Reg_opt(tol=1e-3, nmax=1, inner=1, ls_steps=ls_steps,
                    carry_memory=True, carry_value=True)
        dt = time.time() - t0
        out[f"regopt_vg_call{j}_s"] = round(dt, 2)
        evals = dt * 1e3 / out["loss_grad_ms"]
        print(f"Reg_opt carry_value call {j}: {dt:.1f}s ~= {evals:.1f} "
              f"loss+grad evals (dFE={psr.FE - fe0:.1f})", flush=True)
        fe0 = psr.FE
    out["inferred_ls_evals_vg"] = round(
        out["regopt_vg_call3_s"] * 1e3 / out["loss_grad_ms"], 1
    )
    out["M"] = m
    return out


def bench_kernels3():
    """Round-3 kernels: standalone hamiltonian / kred (data_distance) /
    grad_kred at payload-matmul speed, the generated any-eta backward, and
    the block-pair symmetric forward above the old 140k ceiling."""
    import jax
    import jax.numpy as jnp

    from difficp_tpu.ops.pallas_ksum import kred_scal_mm, make_hamiltonian
    from difficp_tpu.ops.pallas_reductions import (
        _mm_center, _rhs_self_fwd_sym_blocks, make_rhs_self,
    )

    rng = np.random.default_rng(0)
    out = {}

    def timed(fn, *args, n_calls=8, pairs=None, tag=""):
        o = fn(*args)
        sync_read(o[0] if isinstance(o, tuple) else o)
        t0 = time.time()
        for _ in range(n_calls):
            o = fn(*args)
        sync_read(o[0] if isinstance(o, tuple) else o)
        dt = (time.time() - t0) / n_calls
        g = pairs / dt / 1e9
        print(f"{tag}: {dt*1e3:.2f} ms -> {g:.0f} Gpair/s", flush=True)
        return round(dt * 1e3, 3), round(g, 1)

    m = 131072
    q = jnp.asarray(rng.normal(size=(m, 2)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(m, 2)), jnp.float32) * 0.3
    mask = jnp.ones((m,), jnp.float32)

    # hamiltonian: value and value+grad (the trajloss hot path)
    ham = make_hamiltonian(0.2, 0.0)
    out["ham_fwd_ms"], out["ham_fwd_gpairs"] = timed(
        jax.jit(ham), q, p, mask, pairs=m * m, tag=f"hamiltonian M={m} fwd")
    hvg = jax.jit(jax.value_and_grad(lambda qq, pp: ham(qq, pp, mask),
                                     argnums=(0, 1)))
    out["ham_vg_ms"], out["ham_vg_gpairs"] = timed(
        hvg, q, p, pairs=m * m, tag=f"hamiltonian M={m} val+grad")

    # kred_scal (the standard algorithm's data_distance core), 131k x 131k
    dv = jnp.asarray(rng.normal(size=(m,)), jnp.float32)
    ks = jax.jit(lambda x, y, d: kred_scal_mm(x, y, d, 0.2, mask))
    out["kred_fwd_ms"], out["kred_fwd_gpairs"] = timed(
        ks, q, q, dv, pairs=m * m, tag=f"kred_scal M={m} fwd")
    ksg = jax.jit(jax.grad(
        lambda y, d: jnp.sum(kred_scal_mm(q, y, d, 0.2, mask) * dv),
        argnums=(0, 1)))
    out["kred_bwd_ms"], out["kred_bwd_gpairs"] = timed(
        ksg, q, dv, pairs=m * m, tag=f"kred_scal M={m} bwd(dy,dd)")

    # eta != 0 (gradcomponent) fused RHS: fwd streaming + generated bwd
    eta_op = make_rhs_self(0.2, 1.0 / 500.0, True)
    out["eta_fwd_ms"], out["eta_fwd_gpairs"] = timed(
        jax.jit(eta_op), q, p, mask, pairs=m * m,
        tag=f"eta!=0 RHS M={m} fwd")

    def eloss(qq, pp):
        vq, mgq, dc = eta_op(qq, pp, mask)
        return jnp.sum(vq) + jnp.sum(mgq) + dc

    ebwd = jax.jit(jax.grad(eloss, argnums=(0, 1)))
    out["eta_bwd_ms"], out["eta_bwd_gpairs"] = timed(
        ebwd, q, p, pairs=m * m, n_calls=4,
        tag=f"eta!=0 RHS M={m} bwd (generated)")

    # symmetric-pair forward above the old ceiling: M = 262144
    m2 = 262144
    q2 = jnp.asarray(rng.normal(size=(m2, 2)), jnp.float32)
    p2 = jnp.asarray(rng.normal(size=(m2, 2)), jnp.float32) * 0.3
    mask2 = jnp.ones((m2,), jnp.float32)

    def sym_blocks(qq, pp):
        qc = qq - _mm_center(qq, mask2)
        return _rhs_self_fwd_sym_blocks(qc, pp, mask2, 0.2, True)

    out["sym262k_fwd_ms"], out["sym262k_fwd_gpairs"] = timed(
        jax.jit(sym_blocks), q2, p2, pairs=m2 * m2, n_calls=4,
        tag=f"sym block-pair fwd M={m2}")
    # and the full custom-vjp op end-to-end at 262k (fwd+bwd)
    op2 = make_rhs_self(0.2, 0.0, True)

    def loss2(qq, pp):
        vq, mgq, dc = op2(qq, pp, mask2)
        return jnp.sum(vq) + jnp.sum(mgq) + dc

    bwd2 = jax.jit(jax.grad(loss2, argnums=(0, 1)))
    out["rhs262k_bwd_ms"], out["rhs262k_bwd_gpairs"] = timed(
        bwd2, q2, p2, pairs=m2 * m2, n_calls=4,
        tag=f"RHS M={m2} bwd (sym block-pair)")
    return out


def bench_kernels4(m=131072):
    """Round-4 symmetric generated kernels: the any-eta self fwd/bwd
    (pair_poly) through pairwise_ksum_sym (each unordered tile pair's exp
    once) vs the ordered generic kernel, same data."""
    import jax
    import jax.numpy as jnp

    import difficp_tpu.ops.pair_poly as PP
    from difficp_tpu.ops.pallas_reductions import make_rhs_self

    rng = np.random.default_rng(0)
    out = {}
    q = jnp.asarray(rng.normal(size=(m, 2)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(m, 2)), jnp.float32) * 0.3
    mask = jnp.ones((m,), jnp.float32)
    eta_op = make_rhs_self(0.2, 1.0 / 500.0, True)

    def eloss(qq, pp):
        vq, mgq, dc = eta_op(qq, pp, mask)
        return jnp.sum(vq) + jnp.sum(mgq) + dc

    def timed(fn, *args, n_calls=6, tag=""):
        o = fn(*args)
        sync_read(o[0] if isinstance(o, tuple) else o)
        t0 = time.time()
        for _ in range(n_calls):
            o = fn(*args)
        sync_read(o[0] if isinstance(o, tuple) else o)
        dt = (time.time() - t0) / n_calls
        g = m * m / dt / 1e9
        print(f"{tag}: {dt*1e3:.2f} ms -> {g:.0f} Gpair/s", flush=True)
        return round(dt * 1e3, 3), round(g, 1)

    for name, gate in (("ordered", 1 << 40), ("sym", 32768)):
        PP._SYM_MIN_M = gate
        # fresh lambda per phase: jitting the SAME function object twice
        # shares the trace cache, so the gate flip would never re-trace
        # (the first three runs of this bench measured ordered twice)
        fwd = jax.jit(lambda qq, pp, mm: eta_op(qq, pp, mm))
        out[f"eta_fwd_{name}_ms"], out[f"eta_fwd_{name}_gpairs"] = timed(
            fwd, q, p, mask, tag=f"eta!=0 fwd {name} M={m}")
        ebwd = jax.jit(jax.grad(eloss, argnums=(0, 1)))
        out[f"eta_bwd_{name}_ms"], out[f"eta_bwd_{name}_gpairs"] = timed(
            ebwd, q, p, n_calls=4, tag=f"eta!=0 bwd {name} M={m}")
    return out


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"),
    )
    res = {}
    if which in ("all", "rhs"):
        res["rhs"] = bench_rhs()
    if which == "rhs3d":
        res["rhs3d"] = bench_rhs(dim=3)
    if which in ("all", "atlas"):
        res["atlas"] = bench_atlas()
    if which == "atlas_carry":
        res["atlas_carry"] = bench_atlas(carry=True)
    if which == "atlas2":  # plain then carried, one process (shared compiles)
        res["atlas"] = bench_atlas()
        res["atlas_carry"] = bench_atlas(carry=True)
    if which in ("all", "std"):
        res["std"] = bench_std()
    if which == "std2":
        res["std2"] = bench_std2()
    if which == "phases":
        m = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
        res["phases"] = bench_phases(m)
    if which == "kernels3":
        res["kernels3"] = bench_kernels3()
    if which == "kernels4":
        m = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
        res["kernels4"] = bench_kernels4(m)
    if which == "atlas65":  # K=10 frames x 65k points each (2.7 Tpair/iter)
        # per-program budget sized for the ~60 s watchdog: one eval here is
        # 10 frames x 65k loss+grad ~ 6.5 s VMAPPED, so the COLD first
        # program (entry eval + full line search from the 1/||g0|| seed)
        # must stay <= ~7 evals: inner=1 x ls=6.  (inner=2/ls=8 = up to 17
        # evals = ~110 s crashed the worker; ls=25 even worse.)  4 carried
        # Reg programs per outer iteration; steady programs are ~1 eval.
        # frame_chunk=5: the vmapped joint line search runs at the
        # slowest lane, and after every EM update the f32-converged lanes
        # re-probe their full 6-eval budget — chunking confines that tax
        # to the chunk holding the lane (93.8 -> measured below s/iter)
        res["atlas65"] = bench_atlas(k=10, n=65536, n_iter=2,
                                     carry=True, inner=1, ls_steps=6,
                                     reg_calls=2, frame_chunk=5)
    if which == "atlas131":  # K=10 frames x 131k points each (the flagship
        # groupwise size; 10.7 Tpair per joint eval).  frame_chunk=2 keeps
        # each program at ~2-frame joint evals (~3.4 s) so even the COLD
        # post-EM program (entry + up to 4 ls evals) stays well under the
        # ~60 s watchdog; carried threading makes steady programs ~1 eval.
        res["atlas131"] = bench_atlas(k=10, n=131072, n_iter=2,
                                      carry=True, inner=1, ls_steps=4,
                                      reg_calls=2, em_iters=5,
                                      frame_chunk=2)
    if which == "k64big":  # north-star: K=64 frames x NON-TOY N=4096 each
        # (64 x 4096^2 x nt x fwd+bwd ~ 21 Gpair/eval; carried stepwise
        # programs stay well under the watchdog at inner=2)
        res["k64big"] = bench_atlas(k=64, n=4096, n_iter=3, carry=True,
                                    inner=2, ls_steps=8, reg_calls=2, c=20)
    print(json.dumps(res))
