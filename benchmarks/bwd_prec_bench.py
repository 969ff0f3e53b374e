"""TPU A/B for the dq-precision fix (VERDICT r4 item 4): error + throughput
of the eta==0 self-RHS backward variants at scale.

Variants:
  sym-split3 / sym-highest      : Morton-sorted, per-block-pair-centered
                                  symmetric-pair kernel (halved exp work)
  ordered-split3 / ordered-highest : Morton-sorted, per-x-tile-centered
                                  full-pairs kernel
Reference: blockwise f32 VJP (the "accurate" path, ~2e-7).

Two geometries per size (same compiled program, different data):
  box    : uniform [0,1]^2, sigma=0.2  (the registration workloads; R/sigma ~ 3.5)
  normal : N(0,1), sigma=0.2           (bench_rhs's adversarial R/sigma ~ 15)

Run from /root/repo (no PYTHONPATH):  python benchmarks/bwd_prec_bench.py [sizes...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"),
    )
    import difficp_tpu.ops.pallas_reductions as pr
    from difficp_tpu.ops import blockwise as bl

    sizes = [int(a) for a in sys.argv[1:]] or [65536, 131072]
    sig = 0.2
    rng = np.random.default_rng(0)
    out = {}

    for m in sizes:
        d = 2
        data = {}
        for geom in ("box", "normal"):
            if geom == "box":
                q = rng.uniform(0, 1, size=(m, d))
            else:
                q = rng.normal(size=(m, d))
            data[geom] = dict(
                q=jnp.asarray(q, jnp.float32),
                p=jnp.asarray(rng.normal(size=(m, d)) * 0.3, jnp.float32),
                gv=jnp.asarray(rng.normal(size=(m, d)), jnp.float32),
                gg=jnp.asarray(rng.normal(size=(m, d)), jnp.float32),
            )
        mask = jnp.ones((m,), jnp.float32)
        gc = jnp.asarray(0.7, jnp.float32)

        # blockwise f32 reference (dq only, timed once per geometry)
        def bl_bwd(q, p, gv, gg):
            _, vjp = jax.vjp(
                lambda q_, p_: bl.lddmm_rhs_self(q_, p_, sig, 0.0, True,
                                                 mask), q, p)
            return vjp((gv, -gg, gc))

        bl_j = jax.jit(bl_bwd)
        refs = {}
        for geom, a in data.items():
            t0 = time.time()
            dq, dp = bl_j(a["q"], a["p"], a["gv"], a["gg"])
            s = float(jnp.max(jnp.abs(dq)))  # readback = sync
            refs[geom] = (np.asarray(dq), np.asarray(dp))
            t1 = time.time()
            dq, dp = bl_j(a["q"], a["p"], a["gv"], a["gg"])
            float(jnp.sum(dq))
            dt = time.time() - t1
            print(f"M={m} {geom}: blockwise ref "
                  f"{m*m/dt/1e9:.0f} Gpair/s ({dt*1e3:.0f} ms)", flush=True)

        res_m = {}
        for variant in ("sym", "ordered"):
            for mode in ("split3", "highest"):
                pr._BWD_MM_MODE = mode
                if variant == "sym":
                    fn = lambda q, p, gv, gg: pr._rhs_self_bwd_sym_mm(
                        q - pr._mm_center(q, mask), p, mask, gv, -gg, gc, sig)
                else:
                    fn = lambda q, p, gv, gg: pr._rhs_self_bwd_mm(
                        q - pr._mm_center(q, mask), p, mask, gv, -gg, gc, sig)
                fj = jax.jit(fn)
                row = {}
                for geom, a in data.items():
                    dq, dp = fj(a["q"], a["p"], a["gv"], a["gg"])
                    float(jnp.sum(dq))
                    n_calls = 5
                    t0 = time.time()
                    for _ in range(n_calls):
                        dq, dp = fj(a["q"], a["p"], a["gv"], a["gg"])
                    float(jnp.sum(dq))
                    dt = (time.time() - t0) / n_calls
                    dq_r, dp_r = refs[geom]
                    e_q = float(np.abs(np.asarray(dq) - dq_r).max()
                                / np.abs(dq_r).max())
                    e_p = float(np.abs(np.asarray(dp) - dp_r).max()
                                / np.abs(dp_r).max())
                    row[geom] = {"Gpairs": round(m * m / dt / 1e9, 1),
                                 "ms": round(dt * 1e3, 1),
                                 "dq_relerr": float(f"{e_q:.2e}"),
                                 "dp_relerr": float(f"{e_p:.2e}")}
                    print(f"M={m} {variant}-{mode} {geom}: "
                          f"{row[geom]['Gpairs']} Gpair/s  dq {e_q:.1e} "
                          f"dp {e_p:.1e}", flush=True)
                res_m[f"{variant}-{mode}"] = row
        out[f"M={m}"] = res_m
    print(json.dumps(out))


if __name__ == "__main__":
    main()
