"""Driver-bench (#10) experiments: where do the 310 ms/outer-iter go on the
tiny diffICP_multi workload, and what config reaches >= 4 iter/s without
changing the FE trajectory?

Variants (all the exact bench.py workload, fused run(8)):
  base        : bench.py config (reg_nmax=10, inner=10, ls=12, dense backend)
  pallas      : same knobs, kernel backend forced to the fused pallas RHS
                (1-2 kernels per Euler step instead of ~15 XLA ops)
  nmax6       : reg_nmax=6, inner=8 — budget trim (FE parity checked)
  em10        : max_em=10 — EM budget trim (FE parity checked)

Prints per-variant s/iter + final FE + FE trajectory max rel deviation vs
base.  Run from /root/repo:  python benchmarks/bench_experiments.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def build_psr():
    import jax.numpy as jnp

    from difficp_tpu.models import gmm, lddmm
    from difficp_tpu.models.psr import DiffPSR

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    spiral = np.load(os.path.join(here, "tests", "goldens", "spiral.npz"))
    x = [spiral[f"x{k}"] for k in range(10)]
    rng = np.random.default_rng(0)
    mu0 = x[0][rng.integers(0, x[0].shape[0], 20)]
    state, _ = gmm.create(jnp.asarray(mu0))
    gcfg = gmm.GMMConfig(optimize_mu=True, optimize_sigma=True,
                         optimize_w=True, optimize_eta0=False)
    lcfg = lddmm.make_config(sigma=0.2, lambd=5e2, version="hybrid",
                             nt=10, scheme="Euler")
    psr = DiffPSR(x, state, gcfg, lcfg)
    psr.printstuff = False
    psr.set_support_scheme("grid", rho=1.0)
    return psr


def run_variant(name, backend=None, **kw):
    from difficp_tpu.ops import backend as red

    red.set_backend(backend)
    try:
        psr = build_psr()
        fes_w = psr.run(8, **kw)          # warmup + compile
        t0 = time.time()
        fes = psr.run(8, **kw)
        dt = (time.time() - t0) / 8
        print(f"{name}: {dt*1e3:.0f} ms/iter ({1/dt:.2f} iter/s) "
              f"FE={psr.FE:.2f} inc={psr.fe_increase_events}", flush=True)
        return dt, np.concatenate([fes_w, fes])
    finally:
        red.set_backend(None)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"),
    )
    base_kw = dict(max_em=25, em_tol=1e-3, reg_nmax=10, reg_tol=1e-3,
                   reg_inner=10, reg_ls=12)
    _, fes_base = run_variant("base", **base_kw)
    variants = {
        "pallas": dict(backend="pallas", **base_kw),
        "nmax6": dict(**{**base_kw, "reg_nmax": 6, "reg_inner": 8}),
        "em10": dict(**{**base_kw, "max_em": 10}),
        "pallas+nmax6": dict(backend="pallas",
                             **{**base_kw, "reg_nmax": 6, "reg_inner": 8}),
    }
    for name, kw in variants.items():
        _, fes = run_variant(name, **kw)
        dev = np.max(np.abs(fes - fes_base) / np.abs(fes_base))
        print(f"   {name}: FE-trajectory max rel dev vs base = {dev:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
