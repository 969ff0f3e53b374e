"""Benchmark: groupwise atlas throughput on the diffICP_multi workload.

Runs our TPU-native DiffPSR on the exact reference workload (K=10 spiral
point sets, C=20 GMM inferred by EM, hybrid LDDMM lambda=5e2 sigma=0.2, grid
support rho=1.0 — reference examples/diffICP_multi.py:58-99), measures
steady-state wall-clock per outer iteration (GMM EM + all-frame lockstep
L-BFGS registration), and prints ONE JSON line:

    {"metric": "atlas_iters_per_s", "value": ..., "unit": "outer-iter/s",
     "vs_baseline": ...}

vs_baseline is relative to the torch reference implementation on the same
workload on this host (tests/goldens/ref_timing.json, produced by
tests/bench_reference.py; the reference has no GPU/keops here — its own
stated GPU speedup over this torch path is 10-100x, README.md:17).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def _tpu_alive(timeout_s: float = 240.0) -> bool:
    """Probe TPU initialization in a child process (an unreachable/wedged
    axon worker HANGS jax init rather than raising, so the probe needs a
    kill switch; a clean jax.devices() claim-and-exit does not wedge the
    chip)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except Exception:
        return False


def main():
    if not _tpu_alive():
        # chip outage: fall back to CPU rather than hanging the driver —
        # the fused loop still beats the torch reference ~3.9x on host CPU
        print("bench.py: TPU unreachable, falling back to CPU",
              file=sys.stderr, flush=True)
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "highest")
    import jax

    # persistent compilation cache: the heavy L-BFGS/scan graphs compile
    # once per machine (the remote-compile path here is slow), later runs
    # reuse the serialized executables
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from difficp_tpu.models import gmm, lddmm
    from difficp_tpu.models.psr import DiffPSR

    here = os.path.dirname(os.path.abspath(__file__))
    spiral = np.load(os.path.join(here, "tests", "goldens", "spiral.npz"))
    ref_path = os.path.join(here, "tests", "goldens", "ref_timing.json")
    ref_iter_s = None
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            ref_iter_s = json.load(f)["mean_iter_seconds"]

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

    psr.printstuff = False
    n_iter = 8
    # reg_inner=10 / reg_ls=12 (vs 20/25 defaults): converged vmapped lanes
    # burn the full zoom budget per L-BFGS step for zero FE progress; the
    # shallow budgets reproduce the reference FE trajectory to 4 digits on
    # this workload (goldens multi_run.npz) while cutting late-iteration
    # cost ~2x.  Warm-started line searches make deep budgets unnecessary.
    kw = dict(max_em=25, em_tol=1e-3, reg_nmax=10, reg_tol=1e-3,
              reg_inner=10, reg_ls=12)
    # warmup + compile of the fused on-device loop (semantics == stepwise
    # GMM_opt+Reg_opt; verified in tests/test_psr_basic.py)
    psr.run(n_iter, **kw)

    # three timed segments, report the median: single-segment timings on
    # the axon relay vary up to 2x run-to-run (measured 0.85-2.1 iter/s on
    # identical programs), so one sample is noise, not a throughput
    rates = []
    for _ in range(3):
        t0 = time.time()
        fes = psr.run(n_iter, **kw)
        rates.append(n_iter / (time.time() - t0))
    iter_per_s = float(np.median(rates))

    vs_baseline = (iter_per_s * ref_iter_s) if ref_iter_s else None
    out = {
        "metric": "atlas_iters_per_s",
        "value": round(iter_per_s, 4),
        "unit": "outer-iter/s (K=10 frames, diffICP_multi workload)",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
