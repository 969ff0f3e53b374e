"""K=64 groupwise atlas benchmark (the BASELINE north-star scale:
"groupwise atlas of >=64 point sets").

Modes:
  gen  — generate the shared K=64 spiral dataset (tests/goldens/spiral64.npz)
  tpu  — our DiffPSR fused loop on TPU, s/outer-iter
  ref  — torch reference on the same data (CPU), s/outer-iter
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))
DATA = os.path.join(HERE, "..", "tests", "goldens", "spiral64.npz")


def gen():
    import jax

    from difficp_tpu.examples.spiral import generate_spiral_point_sets

    x, _, _ = generate_spiral_point_sets(
        jax.random.PRNGKey(64), k=64, nk_bounds=(100, 141)
    )
    np.savez(DATA, **{f"x{k}": xi for k, xi in enumerate(x)})
    print("spiral64.npz written")


def tpu(n_iter=6):
    import jax
    import jax.numpy as jnp

    from difficp_tpu.models import gmm, lddmm
    from difficp_tpu.models.psr import DiffPSR

    d = np.load(DATA)
    x = [d[f"x{k}"] for k in range(64)]
    rng = np.random.default_rng(0)
    mu0 = x[0][rng.integers(0, x[0].shape[0], 20)]
    state, _ = gmm.create(jnp.asarray(mu0))
    gcfg = gmm.GMMConfig(optimize_eta0=False)
    lcfg = lddmm.make_config(sigma=0.2, lambd=5e2, version="hybrid",
                             nt=10, scheme="Euler")
    psr = DiffPSR(x, state, gcfg, lcfg)
    psr.printstuff = False
    psr.set_support_scheme("grid", rho=1.0)
    def one_iter():
        psr.GMM_opt(max_iterations=25, tol=1e-3)
        # two half-depth registration programs (watchdog margin at 64
        # vmapped lanes: while-loops run to the slowest lane)
        for _ in range(3):
            psr.Reg_opt(tol=1e-3, nmax=2, inner=20)

    t0 = time.time()
    one_iter()
    print(f"warm iter: {time.time()-t0:.1f}s FE={psr.FE:.2f}", flush=True)
    t0 = time.time()
    for _ in range(n_iter):
        one_iter()
    dt = (time.time() - t0) / n_iter
    print(json.dumps({"mode": "tpu", "K": 64, "s_per_iter": round(dt, 3),
                      "FE_last": psr.FE}))


def tpu_fused(n_iter=6, chunk=2, reg_nmax=6, reg_inner=10, reg_ls=12,
              carry_memory=False):
    """The fused-path K=64 bench (VERDICT round-1 item 1): all of (EM +
    lockstep registration) x chunk iterations in ONE device program via
    DiffPSR.run — the per-dispatch overhead of the axon relay (which
    dominates the tiny per-frame programs of the stepwise mode) is paid
    once per chunk instead of ~5x per outer iteration.

    reg_inner=10 / reg_ls=12 (vs the 20/25 defaults): vmapped while_loops
    run at the slowest of the 64 lanes, and CONVERGED lanes burn the full
    zoom budget every L-BFGS step (a failed search on a flat landscape
    exhausts max_linesearch_steps) — the deep config's late iterations
    took 23-28 s/iter and flirted with the ~60 s worker watchdog for ZERO
    extra free-energy progress (FE matches to 4 digits at iteration 10).
    With warm-started line searches the modest budgets lose nothing."""
    import jax
    import jax.numpy as jnp

    from difficp_tpu.models import gmm, lddmm
    from difficp_tpu.models.psr import DiffPSR

    d = np.load(DATA)
    x = [d[f"x{k}"] for k in range(64)]
    rng = np.random.default_rng(0)
    mu0 = x[0][rng.integers(0, x[0].shape[0], 20)]
    state, _ = gmm.create(jnp.asarray(mu0))
    gcfg = gmm.GMMConfig(optimize_eta0=False)
    lcfg = lddmm.make_config(sigma=0.2, lambd=5e2, version="hybrid",
                             nt=10, scheme="Euler")
    psr = DiffPSR(x, state, gcfg, lcfg)
    psr.printstuff = False
    psr.set_support_scheme("grid", rho=1.0)

    t0 = time.time()
    fes = psr.run(chunk, max_em=25, reg_nmax=reg_nmax, chunk=chunk,
                  reg_inner=reg_inner, reg_ls=reg_ls,
                  carry_memory=carry_memory)
    print(f"compile+first chunk({chunk}): {time.time()-t0:.1f}s "
          f"FE={psr.FE:.2f}", flush=True)

    t0 = time.time()
    fes = psr.run(n_iter, max_em=25, reg_nmax=reg_nmax, chunk=chunk,
                  reg_inner=reg_inner, reg_ls=reg_ls,
                  carry_memory=carry_memory)
    dt = (time.time() - t0) / n_iter
    print(json.dumps({"mode": "tpu_fused", "K": 64, "chunk": chunk,
                      "carry_memory": carry_memory,
                      "s_per_iter": round(dt, 3), "FE_last": psr.FE,
                      "fe_increase_events": psr.fe_increase_events}))


def ref(n_iter=3):
    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, os.path.join(HERE, "..", "tests"))
    from make_goldens import _make_point_sets_stub

    sys.modules["diffICP.tools.point_sets"] = _make_point_sets_stub()
    import matplotlib

    matplotlib.use("Agg")
    import torch

    from diffICP.core.GMM import GaussianMixtureUnif
    from diffICP.core.LDDMM import LDDMMModel
    from diffICP.core.PSR import DiffPSR
    from diffICP.tools.kernel import GaussKernel

    def _check_coverage(self, X, Y, Rthreshold):
        return ((X[:, None, :] - Y[None, :, :]) ** 2).sum(-1).min(
            dim=1
        ).values > (Rthreshold * self.sigma) ** 2

    GaussKernel.check_coverage = _check_coverage

    d = np.load(DATA)
    x = [torch.tensor(d[f"x{k}"]) for k in range(64)]
    rng = np.random.default_rng(0)
    mu0 = torch.tensor(d["x0"][rng.integers(0, d["x0"].shape[0], 20)])
    g = GaussianMixtureUnif(mu0, computversion="torch")
    g.to_optimize = {"mu": True, "sigma": True, "w": True, "eta0": False}
    lm = LDDMMModel(sigma=0.2, D=2, lambd=5e2, version="hybrid",
                    computversion="torch", scheme="Euler", nt=10)
    psr = DiffPSR(x, g, lm)
    psr.set_support_scheme("grid", rho=1.0)
    psr.printstuff = False
    times = []
    for it in range(n_iter):
        t0 = time.time()
        psr.GMM_opt(max_iterations=25, tol=1e-3)
        psr.Reg_opt(tol=1e-3, nmax=10)
        times.append(time.time() - t0)
        print(f"ref iter {it}: {times[-1]:.1f}s FE={psr.FE:.2f}", flush=True)
    print(json.dumps({"mode": "ref", "K": 64,
                      "s_per_iter": round(float(np.mean(times[1:] or times)), 2)}))


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "gen":
        gen()
    elif mode == "tpu":
        tpu()
    elif mode == "tpu_fused":
        tpu_fused(
            chunk=int(sys.argv[2]) if len(sys.argv) > 2 else 2,
            reg_nmax=int(sys.argv[3]) if len(sys.argv) > 3 else 6,
            carry_memory=len(sys.argv) > 4 and sys.argv[4] == "carry",
        )
    elif mode == "ref":
        ref()
