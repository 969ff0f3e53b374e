"""Flagship scale demo: two-set diffeomorphic registration at 100k+ points
on a single chip — a regime the reference's dense-torch backend cannot
represent (kernel.py:99-104) and KeOps needs a GPU for.

Dense support (support = all data points): every ODE evaluation is a fused
pallas kernel pass over M^2 pairs (~17 Gpair at M=131k, ~140 Gpair/s/chip).
Registration programs are kept short (inner L-BFGS steps per program) to
respect execution watchdogs; see CLAUDE.md.

Run:  python -m difficp_tpu.examples.run_large --points 131072 --iters 3
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from difficp_tpu.models import gmm, lddmm
from difficp_tpu.models.psr import DiffPSR


def spiral_cloud(n, rng, noise=0.02, dim=2):
    t = rng.uniform(0, 2 * np.pi, size=n).astype(np.float32)
    cols = [0.5 + 0.4 * (t / 7) * np.cos(t), 0.5 + 0.3 * np.sin(t)]
    if dim == 3:
        # helix: the 2D spiral lifted along z (a 3D anatomy-like curve sheet)
        cols.append(0.5 + 0.25 * (t / (2 * np.pi)))
    pts = np.stack(cols, 1) + noise * rng.normal(size=(n, dim))
    return pts.astype(np.float32)


def warp(x, dim):
    if dim == 2:
        d = np.stack([np.sin(3 * x[:, 1]), np.cos(3 * x[:, 0])], 1)
    else:
        d = np.stack([np.sin(3 * x[:, 1]), np.cos(3 * x[:, 2]),
                      np.sin(3 * x[:, 0])], 1)
    return x + 0.05 * d.astype(np.float32)


def main(n_points=131072, n_iter=3, c_gmm=64, inner=None, ls_steps=25,
         dim=2):
    if inner is None:
        # keep each registration program safely under execution watchdogs
        inner = 1 if n_points > 100_000 else 2
    rng = np.random.default_rng(0)
    x_a = spiral_cloud(n_points, rng, dim=dim)
    # target: a warped copy (smooth sinusoidal deformation)
    x_b = warp(spiral_cloud(n_points, rng, dim=dim), dim)

    # GMM over the target with C components (sub-sampled centroids)
    mu0 = x_b[rng.integers(0, n_points, c_gmm)]
    state, _ = gmm.create(jnp.asarray(mu0), sigma=0.05)
    gcfg = gmm.GMMConfig(optimize_mu=True, optimize_sigma=True,
                         optimize_w=True, optimize_eta0=False)
    lcfg = lddmm.make_config(sigma=0.1, lambd=200.0, version="hybrid",
                             nt=10, scheme="Euler")
    psr = DiffPSR(x_a, state, gcfg, lcfg)
    psr.printstuff = True

    for it in range(n_iter):
        t0 = time.time()
        psr.GMM_opt(max_iterations=10, tol=1e-3)
        # several short registration programs per outer iteration
        # (inner kept small for the watchdog; full-depth line search — the
        # first step of each program needs many zoom evals against raw-sum
        # gradient scales, later steps reuse the accepted step)
        # carry_memory: L-BFGS curvature pairs thread across the split
        # programs (quasi-Newton steps instead of a steepest-descent crawl);
        # carry_value: the accepted (loss, grad, arrival) of the previous
        # program replaces the next one's mandatory entry evaluation — a
        # full fwd+bwd shoot.  GMM_opt invalidates the carried value (the
        # objective changed), so only the 2nd+ program of each outer
        # iteration skips its entry eval.
        for _ in range(2):
            psr.Reg_opt(tol=1e-3, nmax=1, inner=inner, ls_steps=ls_steps,
                        carry_memory=True, carry_value=True)
        print(f"iter {it}: {time.time() - t0:.1f}s FE={psr.FE:.1f}")
    return psr


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=131072)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--inner", type=int, default=None)
    ap.add_argument("--ls", type=int, default=25,
                    help="line-search eval budget per program; cap it at "
                    "262k+ points so the COLD first program (entry eval + "
                    "full descent from the 1/||g0|| seed) stays under "
                    "runtime execution watchdogs")
    ap.add_argument("--dim", type=int, default=2, choices=(2, 3))
    args = ap.parse_args()
    main(n_points=args.points, n_iter=args.iters, inner=args.inner,
         ls_steps=args.ls, dim=args.dim)
