"""diffICP_multi equivalent: groupwise atlas of K spiral point sets with the
GMM inferred by EM (reference examples/diffICP_multi.py).

Run:  python -m difficp_tpu.examples.run_multi [--frames 10]
"""

from __future__ import annotations

import argparse

import jax

from difficp_tpu.api import icp_atlas
from difficp_tpu.examples.spiral import generate_spiral_point_sets


def main(k: int = 10, n_iter: int = 25, seed: int = 1234):
    key = jax.random.PRNGKey(seed)
    x0, _, _ = generate_spiral_point_sets(
        key, k=k, nk_bounds=(100, 141), sigma_gmm=0.025,
        sigma_lddmm=0.1, lambda_lddmm=1e2,
    )
    psr, evol = icp_atlas(
        x0,
        GMM_parameters={"init_components": ("set", 0),
                        "optimize_weights": True, "outlier_weight": None},
        registration_parameters={"type": "diffeomorphic",
                                 "lambda_LDDMM": 5e2, "sigma_LDDMM": 0.2},
        numerical_options={"support_LDDMM": {"scheme": "grid", "rho": 1.0}},
        optim_options={"max_iterations": n_iter,
                       "convergence_tolerance": 1e-3, "max_repeat_GMM": 25},
    )
    print("final FE:", psr.FE, " sigma:", float(psr.gmm[0].sigma))
    return psr, evol


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--iters", type=int, default=25)
    args = ap.parse_args()
    main(k=args.frames, n_iter=args.iters)
