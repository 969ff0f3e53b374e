"""diffICP_full equivalent: multi-structure atlas — K frames x S structures
(spiral, circle, bar), each frame warped by ONE diffeomorphism common to its
structures, each structure with its own GMM (reference examples/diffICP_full.py).

Run:  python -m difficp_tpu.examples.run_full
"""

from __future__ import annotations

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from difficp_tpu.api import icp_atlas
from difficp_tpu.examples.spiral import spiral_centroids
from difficp_tpu.models import gmm as gmm_mod
from difficp_tpu.models import lddmm as lddmm_mod


def generate_multi_structure_frames(key, k: int = 10, n_bounds=(40, 51),
                                    sigma_gmm: float = 0.02,
                                    sigma_lddmm: float = 0.15,
                                    lambda_lddmm: float = 2e2):
    """K frames of S=3 structures (spiral / circle / bar); all structures of
    a frame are advected by the same random geodesic (the generative model of
    reference diffICP_full.py:37-78)."""
    t = jnp.linspace(0, 2 * np.pi, 13)[:-1]
    shapes = [
        spiral_centroids(20),
        jnp.stack([0.3 + 0.12 * jnp.cos(t), 0.35 + 0.12 * jnp.sin(t)], 1),
        jnp.stack([jnp.linspace(0.55, 0.85, 12), jnp.full((12,), 0.25)], 1),
    ]
    gmms = []
    for mu in shapes:
        st, _ = gmm_mod.create(mu.astype(jnp.float32), sigma=sigma_gmm)
        gmms.append(st)
    lcfg = lddmm_mod.make_config(sigma=sigma_lddmm, lambd=lambda_lddmm,
                                 version="classic", nt=10)

    frames = []
    for _ in range(k):
        key, kn, *ks = jax.random.split(key, 2 + len(shapes))
        ns = jax.random.randint(kn, (len(shapes),), n_bounds[0], n_bounds[1])
        pts = [gmm_mod.sample(g, kk, int(n))
               for g, kk, n in zip(gmms, ks, np.asarray(ns))]
        allpts = jnp.concatenate(pts, axis=0)
        key, kp = jax.random.split(key)
        a0 = lddmm_mod.random_p(lcfg, allpts, kp, version="ridge", alpha=10.0)
        final, _ = lddmm_mod.shoot(lcfg, allpts, a0)
        warped = np.asarray(final.q)
        out, off = [], 0
        for p in pts:
            out.append(warped[off : off + p.shape[0]])
            off += p.shape[0]
        frames.append(out)
    return frames


def main(k: int = 10, n_iter: int = 15, seed: int = 0):
    frames = generate_multi_structure_frames(jax.random.PRNGKey(seed), k=k)
    psr, evol = icp_atlas(
        frames,
        GMM_parameters={"init_components": ("set", 0),
                        "optimize_weights": True, "outlier_weight": None},
        registration_parameters={"type": "diffeomorphic",
                                 "lambda_LDDMM": 2e2, "sigma_LDDMM": 0.2},
        numerical_options={"support_LDDMM": {"scheme": "grid", "rho": 1.0}},
        optim_options={"max_iterations": n_iter,
                       "convergence_tolerance": 1e-3, "max_repeat_GMM": 25},
    )
    print("final FE:", psr.FE,
          " sigmas:", [float(g.sigma) for g in psr.gmm])
    return psr, evol


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--iters", type=int, default=15)
    args = ap.parse_args()
    main(k=args.frames, n_iter=args.iters)
