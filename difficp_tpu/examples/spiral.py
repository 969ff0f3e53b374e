"""Synthetic 'spiral' point-set generator — the reproducible fixture used by
every atlas demo/test.

Re-design of reference diffICP/examples/generate_spiral_point_sets.py:25-71:
a fixed 20-centroid spiral GMM, per-set GMM samples pushed through random
LDDMM deformations drawn from the Bayesian prior (ridge-regularized).
Seeded with jax PRNG keys (the reference seeds torch with 1234; exact
bit-parity across frameworks is not meaningful — tests that need the torch
fixture load tests/goldens/spiral.npz instead).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from difficp_tpu.models import gmm as gmm_mod
from difficp_tpu.models import lddmm as lddmm_mod


def spiral_centroids(c: int = 20) -> jnp.ndarray:
    """The fixed spiral formula (generate_spiral_point_sets.py:38-40)."""
    t = jnp.linspace(0, 2 * np.pi, c + 1)[:-1]
    return jnp.stack(
        (0.5 + 0.4 * (t / 7) * jnp.cos(t), 0.5 + 0.3 * jnp.sin(t)), axis=1
    ).astype(jnp.float32)


def generate_spiral_point_sets(
    key,
    k: int = 10,
    nk_bounds=(100, 121),
    sigma_gmm: float = 0.025,
    sigma_lddmm: float = 0.1,
    lambda_lddmm: float = 1e2,
):
    """K spiral point sets, each a GMM sample warped by a random geodesic
    (generate_spiral_point_sets.py:53-71).

    :return: (list of (N_k, D) numpy arrays, generative GMMState,
        generative LDDMMConfig)
    """
    gmm_state, _ = gmm_mod.create(spiral_centroids(), sigma=sigma_gmm)
    lcfg = lddmm_mod.make_config(
        sigma=sigma_lddmm, lambd=lambda_lddmm, version="classic", nt=10
    )
    key, knum = jax.random.split(key)
    nks = np.asarray(
        jax.random.randint(knum, (k,), nk_bounds[0], nk_bounds[1])
    )
    out = []
    for i in range(k):
        key, ks, kp = jax.random.split(key, 3)
        xb = gmm_mod.sample(gmm_state, ks, int(nks[i]))
        a0 = lddmm_mod.random_p(lcfg, xb, kp, version="ridge", alpha=10.0)
        final, _ = lddmm_mod.shoot(lcfg, xb, a0)
        out.append(np.asarray(final.q))
    return out, gmm_state, lcfg
