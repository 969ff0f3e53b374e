"""Determinism: repeated runs of the full pipeline on identical inputs are
bitwise identical (the JAX-world replacement for the reference's nonexistent
race detection — SURVEY §5)."""

import os

import numpy as np
import jax

from difficp_tpu.models import gmm, lddmm
from difficp_tpu.models.psr import DiffPSR

HERE = os.path.dirname(__file__)
SPIRAL = np.load(os.path.join(HERE, "goldens", "spiral.npz"))


def build_and_run():
    x = [SPIRAL[f"x{k}"] for k in range(4)]
    state, cfg = gmm.create(SPIRAL["mu0"], sigma=0.1)
    lcfg = lddmm.make_config(sigma=0.2, lambd=500.0, version="hybrid",
                             nt=5, scheme="Euler")
    psr = DiffPSR(x, state, cfg, lcfg)
    psr.printstuff = False
    psr.set_support_scheme("grid", rho=1.2)
    psr.run(2, max_em=10, em_tol=1e-3, reg_nmax=2, reg_tol=1e-3)
    return psr


def test_bitwise_deterministic():
    a = build_and_run()
    b = build_and_run()
    assert a.FE == b.FE
    np.testing.assert_array_equal(np.asarray(a.a0), np.asarray(b.a0))
    np.testing.assert_array_equal(np.asarray(a.x1), np.asarray(b.x1))
    np.testing.assert_array_equal(np.asarray(a.gmm[0].mu), np.asarray(b.gmm[0].mu))


def test_seeded_generator_deterministic():
    from difficp_tpu.examples.spiral import generate_spiral_point_sets

    x1, _, _ = generate_spiral_point_sets(jax.random.PRNGKey(7), k=2,
                                          nk_bounds=(30, 40))
    x2, _, _ = generate_spiral_point_sets(jax.random.PRNGKey(7), k=2,
                                          nk_bounds=(30, 40))
    for a, b in zip(x1, x2):
        np.testing.assert_array_equal(a, b)
