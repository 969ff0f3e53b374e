"""Standard (template-deforms) algorithm vs the torch reference golden:
exact data_distance formula parity and end-to-end energy tracking."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

GOLD = os.path.join(os.path.dirname(__file__), "goldens", "standard_run.npz")

if not os.path.exists(GOLD):
    pytest.skip("standard golden not generated", allow_module_level=True)

G = np.load(GOLD)


def test_data_distance_matches_reference():
    from difficp_tpu.models.psr_standard import data_distance

    got = float(data_distance(jnp.asarray(G["xb"]), jnp.asarray(G["xa"]), 0.1))
    np.testing.assert_allclose(got, float(G["data_distance_0.1"]), rtol=1e-4)


def test_standard_two_set_tracks_reference():
    from difficp_tpu.api import standard_two_set

    psr, _ = standard_two_set(
        G["xa"], G["xb"],
        model_parameters={"type": "diffeomorphic", "sigma_data": 0.1,
                          "noise_std": 0.2, "sigma_LDDMM": 0.2},
        optim_options={"max_iterations": 6, "convergence_tolerance": 1e-4,
                       "nmax_per_iter": 4},
        printstuff=False,
    )
    e_ref = float(G["E"])
    # both optimizers should reach comparable energies on the same problem
    assert psr.E < 1.3 * e_ref + 1e-6, (psr.E, e_ref)
    assert psr.e_increase_events == 0
