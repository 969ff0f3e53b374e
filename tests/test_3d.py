"""3D end-to-end smoke tests: the whole pipeline (reductions, shoot, EM,
two-set and atlas registration) is dimension-generic; the reference only
demos 2D, 3D being latent (my_scatter handles 3D, visu.py:55-83)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difficp_tpu.api import icp_atlas, icp_two_set


@pytest.fixture(scope="module")
def clouds3d():
    rng = np.random.default_rng(0)
    # helix point clouds
    t = rng.uniform(0, 4 * np.pi, size=(3, 60)).astype(np.float32)
    out = []
    for k in range(3):
        pts = np.stack(
            [np.cos(t[k]), np.sin(t[k]), t[k] / (4 * np.pi)], axis=1
        ) + 0.03 * rng.normal(size=(60, 3)).astype(np.float32)
        out.append(pts.astype(np.float32))
    return out


def test_two_set_3d_diffeomorphic(clouds3d):
    psr, _ = icp_two_set(
        clouds3d[0], clouds3d[1],
        GMM_parameters={"sigma": 0.2, "optimize_sigma": True,
                        "outlier_weight": None},
        registration_parameters={"type": "diffeomorphic",
                                 "lambda_LDDMM": 100.0, "sigma_LDDMM": 0.4},
        optim_options={"max_iterations": 3, "convergence_tolerance": 1e-4,
                       "max_repeat_GMM": 10},
        printstuff=False,
    )
    assert psr.D == 3
    assert psr.fe_increase_events == 0
    assert np.isfinite(psr.FE)


def test_two_set_3d_rigid(clouds3d):
    th = 0.3
    rot = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
        np.float32,
    )
    xa = clouds3d[0] @ rot.T + np.array([0.2, -0.1, 0.3], np.float32)
    psr, _ = icp_two_set(
        xa, clouds3d[0],
        GMM_parameters={"sigma": 0.2, "optimize_sigma": True,
                        "outlier_weight": None},
        registration_parameters={"type": "rigid"},
        optim_options={"max_iterations": 15, "convergence_tolerance": 1e-5,
                       "max_repeat_GMM": 15},
        printstuff=False,
    )
    m = np.asarray(psr.M[0])
    np.testing.assert_allclose(m @ rot, np.eye(3), atol=0.2)


def test_atlas_3d(clouds3d):
    psr, _ = icp_atlas(
        clouds3d,
        GMM_parameters={"init_components": ("set", 0)},
        registration_parameters={"type": "diffeomorphic",
                                 "lambda_LDDMM": 100.0, "sigma_LDDMM": 0.4},
        numerical_options={"support_LDDMM": {"scheme": "grid", "rho": 1.5}},
        optim_options={"max_iterations": 2, "convergence_tolerance": 1e-4,
                       "max_repeat_GMM": 5},
        printstuff=False,
    )
    assert psr.D == 3
    assert psr.fe_increase_events == 0
