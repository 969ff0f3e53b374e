"""Multi-structure atlas (diffICP_full shape): S=2 structures per frame,
one registration per frame spanning both, per-structure GMMs.  Validates the
structure-slice plumbing and the monotone-FE oracle end to end."""

import numpy as np
import jax
import pytest

from difficp_tpu.api import icp_atlas
from difficp_tpu.examples.run_full import generate_multi_structure_frames


@pytest.fixture(scope="module")
def frames():
    f = generate_multi_structure_frames(
        jax.random.PRNGKey(0), k=4, n_bounds=(25, 33)
    )
    # keep only 2 structures for test speed
    return [fr[:2] for fr in f]


def test_multi_structure_atlas(frames):
    psr, evol = icp_atlas(
        frames,
        GMM_parameters={"init_components": ("set", 0),
                        "optimize_weights": True, "outlier_weight": None},
        registration_parameters={"type": "diffeomorphic",
                                 "lambda_LDDMM": 2e2, "sigma_LDDMM": 0.2},
        numerical_options={"support_LDDMM": {"scheme": "grid", "rho": 1.2}},
        optim_options={"max_iterations": 4, "convergence_tolerance": 1e-4,
                       "max_repeat_GMM": 10},
        printstuff=False,
    )
    assert psr.S == 2 and psr.K == 4
    assert psr.fe_increase_events == 0
    # each structure keeps its own GMM (different sigmas are plausible but at
    # least shapes/centroids differ)
    assert psr.gmm[0].mu.shape[0] != psr.gmm[1].mu.shape[0] or not np.allclose(
        np.asarray(psr.gmm[0].mu[: psr.gmm[1].mu.shape[0]]),
        np.asarray(psr.gmm[1].mu),
    )
    # warped structures retrievable per (k, s) with true ragged sizes
    for k in range(psr.K):
        for s in range(psr.S):
            pts = psr.get_warped_data_points(k, s)
            assert pts.shape[0] == int(psr.structs[s].n[k])
            assert np.isfinite(pts).all()


def test_multi_structure_decim_support(frames):
    psr, _ = icp_atlas(
        frames,
        GMM_parameters={"init_components": 10},
        registration_parameters={"type": "diffeomorphic",
                                 "lambda_LDDMM": 2e2, "sigma_LDDMM": 0.25},
        numerical_options={"support_LDDMM": {"scheme": "decim", "rho": 0.7}},
        optim_options={"max_iterations": 2, "convergence_tolerance": 1e-4,
                       "max_repeat_GMM": 5},
        printstuff=False,
    )
    # decimated support is per-frame, padded with masks
    assert psr.qmask.shape[0] == psr.K
    assert float(psr.qmask.sum(axis=1).min()) > 0
    assert psr.fe_increase_events == 0
