"""Two-set registration on the Chui-Rangarajan benchmark (the reference's
own demo workload) vs the reference golden run (tests/make_goldens.py
golden_chui): similarity and diffeomorphic variants."""

import os

import numpy as np
import pytest

from difficp_tpu.api import icp_two_set

GOLD = os.path.join(os.path.dirname(__file__), "goldens", "chui_run.npz")
G = np.load(GOLD)


def run(reg):
    return icp_two_set(
        G["xa"], G["xb"],
        GMM_parameters={"sigma": 0.1, "optimize_sigma": True,
                        "outlier_weight": None},
        registration_parameters=reg,
        optim_options={"max_iterations": 30, "convergence_tolerance": 1e-4,
                       "max_repeat_GMM": 25},
        printstuff=False,
    )


def test_chui_similarity_matches_reference():
    psr, _ = run({"type": "similarity"})
    fe_ref = float(G["sim_FE"])
    assert abs(psr.FE - fe_ref) < 0.03 * abs(fe_ref), (psr.FE, fe_ref)
    np.testing.assert_allclose(
        float(psr.gmm[0].sigma), float(G["sim_sigma"]), rtol=0.1
    )
    assert psr.fe_increase_events == 0


def test_chui_diffeomorphic_matches_reference():
    psr, _ = run({"type": "diffeomorphic", "lambda_LDDMM": 200.0,
                  "sigma_LDDMM": 0.2})
    fe_ref = float(G["diff_FE"])
    assert abs(psr.FE - fe_ref) < 0.05 * abs(fe_ref), (psr.FE, fe_ref)
    # warped clouds land on the same configuration (mean NN distance)
    n = int(psr.structs[0].n[0])
    ours = np.asarray(psr.x1[0])[:n]
    ref = G["diff_x1"]
    d2 = ((ours[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
    assert np.sqrt(d2.min(1)).mean() < 0.05
    assert psr.fe_increase_events == 0
