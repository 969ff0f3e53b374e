"""ICP-based two-set registration (diffeomorphic or affine).

API-compatible re-design of reference diffICP/api/ICP_two_set.py:73-288:
point set xA is registered onto xB, whose points serve as the (fixed)
centroids of a GMM; the GMM sigma (and optionally an outlier weight) are
optimized by EM while the registration is optimized per alternation.

Config dicts mirror the reference schema:

- GMM_parameters: {"sigma", "optimize_sigma", "outlier_weight"}
  (outlier_weight: None | "optimize" | float log-odds-ratio)
- registration_parameters: {"type": "rigid"|"similarity"|"general_affine"|
  "diffeomorphic", "sigma_LDDMM", "lambda_LDDMM" (value or "auto")}
- numerical_options: {"computversion", "support_LDDMM": {"scheme","rho",...},
  "gradcomponent_LDDMM", "integration_scheme_LDDMM", "integration_nt_LDDMM"}
- optim_options: {"max_iterations", "convergence_tolerance", "max_repeat_GMM"}

The xB-as-GMM hack is supported: pass a (GMMState, GMMConfig) tuple as xB
with GMM_parameters=None (reference ICP_two_set.py:121-126).

:return: (PSR object, evol dict with per-iteration a0/M/t/GMM snapshots)
"""

from __future__ import annotations

import copy
from typing import Optional

import numpy as np

from difficp_tpu.api import common
from difficp_tpu.models import gmm as gmm_mod
from difficp_tpu.models.psr import AffinePSR, DiffPSR


def icp_two_set(
    x_a,
    x_b,
    GMM_parameters: Optional[dict],
    registration_parameters: dict,
    numerical_options: Optional[dict] = None,
    optim_options: Optional[dict] = None,
    printstuff: bool = True,
    callback_function=None,
):
    reg_type = registration_parameters.get("type")
    assert reg_type in common.ALLOWED_REG_TYPES, (
        f"registration_parameters['type'] should be one of {common.ALLOWED_REG_TYPES}"
    )
    is_diff = reg_type == "diffeomorphic"
    if is_diff:
        assert {"lambda_LDDMM", "sigma_LDDMM"}.issubset(registration_parameters), (
            "diffeomorphic registration needs lambda_LDDMM and sigma_LDDMM"
        )

    # xB-as-GMM hack
    is_gmm_b = (
        isinstance(x_b, tuple)
        and len(x_b) == 2
        and isinstance(x_b[0], gmm_mod.GMMState)
    )
    if is_gmm_b:
        assert GMM_parameters is None, "set GMM_parameters=None with a GMM xB"
        gmm_state, gmm_cfg = x_b
    else:
        assert {"optimize_sigma", "sigma"}.issubset(GMM_parameters), (
            "GMM_parameters needs at least sigma and optimize_sigma"
        )
        ow = GMM_parameters.get("outlier_weight")
        assert ow is None or ow == "optimize" or isinstance(ow, (int, float))
        gmm_state, gmm_cfg = common.gmm_from_two_set_params(x_b, GMM_parameters)

    numerical_options = common.default_numerical_options(numerical_options)
    optim_options = common.default_optim_options(optim_options)
    tol = optim_options["convergence_tolerance"]

    x_a = np.asarray(x_a, np.float32)

    if is_diff:
        lam = registration_parameters["lambda_LDDMM"]
        if lam == "auto":
            from difficp_tpu.models.calibration import calibrate_lambda_lddmm

            if printstuff:
                print("Automatic calibration of lambda_LDDMM...")
            mu_b = np.asarray(gmm_state.mu)
            lam = calibrate_lambda_lddmm(
                x_a, mu_b, registration_parameters["sigma_LDDMM"]
            )
            if printstuff:
                print(f"    lambda_LDDMM = {lam}")
        lcfg = common.build_lddmm_config(registration_parameters, numerical_options, lam)
        psr = DiffPSR(x_a, gmm_state, gmm_cfg, lcfg)
        supp = numerical_options["support_LDDMM"]
        if supp["scheme"] != "dense":
            psr.set_support_scheme(**supp)
        evol = {"a0": [], "GMMi": []}
    else:
        acfg = common.build_affine_config(reg_type)
        psr = AffinePSR(x_a, gmm_state, gmm_cfg, acfg)
        evol = {"M": [], "t": [], "GMMi": []}

    psr.printstuff = printstuff

    last_fe = None
    for it in range(optim_options["max_iterations"]):
        if printstuff:
            print("ITERATION NUMBER ", it)
        evol["GMMi"].append(copy.deepcopy(psr.gmm[0]))
        if is_diff:
            evol["a0"].append(np.asarray(psr.a0))
        else:
            evol["M"].append(np.asarray(psr.M))
            evol["t"].append(np.asarray(psr.t))

        psr.GMM_opt(max_iterations=optim_options["max_repeat_GMM"], tol=tol)
        if callback_function is not None:
            callback_function(psr, True)
        if is_diff:
            psr.Reg_opt(tol=tol, nmax=10,
                        carry_memory=numerical_options["carry_memory_LDDMM"])
        else:
            psr.Reg_opt(tol=tol, nmax=1)
        if callback_function is not None:
            callback_function(psr, False)

        if it > 1 and abs(psr.FE - last_fe) < tol * abs(last_fe):
            if printstuff:
                print("Difference in Free Energy is below tolerance threshold : optimization is over.")
            break
        last_fe = psr.FE

    if printstuff and it + 1 == optim_options["max_iterations"]:
        print("Reached maximum number of iterations (before reaching convergence threshold).")
    return psr, evol
