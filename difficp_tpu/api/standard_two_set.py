"""Standard (template-deforms) two-set registration.

API-compatible re-design of reference diffICP/api/standard_two_set.py:60-223:
template xA is deformed onto fixed data xB under the RKHS measure distance;
LDDMM uses lambda=2.0 and version="classic" to match the Deformetrica
convention (standard_two_set.py:139-147).

model_parameters: {"type", "sigma_data", "noise_std" (value or "auto"),
"sigma_LDDMM"}; numerical_options / optim_options as in the other apis
(plus optim_options["nmax_per_iter"]).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from difficp_tpu.api import common
from difficp_tpu.models import affine as affine_mod
from difficp_tpu.models import lddmm as lddmm_mod
from difficp_tpu.models.psr_standard import AffinePSRStd, DiffPSRStd


def standard_two_set(
    x_a,
    x_b,
    model_parameters: dict,
    numerical_options: Optional[dict] = None,
    optim_options: Optional[dict] = None,
    printstuff: bool = True,
    callback_function=None,
):
    is_diff = model_parameters["type"] == "diffeomorphic"
    if is_diff:
        assert {"sigma_data", "noise_std", "sigma_LDDMM"}.issubset(model_parameters)
    else:
        assert {"type", "sigma_data"}.issubset(model_parameters)

    model_parameters = dict(model_parameters)
    common.set_default(model_parameters, "noise_std", 1)
    numerical_options = common.default_numerical_options(numerical_options)
    optim_options = common.default_optim_options(optim_options)
    common.set_default(optim_options, "nmax_per_iter", 10)
    tol = optim_options["convergence_tolerance"]

    x_a = np.asarray(x_a, np.float32)
    x_b = np.asarray(x_b, np.float32)

    if is_diff:
        lcfg = lddmm_mod.make_config(
            sigma=model_parameters["sigma_LDDMM"],
            lambd=2.0,  # Deformetrica convention (standard_two_set.py:144)
            version="classic",
            nt=numerical_options["integration_nt_LDDMM"],
            scheme=numerical_options["integration_scheme_LDDMM"],
        )
        psr = DiffPSRStd(
            x_b, x_a, model_parameters["noise_std"], lcfg,
            data_sigma=model_parameters["sigma_data"],
        )
        supp = numerical_options["support_LDDMM"]
        if supp["scheme"] != "dense":
            psr.set_support_scheme(**supp)
        evol = {"a0": [], "y0": []}
    else:
        acfg = affine_mod.AffineConfig(
            version=model_parameters["type"], withlogdet=False, with_t=True
        )
        psr = AffinePSRStd(
            x_b, x_a, model_parameters["noise_std"], acfg,
            data_sigma=model_parameters["sigma_data"],
        )
        evol = {"M": [], "t": [], "y0": []}

    psr.printstuff = printstuff

    last_e = None
    for it in range(optim_options["max_iterations"]):
        if printstuff:
            print("ITERATION NUMBER ", it)
        evol["y0"].append([np.asarray(y) for y in psr.y0])
        if is_diff:
            evol["a0"].append(np.asarray(psr.a0))
        else:
            evol["M"].append(np.asarray(psr.M))
            evol["t"].append(np.asarray(psr.t))

        psr.Reg_opt(nmax=optim_options["nmax_per_iter"], tol=tol)
        if callback_function is not None:
            callback_function(psr, False)

        if it > 1 and abs(psr.E - last_e) < tol * abs(last_e):
            if printstuff:
                print("Difference in energy is below tolerance threshold : optimization is over.")
            break
        last_e = psr.E

    if printstuff and it + 1 == optim_options["max_iterations"]:
        print("Reached maximum number of iterations (before reaching convergence threshold).")
    return psr, evol
