"""Standard (template-based) atlas building.

API-compatible re-design of reference diffICP/api/standard_atlas.py:60-230:
alternate per-frame Reg_opt and common Template_opt on the RKHS measure
distance; LDDMM lambda=2.0 "classic" (Deformetrica convention).

model_parameters: {"sigma_data" (None = mean intrinsic scale), "noise_std"
(value or "auto"), "sigma_LDDMM", "use_template_weights"}.
initial_template: frame index or explicit tensor.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from difficp_tpu.api import common
from difficp_tpu.models import lddmm as lddmm_mod
from difficp_tpu.models.psr_standard import DiffPSRStd
from difficp_tpu.utils.io import read_point_sets
from difficp_tpu.utils.point_sets import intrinsic_scale


def standard_atlas(
    x,
    initial_template=0,
    model_parameters: dict = None,
    numerical_options: Optional[dict] = None,
    optim_options: Optional[dict] = None,
    callback_function=None,
    printstuff: bool = True,
):
    model_parameters = dict(model_parameters or {})
    assert {"sigma_data", "noise_std", "sigma_LDDMM"}.issubset(model_parameters)
    common.set_default(model_parameters, "use_template_weights", False)

    numerical_options = common.default_numerical_options(numerical_options)
    optim_options = common.default_optim_options(optim_options)
    common.set_default(optim_options, "start_by_template_opt", False)
    tol = optim_options["convergence_tolerance"]

    nested, k_frames, s_structs, d = read_point_sets(x)

    if model_parameters["sigma_data"] is None:
        model_parameters["sigma_data"] = sum(
            intrinsic_scale(np.asarray(nested[k][s], np.float32))
            for k in range(k_frames)
            for s in range(s_structs)
        ) / (k_frames * s_structs)

    if isinstance(initial_template, int):
        initial_template = nested[initial_template]

    noise_std = model_parameters["noise_std"]
    sig = model_parameters["sigma_LDDMM"]
    if noise_std == "auto":
        from difficp_tpu.models.calibration import calibrate_noise_std

        if printstuff:
            print("Automatic calibration of noise_std (ad hoc)...")
        n_pairs = min(k_frames - 1, 10)
        vals = []
        for i in range(n_pairs):
            try:
                vals.append(
                    calibrate_noise_std(nested[i][0], nested[i + 1][0], sig)
                )
            except Exception:
                continue
        vals = np.asarray([v for v in vals if np.isfinite(v)])
        noise_std = float(1.0 / np.mean(1.0 / vals))  # harmonic mean
        if printstuff:
            print(f"    noise_std = {noise_std}")

    lcfg = lddmm_mod.make_config(
        sigma=sig, lambd=2.0, version="classic",
        nt=numerical_options["integration_nt_LDDMM"],
        scheme=numerical_options["integration_scheme_LDDMM"],
    )
    psr = DiffPSRStd(
        nested, initial_template, noise_std, lcfg,
        data_sigma=model_parameters["sigma_data"],
        template_weights=model_parameters["use_template_weights"],
    )
    supp = numerical_options["support_LDDMM"]
    if supp["scheme"] != "dense":
        psr.set_support_scheme(**supp)
    psr.printstuff = printstuff

    evol = {"a0": [], "y0": []}
    if model_parameters["use_template_weights"]:
        evol["w0"] = []

    last_e = None
    for it in range(optim_options["max_iterations"]):
        if printstuff:
            print("ITERATION NUMBER ", it)
        evol["y0"].append([np.asarray(y) for y in psr.y0])
        evol["a0"].append(np.asarray(psr.a0))
        if model_parameters["use_template_weights"]:
            evol["w0"].append([np.asarray(w) for w in psr.w0])

        if callback_function is not None:
            callback_function(psr, True)
        if not (it == 1 and optim_options["start_by_template_opt"]):
            if printstuff:
                print("Updating diffeomorphisms (all frames in lockstep).")
            psr.Reg_opt(nmax=1, tol=tol,
                        carry_memory=numerical_options["carry_memory_LDDMM"])
        if callback_function is not None:
            callback_function(psr, False)
        if printstuff:
            print("Updating (common) template.")
        psr.Template_opt(nmax=1, tol=tol)

        if it > 1 and abs(psr.E - last_e) < tol * abs(last_e):
            if printstuff:
                print("Difference in energy is below tolerance threshold : optimization is over.")
            break
        last_e = psr.E

    return psr, evol
