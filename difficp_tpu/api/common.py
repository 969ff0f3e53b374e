"""Shared helpers for the api layer: config-dict defaulting and model
construction from the reference's parameter schema."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from difficp_tpu.models import affine as affine_mod
from difficp_tpu.models import gmm as gmm_mod
from difficp_tpu.models import lddmm as lddmm_mod
from difficp_tpu.ops import backend as backend_mod

ALLOWED_REG_TYPES = ("rigid", "similarity", "general_affine", "diffeomorphic")

# computversion values: ours + the reference's spelling (kernel.py:91-110)
_COMPUTVERSION_MAP = {
    "auto": None, None: None,
    "dense": "dense", "torch": "dense",
    "blockwise": "blockwise", "keops": "blockwise",
    "pallas": "pallas",
}

DEFAULT_SUPPORT_SCHEME = {"scheme": "grid", "rho": 1.0}


def set_default(dico: dict, key, value):
    """Reference's defaulting helper (ICP_two_set.py:141-143)."""
    if dico.get(key) is None:
        dico[key] = value


def default_numerical_options(numerical_options: Optional[dict]) -> dict:
    """Numerical option defaults shared by every api function
    (ICP_two_set.py:145-153)."""
    opts = dict(numerical_options or {})
    set_default(opts, "support_LDDMM", dict(DEFAULT_SUPPORT_SCHEME))
    # "auto" = size-based dispatch (dense below DENSE_PAIR_LIMIT, then
    # pallas on TPU / blockwise elsewhere); explicit values force one
    # backend — the reference's set_computversion contract (kernel.py:91-110,
    # "torch"/"keops" accepted as aliases).
    set_default(opts, "computversion", "auto")
    set_default(opts, "gradcomponent_LDDMM", False)
    set_default(opts, "integration_scheme_LDDMM", "Euler")
    set_default(opts, "integration_nt_LDDMM", 10)
    # "fast" = payload-matmul backward kernels (dq floor ~8e-4, ~10x
    # faster); "accurate" = blockwise-VJP backward (f32-exact).  Only
    # affects the Pallas backend's gradients at scale.
    set_default(opts, "backward_precision", "fast")
    # thread each frame's L-BFGS curvature memory across the outer
    # iterations' Reg_opt calls (quasi-Newton persistence; the EM targets
    # drift slowly so the carried pairs stay informative — measured ~9x
    # larger FE decrease per call at 131k).  Default off = the reference's
    # fresh-torch-LBFGS-per-call semantics.
    set_default(opts, "carry_memory_LDDMM", False)
    # run the K frames' lockstep registration in sequential vmapped chunks
    # of this many frames (None = all at once).  At K x 100k+ scales this
    # both bounds per-program work under execution watchdogs and confines
    # the slowest-lane tax of the joint line search (models/psr.py
    # Reg_opt(frame_chunk=...)); exact-equivalence tested.
    set_default(opts, "frame_chunk_LDDMM", None)
    apply_computversion(opts["computversion"])
    backend_mod.set_bwd_precision(opts["backward_precision"])
    return opts


def apply_computversion(value):
    """Route the api 'computversion' key to the global backend switch
    (the reference's set_computversion, kernel.py:91-110)."""
    if value not in _COMPUTVERSION_MAP:
        raise ValueError(
            f"computversion={value!r}: expected one of "
            f"{sorted(str(k) for k in _COMPUTVERSION_MAP)}"
        )
    backend_mod.set_backend(_COMPUTVERSION_MAP[value])


def default_optim_options(optim_options: Optional[dict]) -> dict:
    opts = dict(optim_options or {})
    set_default(opts, "max_iterations", 25)
    set_default(opts, "convergence_tolerance", 1e-3)
    set_default(opts, "max_repeat_GMM", 10)
    return opts


def build_lddmm_config(registration_parameters, numerical_options, lam) -> lddmm_mod.LDDMMConfig:
    return lddmm_mod.make_config(
        sigma=registration_parameters["sigma_LDDMM"],
        lambd=lam,
        gradcomponent=numerical_options["gradcomponent_LDDMM"],
        withlogdet=True,
        nt=numerical_options["integration_nt_LDDMM"],
        scheme=numerical_options["integration_scheme_LDDMM"],
    )


def build_affine_config(reg_type: str) -> affine_mod.AffineConfig:
    return affine_mod.AffineConfig(version=reg_type, withlogdet=True, with_t=True)


def gmm_from_two_set_params(x_b, gmm_parameters: dict):
    """GMM with mu fixed at xB, per ICP_two_set semantics
    (ICP_two_set.py:175-187)."""
    use_outliers = gmm_parameters.get("outlier_weight") is not None
    state, cfg = gmm_mod.create(
        jnp.asarray(np.asarray(x_b, np.float32)),
        sigma=gmm_parameters["sigma"],
        use_outliers=use_outliers,
    )
    if isinstance(gmm_parameters.get("outlier_weight"), (int, float)):
        state = state._replace(
            eta0=jnp.asarray(float(gmm_parameters["outlier_weight"]))
        )
    cfg = cfg._replace(
        optimize_mu=False,
        optimize_sigma=bool(gmm_parameters["optimize_sigma"]),
        optimize_w=False,
        optimize_eta0=gmm_parameters.get("outlier_weight") == "optimize",
    )
    return state, cfg
