"""ICP-based groupwise atlas building (diffeomorphic or affine).

API-compatible re-design of reference diffICP/api/ICP_atlas.py:51-305:
K frames (x S structures) are registered to common GMM models whose
parameters (centroids, weights, sigma, outlier odds) are inferred by EM.

GMM_parameters["init_components"] accepts the reference's four modes
(ICP_atlas.py:95-203):
  - int N: ad hoc init with N components (re-initialized from the data);
  - ("set", i): point set x[i] as initial centroids;
  - {"set": i, "C": N}: GMM with N components pre-fitted to x[i];
  - list of (GMMState, GMMConfig) pairs (one per structure).

On a multi-device mesh, pass ``mesh_axis``/``mesh`` via numerical_options to
shard frames across devices (see difficp_tpu/parallel/atlas.py).

:return: (PSR object, evol dict)
"""

from __future__ import annotations

import copy
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from difficp_tpu.api import common
from difficp_tpu.models import gmm as gmm_mod
from difficp_tpu.models.psr import AffinePSR, DiffPSR
from difficp_tpu.utils.io import read_point_sets


def icp_atlas(
    x0,
    GMM_parameters: dict,
    registration_parameters: dict,
    numerical_options: Optional[dict] = None,
    optim_options: Optional[dict] = None,
    callback_function=None,
    printstuff: bool = True,
    seed: int = 0,
):
    init = GMM_parameters.get("init_components")
    assert (
        isinstance(init, int)
        or (isinstance(init, tuple) and init[0] == "set")
        or (isinstance(init, dict) and set(init.keys()) == {"set", "C"})
        or isinstance(init, list)
    ), "Wrong format for GMM_parameters['init_components']"

    ow = GMM_parameters.get("outlier_weight")
    assert ow is None or ow == "optimize" or isinstance(ow, (int, float))
    fixed_sigma = GMM_parameters.get("fixed_sigma")
    assert fixed_sigma is None or fixed_sigma > 0

    reg_type = registration_parameters.get("type")
    assert reg_type in common.ALLOWED_REG_TYPES
    is_diff = reg_type == "diffeomorphic"
    if is_diff:
        assert {"lambda_LDDMM", "sigma_LDDMM"}.issubset(registration_parameters)

    numerical_options = common.default_numerical_options(numerical_options)
    optim_options = common.default_optim_options(optim_options)
    tol = optim_options["convergence_tolerance"]

    nested, k_frames, s_structs, d = read_point_sets(x0)

    ### GMM init modes (ICP_atlas.py:162-203)
    use_outliers = ow is not None
    opt_sigma = fixed_sigma is None
    opt_w = GMM_parameters.get("optimize_weights")
    opt_w = True if opt_w is None else opt_w
    ensure_continuum = bool(GMM_parameters.get("ensure_continuum") or False)
    reinit_mu, reinit_sigma = False, False
    key = jax.random.PRNGKey(seed)

    gmm_states, gmm_cfgs = [], []
    if isinstance(init, int):
        for s in range(s_structs):
            st, cfg = gmm_mod.create(
                jnp.zeros((init, d), jnp.float32), sigma=1.0,
                use_outliers=use_outliers,
            )
            gmm_states.append(st)
            gmm_cfgs.append(cfg)
        reinit_mu, reinit_sigma = True, opt_sigma
    elif isinstance(init, tuple):
        i = init[1]
        for s in range(s_structs):
            st, cfg = gmm_mod.create(
                jnp.asarray(np.asarray(nested[i][s], np.float32)),
                use_outliers=use_outliers,
            )
            gmm_states.append(st)
            gmm_cfgs.append(cfg)
        reinit_mu, reinit_sigma = False, opt_sigma
    elif isinstance(init, dict):
        i, c = init["set"], init["C"]
        for s in range(s_structs):
            key, kf = jax.random.split(key)
            st, cfg = gmm_mod.fit(
                jnp.asarray(np.asarray(nested[i][s], np.float32)), c, kf,
                use_outliers=use_outliers,
            )
            gmm_states.append(st)
            gmm_cfgs.append(cfg)
    else:
        for st, cfg in init:
            gmm_states.append(gmm_mod.GMMState(*map(jnp.asarray, st)))
            gmm_cfgs.append(cfg)

    for s in range(s_structs):
        st, cfg = gmm_states[s], gmm_cfgs[s]
        if isinstance(ow, (int, float)):
            st = st._replace(eta0=jnp.asarray(float(ow)))
        cfg = cfg._replace(
            optimize_mu=True,
            optimize_sigma=opt_sigma,
            optimize_w=opt_w,
            optimize_eta0=(ow == "optimize"),
            ensure_continuum=ensure_continuum,
            use_outliers=use_outliers,
        )
        if not opt_sigma:
            st = st._replace(sigma=jnp.asarray(float(fixed_sigma)))
        gmm_states[s], gmm_cfgs[s] = st, cfg

    ### Build the PSR object
    if is_diff:
        lam = registration_parameters["lambda_LDDMM"]
        if lam == "auto":
            from difficp_tpu.models.calibration import calibrate_lambda_lddmm

            if printstuff:
                print("Automatic calibration of lambda_LDDMM (ad hoc, unstable)...")
            n_pairs = min(k_frames - 1, 10)
            lams = []
            for i in range(n_pairs):
                try:
                    lams.append(
                        calibrate_lambda_lddmm(
                            nested[i][0], nested[i + 1][0],
                            registration_parameters["sigma_LDDMM"],
                        )
                    )
                except Exception as e:
                    if printstuff:
                        print(f"    calibration pair {i} failed: {e!r}")
                    continue
            lams = np.asarray([l for l in lams if np.isfinite(l) and l > 0])
            if lams.size == 0:
                raise RuntimeError(
                    "lambda_LDDMM='auto' calibration failed on every frame "
                    "pair (all NaN/non-positive/raised). Pass an explicit "
                    "lambda_LDDMM value."
                )
            lam = float(1.0 / np.mean(1.0 / lams))  # harmonic mean
            if printstuff:
                print(f"    lambda_LDDMM = {lam}")
        lcfg = common.build_lddmm_config(
            registration_parameters, numerical_options, lam
        )
        psr = DiffPSR(nested, gmm_states, gmm_cfgs, lcfg)
        supp = numerical_options["support_LDDMM"]
        if supp["scheme"] != "dense":
            psr.set_support_scheme(**supp)
        evol = {"a0": [], "GMMi": []}
    else:
        acfg = common.build_affine_config(reg_type)
        psr = AffinePSR(nested, gmm_states, gmm_cfgs, acfg)
        evol = {"M": [], "t": [], "GMMi": []}

    psr.reinitialize_GMM(do_mu=reinit_mu, do_sigma=reinit_sigma, seed=seed)
    psr.printstuff = printstuff

    ### Alternating loop (ICP_atlas.py:269-298)
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

        if it != 0 or reinit_mu:
            psr.GMM_opt(max_iterations=optim_options["max_repeat_GMM"], tol=tol)
        if callback_function is not None:
            callback_function(psr, True)
        if is_diff:
            psr.Reg_opt(tol=tol, nmax=10,
                        carry_memory=numerical_options["carry_memory_LDDMM"],
                        frame_chunk=numerical_options["frame_chunk_LDDMM"])
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
