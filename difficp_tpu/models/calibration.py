"""Ad hoc auto-calibration of the regularization tradeoff parameters.

Re-design of reference diffICP/core/calibration.py:25-133 (both procedures
are flagged experimental/unstable there; same caveat applies):

- ``calibrate_lambda_lddmm``: run a cheap affine ICP of x onto x2 to get a
  reference quadloss Lref, then minimize the relaxed constrained objective
  H0_ref * exp(quadloss/Lref) + ||a0||^2_rkhs and set
  lambda = Lref / deformation  (calibration.py:25-79).
- ``calibrate_noise_std``: the analogue for the standard algorithm
  (calibration.py:86-133).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from difficp_tpu.models import lddmm as lddmm_mod
from difficp_tpu.utils.point_sets import intrinsic_scale


def calibrate_lambda_lddmm(x, x2, sigma_lddmm) -> float:
    """Predict lambda_LDDMM for diffICP registration of x onto x2."""
    from difficp_tpu.api.icp_two_set import icp_two_set

    gmm_parameters = {"sigma": None, "optimize_sigma": True, "outlier_weight": None}
    registration_parameters = {"type": "general_affine"}
    optim_options = {
        "max_iterations": 30,
        "convergence_tolerance": 1e-4,
        "max_repeat_GMM": 25,
    }
    psr, _ = icp_two_set(
        x, x2, gmm_parameters, registration_parameters,
        optim_options=optim_options, printstuff=False,
    )
    n0 = int(psr.structs[0].n[0])
    y = psr.struct_view(psr.y, 0)[0][:n0]
    x1 = psr.struct_view(psr.x1, 0)[0][:n0]
    sigref = float(psr.gmm[0].sigma)
    l_ref = float(jnp.sum((x1 - y) ** 2) / (2.0 * sigref**2))

    x = jnp.asarray(np.asarray(x, np.float32))
    lcfg = lddmm_mod.make_config(
        sigma=sigma_lddmm, lambd=1.0, version="classic", scheme="Ralston", nt=10
    )
    a0 = lddmm_mod.v2p(lcfg, x, y - x, rcond=1e-2)
    h0_ref = float(lddmm_mod.hamiltonian(lcfg, x, a0))

    def exp_loss(pts):
        l = jnp.sum((pts - y) ** 2) / (2.0 * sigref**2)
        # clip the exponent: the reference notes this objective is prone to
        # overflow (calibration.py:56-57)
        return h0_ref * jnp.exp(jnp.minimum(l / l_ref, 30.0))

    res = lddmm_mod.optimize(lcfg, exp_loss, x, a0, tol=1e-3, nmax=20)
    deformation = float(lddmm_mod.hamiltonian(lcfg, x, res.p0))
    return l_ref / deformation


def calibrate_noise_std(x, x2, sigma_lddmm) -> float:
    """Predict noise_std for 'standard' diffeomorphic registration of
    template x onto data x2."""
    from difficp_tpu.api.standard_two_set import standard_two_set

    model_parameters = {
        "type": "general_affine",
        "sigma_data": intrinsic_scale(np.asarray(x2, np.float32)),
    }
    optim_options = {
        "max_iterations": 30,
        "convergence_tolerance": 1e-4,
    }
    psr, _ = standard_two_set(
        x, x2, model_parameters, optim_options=optim_options, printstuff=False
    )
    l_ref = float(psr.E)

    x = jnp.asarray(np.asarray(x, np.float32))
    x2 = jnp.asarray(np.asarray(x2, np.float32))
    lcfg = lddmm_mod.make_config(
        sigma=sigma_lddmm, lambd=1.0, version="classic", scheme="Euler", nt=10
    )
    tx = psr.Registration().apply(x)
    a0 = lddmm_mod.v2p(lcfg, x, tx - x, rcond=1e-2)
    h0_ref = float(lddmm_mod.hamiltonian(lcfg, x, a0))

    from difficp_tpu.models.psr_standard import data_distance

    def exp_loss(pts):
        l = data_distance(pts, x2, psr.data_sigma)
        return h0_ref * jnp.exp(jnp.minimum(l / l_ref, 30.0))

    res = lddmm_mod.optimize(lcfg, exp_loss, x, a0, tol=1e-3, nmax=20)
    regl = float(lddmm_mod.hamiltonian(lcfg, x, res.p0))
    return math.sqrt(l_ref / regl)
