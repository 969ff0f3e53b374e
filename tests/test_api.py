"""API-level smoke + behavior tests (kept small for CPU CI).

Mirrors the reference's example usages: two-set registration (diffeomorphic
and affine), atlas building, and the standard (template-deforms) variants.
"""

import os

import numpy as np
import pytest

from difficp_tpu.api import icp_two_set, icp_atlas, standard_two_set, standard_atlas

HERE = os.path.dirname(__file__)
SPIRAL = np.load(os.path.join(HERE, "goldens", "spiral.npz"))

X0 = SPIRAL["x0"]  # ~106 2D points
X1 = SPIRAL["x1"]  # ~118 2D points (different deformation of same GMM)


def test_two_set_diffeomorphic():
    psr, evol = icp_two_set(
        X0, X1,
        GMM_parameters={"sigma": 0.1, "optimize_sigma": True, "outlier_weight": None},
        registration_parameters={
            "type": "diffeomorphic", "lambda_LDDMM": 200.0, "sigma_LDDMM": 0.2,
        },
        optim_options={"max_iterations": 6, "convergence_tolerance": 1e-4,
                       "max_repeat_GMM": 15},
        printstuff=False,
    )
    assert psr.FE is not None
    assert psr.fe_increase_events == 0
    # registration should reduce point-to-target distances a lot vs start
    resid = psr.quadloss.sum()
    assert resid < 500.0
    assert len(evol["GMMi"]) >= 3
    # sigma shrank from 0.1 towards the match scale
    assert float(psr.gmm[0].sigma) < 0.1


def test_two_set_affine():
    th = 0.35
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)
    rng = np.random.default_rng(1)
    # noise keeps sigma away from the degenerate exact-fit collapse
    xa = (
        X0 @ rot.T
        + np.array([0.4, -0.1], np.float32)
        + 0.02 * rng.standard_normal(X0.shape).astype(np.float32)
    )
    psr, _ = icp_two_set(
        xa, X0,
        GMM_parameters={"sigma": 0.1, "optimize_sigma": True, "outlier_weight": None},
        registration_parameters={"type": "rigid"},
        optim_options={"max_iterations": 20, "convergence_tolerance": 1e-5,
                       "max_repeat_GMM": 20},
        printstuff=False,
    )
    # recovered rotation should be close to rot^{-1}
    m = np.asarray(psr.M[0])
    np.testing.assert_allclose(m @ rot, np.eye(2), atol=0.15)
    assert psr.fe_increase_events == 0


def test_two_set_outliers():
    rng = np.random.default_rng(0)
    xa = np.concatenate([X0, rng.uniform(-0.5, 1.5, (15, 2)).astype(np.float32)])
    psr, _ = icp_two_set(
        xa, X1,
        GMM_parameters={"sigma": 0.1, "optimize_sigma": True,
                        "outlier_weight": "optimize"},
        registration_parameters={
            "type": "diffeomorphic", "lambda_LDDMM": 200.0, "sigma_LDDMM": 0.2,
        },
        optim_options={"max_iterations": 4, "convergence_tolerance": 1e-4,
                       "max_repeat_GMM": 10},
        printstuff=False,
    )
    # outlier odds should have moved away from 0 (some outliers detected)
    assert np.isfinite(float(psr.gmm[0].eta0))
    assert psr.fe_increase_events == 0


def test_gmm_xb_hack():
    from difficp_tpu.models import gmm as gmm_mod
    import jax.numpy as jnp

    state, cfg = gmm_mod.create(jnp.asarray(SPIRAL["mu0"]), sigma=0.15)
    cfg = gmm_mod.fix(cfg)._replace(optimize_sigma=True)
    psr, _ = icp_two_set(
        X0, (state, cfg), None,
        registration_parameters={
            "type": "diffeomorphic", "lambda_LDDMM": 200.0, "sigma_LDDMM": 0.2,
        },
        optim_options={"max_iterations": 3, "convergence_tolerance": 1e-4},
        printstuff=False,
    )
    assert psr.fe_increase_events == 0


def test_atlas_diffeomorphic_small():
    x = [SPIRAL[f"x{k}"] for k in range(4)]
    psr, evol = icp_atlas(
        x,
        GMM_parameters={"init_components": ("set", 0), "optimize_weights": True,
                        "outlier_weight": None},
        registration_parameters={
            "type": "diffeomorphic", "lambda_LDDMM": 500.0, "sigma_LDDMM": 0.2,
        },
        numerical_options={"support_LDDMM": {"scheme": "grid", "rho": 1.0}},
        optim_options={"max_iterations": 4, "convergence_tolerance": 1e-4,
                       "max_repeat_GMM": 10},
        printstuff=False,
    )
    assert psr.K == 4
    assert psr.fe_increase_events == 0
    # all frames pulled toward the common GMM: quadlosses finite & modest
    assert np.isfinite(psr.quadloss).all()


def test_atlas_affine_int_init():
    x = [SPIRAL[f"x{k}"] for k in range(3)]
    psr, _ = icp_atlas(
        x,
        GMM_parameters={"init_components": 15},
        registration_parameters={"type": "similarity"},
        optim_options={"max_iterations": 5, "convergence_tolerance": 1e-4,
                       "max_repeat_GMM": 10},
        printstuff=False,
    )
    assert psr.fe_increase_events == 0


def test_standard_two_set_diff():
    psr, _ = standard_two_set(
        X0, X1,
        model_parameters={"type": "diffeomorphic", "sigma_data": 0.1,
                          "noise_std": 0.2, "sigma_LDDMM": 0.2},
        optim_options={"max_iterations": 4, "convergence_tolerance": 1e-4,
                       "nmax_per_iter": 4},
        printstuff=False,
    )
    assert psr.e_increase_events == 0
    assert psr.E < psr_initial_energy(X0, X1, 0.1, 0.2)


def psr_initial_energy(xa, xb, sigma_data, noise_std):
    from difficp_tpu.models.psr_standard import data_distance
    import jax.numpy as jnp

    return float(
        data_distance(jnp.asarray(xb), jnp.asarray(xa), sigma_data)
    ) / noise_std**2 + 1.0


def test_standard_two_set_affine():
    th = 0.3
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)
    xa = X0 @ rot.T + np.array([0.3, 0.1], np.float32)
    psr, _ = standard_two_set(
        xa, X0,
        model_parameters={"type": "rigid", "sigma_data": 0.1},
        optim_options={"max_iterations": 6, "convergence_tolerance": 1e-5,
                       "nmax_per_iter": 6},
        printstuff=False,
    )
    m = np.asarray(psr.M[0])
    np.testing.assert_allclose(m @ rot, np.eye(2), atol=0.2)


def test_standard_atlas_small():
    x = [SPIRAL[f"x{k}"] for k in range(3)]
    psr, evol = standard_atlas(
        x, initial_template=0,
        model_parameters={"sigma_data": 0.1, "noise_std": 0.2,
                          "sigma_LDDMM": 0.2},
        optim_options={"max_iterations": 3, "convergence_tolerance": 1e-4},
        printstuff=False,
    )
    assert psr.e_increase_events <= 1  # template re-projection may wobble once
    assert len(evol["y0"]) == 3


def test_standard_atlas_template_weights():
    x = [SPIRAL[f"x{k}"][:40] for k in range(3)]
    psr, evol = standard_atlas(
        x, initial_template=0,
        model_parameters={"sigma_data": 0.12, "noise_std": 0.3,
                          "sigma_LDDMM": 0.25, "use_template_weights": True},
        optim_options={"max_iterations": 2, "convergence_tolerance": 1e-4},
        printstuff=False,
    )
    assert "w0" in evol and len(evol["w0"]) == 2
    w = np.asarray(psr.w0[0])
    assert np.isfinite(w).all()
    # weights moved away from uniform but stay near a distribution
    assert abs(float(w.sum()) - 1.0) < 0.5


def test_standard_two_set_similarity_expm():
    th = 0.25
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]],
                   np.float32)
    xa = 1.2 * (X0 @ rot.T) + np.array([0.2, 0.1], np.float32)
    psr, _ = standard_two_set(
        xa, X0,
        model_parameters={"type": "similarity", "sigma_data": 0.1},
        optim_options={"max_iterations": 6, "convergence_tolerance": 1e-5,
                       "nmax_per_iter": 6},
        printstuff=False,
    )
    m = np.asarray(psr.M[0])
    # recovered M ~ (1/1.2) rot^{-1}: orthogonal direction + scale < 1
    scale = np.sqrt(np.abs(np.linalg.det(m)))
    assert 0.6 < scale < 1.05


def test_affine_fused_run_matches_stepwise():
    from difficp_tpu.models import gmm as gmm_mod
    from difficp_tpu.models import affine as affine_mod
    from difficp_tpu.models.psr import AffinePSR
    import jax.numpy as jnp

    def build():
        state, cfg = gmm_mod.create(jnp.asarray(SPIRAL["mu0"]), sigma=0.1)
        cfg = cfg._replace(optimize_mu=True, optimize_w=True)
        acfg = affine_mod.AffineConfig(version="similarity", withlogdet=True)
        psr = AffinePSR([SPIRAL[f"x{k}"] for k in range(3)], state, cfg, acfg)
        psr.printstuff = False
        return psr

    a = build()
    for _ in range(4):
        a.GMM_opt(max_iterations=10, tol=1e-3)
        a.Reg_opt()
    b = build()
    fes = b.run(4, max_em=10, em_tol=1e-3)
    assert len(fes) == 4
    assert b.fe_increase_events == 0
    assert abs(b.FE - a.FE) < 5e-3 * abs(a.FE), (b.FE, a.FE)
    np.testing.assert_allclose(np.asarray(b.M), np.asarray(a.M), rtol=1e-3,
                               atol=1e-4)


def test_standard_two_set_grid_support():
    psr, _ = standard_two_set(
        X0, X1,
        model_parameters={"type": "diffeomorphic", "sigma_data": 0.1,
                          "noise_std": 0.2, "sigma_LDDMM": 0.2},
        numerical_options={"support_LDDMM": {"scheme": "grid", "rho": 1.2}},
        optim_options={"max_iterations": 3, "convergence_tolerance": 1e-4,
                       "nmax_per_iter": 3},
        printstuff=False,
    )
    assert psr.support_scheme == "grid"
    assert psr.e_increase_events == 0


def test_atlas_ensure_continuum():
    x = [SPIRAL[f"x{k}"] for k in range(3)]
    psr, _ = icp_atlas(
        x,
        GMM_parameters={"init_components": 12, "ensure_continuum": True},
        registration_parameters={"type": "diffeomorphic",
                                 "lambda_LDDMM": 500.0, "sigma_LDDMM": 0.2},
        optim_options={"max_iterations": 2, "convergence_tolerance": 1e-4,
                       "max_repeat_GMM": 5},
        printstuff=False,
    )
    # sigma is floored at the centroids' intrinsic scale
    from difficp_tpu.utils.point_sets import intrinsic_scale

    intr = intrinsic_scale(np.asarray(psr.gmm[0].mu))
    assert float(psr.gmm[0].sigma) >= 0.99 * intr


def test_affine_checkpoint_roundtrip(tmp_path):
    from difficp_tpu.models import gmm as gmm_mod
    from difficp_tpu.models import affine as affine_mod
    from difficp_tpu.models.psr import AffinePSR
    from difficp_tpu.utils.checkpoint import load_psr, save_psr
    import jax.numpy as jnp

    state, cfg = gmm_mod.create(jnp.asarray(SPIRAL["mu0"]), sigma=0.1)
    acfg = affine_mod.AffineConfig(version="rigid")
    psr = AffinePSR([X0, X1], state, cfg, acfg)
    psr.printstuff = False
    psr.GMM_opt(max_iterations=3, tol=1e-3)
    psr.Reg_opt()
    f = str(tmp_path / "aff.npy")
    save_psr(f, psr)
    psr2 = AffinePSR([X0, X1], state, cfg, acfg)
    psr2.printstuff = False
    load_psr(f, psr2)
    np.testing.assert_allclose(np.asarray(psr2.M), np.asarray(psr.M))
    assert abs(psr2.FE - psr.FE) < 1e-9
