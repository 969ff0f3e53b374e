"""End-to-end: diffICP_basic equivalent (single spiral point set onto a
fixed spiral GMM, sigma optimized) vs the torch reference golden run
(tests/make_goldens.py golden_basic; reference examples/diffICP_basic.py:74-119).

Acceptance (BASELINE.md targets): final free energy and residuals within ~1%
of the reference on the same seeded data, monotone free energy.
"""

import os

import numpy as np
import jax.numpy as jnp

from difficp_tpu.models import gmm, lddmm
from difficp_tpu.models.psr import DiffPSR

HERE = os.path.dirname(__file__)
SPIRAL = np.load(os.path.join(HERE, "goldens", "spiral.npz"))
REF = np.load(os.path.join(HERE, "goldens", "basic_run.npz"))


def build_psr():
    x0 = SPIRAL["x0"]  # first spiral point set (N~106, D=2)
    gmm_state = gmm.GMMState(
        mu=jnp.asarray(SPIRAL["mu0"]),
        w=jnp.zeros(SPIRAL["mu0"].shape[0]),
        sigma=jnp.asarray(0.1),
        eta0=jnp.asarray(0.0),
        vol0=jnp.asarray(0.0),
    )
    gmm_cfg = gmm.GMMConfig(
        use_outliers=False, optimize_mu=False, optimize_sigma=True,
        optimize_w=False, optimize_eta0=False,
    )
    lcfg = lddmm.make_config(
        sigma=0.2, lambd=5e2, version="classic", nt=10, scheme="Euler"
    )
    psr = DiffPSR(x0, gmm_state, gmm_cfg, lcfg)
    psr.printstuff = False
    psr.set_support_scheme("grid", rho=float(np.sqrt(2.0)))
    return psr


def test_basic_run_matches_reference():
    psr = build_psr()
    fes = []
    for it in range(20):
        psr.GMM_opt(tol=1e-5)
        psr.Reg_opt(tol=1e-5, nmax=10)
        fes.append(psr.FE)

    fe_ref = float(REF["FE_seq"][-1])
    assert abs(psr.FE - fe_ref) < 0.01 * abs(fe_ref), (psr.FE, fe_ref)

    # sigma of the GMM converges to the same value.  Tolerance traceable to
    # measurement (tests/measure_sigma_spread.py, goldens/sigma_spread.json):
    # the torch reference's final sigma moves 7.7e-4 relative under 1e-4
    # input jitter, and our implementation lands 1.1e-4 relative from the
    # reference value — assert at 2e-3 (~2.6x the reference's own spread;
    # was rtol=0.05 before the r5 measurement).
    np.testing.assert_allclose(
        float(psr.gmm[0].sigma), float(REF["final_sigma"]), rtol=2e-3
    )

    # warped points land on the same configuration
    n = int(psr.structs[0].n[0])
    x1 = np.asarray(psr.x1[0])[:n]
    x1_ref = REF["final_x1"]
    resid = np.sqrt(((x1 - x1_ref) ** 2).sum(-1))
    assert resid.mean() < 0.02, resid.mean()

    # free energy decreases monotonically across outer iterations
    fes = np.asarray(fes)
    assert np.all(np.diff(fes) <= 1e-3 * np.abs(fes[:-1]) + 1e-4)
    # and no FE-increase warnings fired during the run
    assert psr.fe_increase_events == 0


def test_registration_handle_and_backward():
    psr = build_psr()
    for _ in range(3):
        psr.GMM_opt(tol=1e-5)
        psr.Reg_opt(tol=1e-4, nmax=3)
    reg = psr.Registration()
    pts = jnp.asarray(SPIRAL["x0"][:20])
    fwd = reg.apply(pts)
    back = reg.backward(fwd)
    # (q1, -p1) back-shooting is the exact inverse only up to the nt=10
    # Euler discretization error
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=2e-2)


def test_fused_run_matches_stepwise():
    """DiffPSR.run (one compiled program) tracks the step-by-step loop."""
    psr_a = build_psr()
    psr_b = build_psr()
    for _ in range(5):
        psr_a.GMM_opt(max_iterations=25, tol=1e-3)
        psr_a.Reg_opt(tol=1e-3, nmax=10)
    fes = psr_b.run(5, max_em=25, em_tol=1e-3, reg_nmax=10, reg_tol=1e-3)
    assert len(fes) == 5
    assert psr_b.fe_increase_events == 0
    # same trajectory of free energies (within optimizer noise)
    assert abs(psr_b.FE - psr_a.FE) < 5e-3 * abs(psr_a.FE), (psr_b.FE, psr_a.FE)
    n = int(psr_a.structs[0].n[0])
    x1a = np.asarray(psr_a.x1[0])[:n]
    x1b = np.asarray(psr_b.x1[0])[:n]
    assert np.sqrt(((x1a - x1b) ** 2).sum(-1)).mean() < 0.01


def test_fused_run_chunked_equals_unchunked():
    psr_a = build_psr()
    psr_b = build_psr()
    fes_a = psr_a.run(4, max_em=10, em_tol=1e-3, reg_nmax=3, reg_tol=1e-3)
    fes_b = psr_b.run(4, max_em=10, em_tol=1e-3, reg_nmax=3, reg_tol=1e-3,
                      chunk=2)
    np.testing.assert_allclose(fes_a, fes_b, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(psr_a.a0), np.asarray(psr_b.a0),
                               rtol=1e-4, atol=1e-5)
