"""End-to-end atlas: diffICP_multi equivalent (K=10 spirals, C=20 GMM
inferred by EM, hybrid LDDMM) vs the torch reference golden run
(tests/make_goldens.py golden_multi; reference examples/diffICP_multi.py:58-99).
"""

import os

import numpy as np
import jax.numpy as jnp

from difficp_tpu.models import gmm, lddmm
from difficp_tpu.models.psr import DiffPSR

HERE = os.path.dirname(__file__)
SPIRAL = np.load(os.path.join(HERE, "goldens", "spiral.npz"))
REF = np.load(os.path.join(HERE, "goldens", "multi_run.npz"))


def test_multi_atlas_matches_reference():
    x = [SPIRAL[f"x{k}"] for k in range(10)]
    gmm_state = gmm.GMMState(
        mu=jnp.asarray(REF["mu_init"]),  # same initial centroids as reference
        w=jnp.zeros(20),
        sigma=jnp.asarray(gmm.create(jnp.asarray(REF["mu_init"]))[0].sigma),
        eta0=jnp.asarray(0.0),
        vol0=jnp.asarray(0.0),
    )
    gcfg = gmm.GMMConfig(
        optimize_mu=True, optimize_sigma=True, optimize_w=True,
        optimize_eta0=False,
    )
    lcfg = lddmm.make_config(sigma=0.2, lambd=5e2, version="hybrid",
                             nt=10, scheme="Euler")
    psr = DiffPSR(x, gmm_state, gcfg, lcfg)
    psr.printstuff = False
    psr.set_support_scheme("grid", rho=1.0)

    fes = []
    n_iter = 8  # compare against the reference at the same iteration count
    for it in range(n_iter):
        psr.GMM_opt(max_iterations=25, tol=1e-3)
        psr.Reg_opt(tol=1e-3, nmax=10)
        fes.append(psr.FE)

    fe_ref = float(REF["FE_seq"][n_iter - 1])
    # free energy within 1% of the torch reference run at the same iteration
    assert abs(psr.FE - fe_ref) < 0.01 * abs(fe_ref), (psr.FE, fe_ref)
    # GMM sigma at the MATCHED iteration count (the golden's final_sigma is
    # at 15 iterations; comparing iteration 8 against it measured 11%
    # mid-convergence gap — that was the old rtol=0.15).  Run the remaining
    # 7 alternations and assert at rtol 0.05, traceable to measurement
    # (tests/measure_sigma_spread.py, goldens/sigma_spread.json): reference
    # run-to-run spread under 1e-4 jitter = 4.7e-4 relative; our
    # implementation's matched-iteration deviation = 2.45e-2 (optimizer-
    # path divergence of the multimodal C=20 clustering, ~2x headroom).
    for it in range(n_iter, 15):
        psr.GMM_opt(max_iterations=25, tol=1e-3)
        psr.Reg_opt(tol=1e-3, nmax=10)
        fes.append(psr.FE)
    np.testing.assert_allclose(
        float(psr.gmm[0].sigma), float(REF["final_sigma"]), rtol=0.05
    )
    # warped point clouds match the reference's registered configuration:
    # compare mean nearest-neighbour distance between both results per frame
    for k in range(0, 10, 3):
        n = int(psr.structs[0].n[k])
        ours = np.asarray(psr.x1[k])[:n]
        ref = REF[f"x1_{k}"]
        d2 = ((ours[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
        assert np.sqrt(d2.min(1)).mean() < 0.05
    # monotone FE across outer iterations
    fes = np.asarray(fes)
    assert np.all(np.diff(fes) <= 1e-3 * np.abs(fes[:-1]) + 1e-3)


def test_multi_atlas_fused_run_matches_golden():
    """The fused on-device loop (DiffPSR.run — the K=64 bench path) on the
    same diffICP_multi workload: must track the torch reference golden FE at
    matched iteration count and stay monotone, like the stepwise path."""
    x = [SPIRAL[f"x{k}"] for k in range(10)]
    gmm_state = gmm.GMMState(
        mu=jnp.asarray(REF["mu_init"]),
        w=jnp.zeros(20),
        sigma=jnp.asarray(gmm.create(jnp.asarray(REF["mu_init"]))[0].sigma),
        eta0=jnp.asarray(0.0),
        vol0=jnp.asarray(0.0),
    )
    gcfg = gmm.GMMConfig(
        optimize_mu=True, optimize_sigma=True, optimize_w=True,
        optimize_eta0=False,
    )
    lcfg = lddmm.make_config(sigma=0.2, lambd=5e2, version="hybrid",
                             nt=10, scheme="Euler")
    psr = DiffPSR(x, gmm_state, gcfg, lcfg)
    psr.printstuff = False
    psr.set_support_scheme("grid", rho=1.0)

    n_iter = 8
    fes = psr.run(n_iter, max_em=25, em_tol=1e-3, reg_nmax=10, reg_tol=1e-3,
                  chunk=4)
    assert psr.fe_increase_events == 0
    fe_ref = float(REF["FE_seq"][n_iter - 1])
    assert abs(psr.FE - fe_ref) < 0.01 * abs(fe_ref), (psr.FE, fe_ref)
    assert len(fes) == n_iter
    # warped clouds also track the reference configuration
    for k in (0, 5):
        n = int(psr.structs[0].n[k])
        ours = np.asarray(psr.x1[k])[:n]
        ref = REF[f"x1_{k}"]
        d2 = ((ours[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
        assert np.sqrt(d2.min(1)).mean() < 0.05
