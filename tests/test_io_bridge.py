"""VTK landmark IO round-trip, Deformetrica-output replay, checkpoint
save/load round-trip, and chui loading (when the reference data is present)."""

import os

import numpy as np
import pytest

from difficp_tpu.utils.vtk_io import read_landmarks, write_landmarks


def test_vtk_roundtrip_2d(tmp_path):
    pts = np.random.default_rng(0).normal(size=(37, 2)).astype(np.float32)
    f = str(tmp_path / "pts.vtk")
    write_landmarks(f, pts)
    back = read_landmarks(f)
    np.testing.assert_allclose(back, pts, rtol=1e-6)


def test_vtk_roundtrip_3d(tmp_path):
    pts = np.random.default_rng(1).normal(size=(21, 3)).astype(np.float32)
    f = str(tmp_path / "pts.vtk")
    write_landmarks(f, pts)
    back = read_landmarks(f)
    assert back.shape == (21, 3)
    np.testing.assert_allclose(back, pts, rtol=1e-6)


def test_deformetrica_replay(tmp_path):
    """Replay a synthetic Deformetrica output dir through DiffPSRStd: the
    imported control points / momenta must shoot to the same trajectories
    (the reference's parity check, deformetrica_atlas.py:215-220)."""
    from difficp_tpu.api.deformetrica_atlas import load_deformetrica_output
    import jax.numpy as jnp
    from difficp_tpu.models import lddmm as lddmm_mod

    rng = np.random.default_rng(2)
    k_frames, n, d, nq = 3, 25, 2, 12
    x = [rng.normal(size=(n, d)).astype(np.float32) for _ in range(k_frames)]
    template = rng.normal(size=(n, d)).astype(np.float32)
    q0 = rng.normal(size=(nq, d)).astype(np.float32)
    a0 = 0.1 * rng.normal(size=(k_frames, nq, d)).astype(np.float32)

    out = tmp_path / "out"
    out.mkdir()
    write_landmarks(
        str(out / "DeterministicAtlas__EstimatedParameters__Template_pointset.vtk"),
        template,
    )
    np.savetxt(
        str(out / "DeterministicAtlas__EstimatedParameters__ControlPoints.txt"), q0
    )
    with open(
        str(out / "DeterministicAtlas__EstimatedParameters__Momenta.txt"), "w"
    ) as f:
        f.write(f"{k_frames} {nq} {d}\n\n")
        for kk in range(k_frames):
            for row in a0[kk]:
                f.write(f"{row[0]} {row[1]}\n")

    psr = load_deformetrica_output(x, str(out), sigma_data=0.5, noise_std=0.3,
                                   sigma_lddmm=0.5)
    assert psr.K == k_frames
    np.testing.assert_allclose(np.asarray(psr.a0), a0, rtol=1e-5)
    # warped template for frame 0 equals an explicit shoot with the imports
    lcfg = lddmm_mod.make_config(sigma=0.5, lambd=2.0, version="classic",
                                 scheme="Euler", nt=10)
    final, _ = lddmm_mod.shoot(lcfg, jnp.asarray(q0), jnp.asarray(a0[0]),
                               jnp.asarray(template))
    np.testing.assert_allclose(
        np.asarray(psr.y1[0]), np.asarray(final.x), rtol=1e-4, atol=1e-5
    )


def test_checkpoint_roundtrip(tmp_path):
    from difficp_tpu.models import gmm, lddmm
    from difficp_tpu.models.psr import DiffPSR
    from difficp_tpu.utils.checkpoint import load_psr, save_psr

    spiral = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                                  "spiral.npz"))
    x = [spiral[f"x{k}"] for k in range(3)]
    state, cfg = gmm.create(spiral["mu0"], sigma=0.1)
    lcfg = lddmm.make_config(sigma=0.2, lambd=500.0, version="hybrid", nt=5,
                             scheme="Euler")
    psr = DiffPSR(x, state, cfg, lcfg)
    psr.printstuff = False
    psr.GMM_opt(max_iterations=3, tol=1e-4)
    psr.Reg_opt(tol=1e-3, nmax=1)
    f = str(tmp_path / "ckpt.npy")
    save_psr(f, psr)

    psr2 = DiffPSR(x, state, cfg, lcfg)
    psr2.printstuff = False
    load_psr(f, psr2)
    assert abs(psr2.FE - psr.FE) < 1e-9
    np.testing.assert_allclose(np.asarray(psr2.a0), np.asarray(psr.a0))
    # resumed optimization continues decreasing
    psr2.GMM_opt(max_iterations=3, tol=1e-4)
    assert psr2.FE <= psr.FE + 1e-3 * abs(psr.FE)


def test_chui_loading():
    try:
        from difficp_tpu.examples.chui import load_chui

        xa, xb = load_chui(3)
    except FileNotFoundError:
        pytest.skip("chui data not available")
    assert xa.shape[1] == 2 and xb.shape[1] == 2
    assert 40 <= xa.shape[0] <= 120
