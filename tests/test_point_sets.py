"""Point-set utilities: intrinsic scale, blurred point-set distance (brute
force parity), grid support coverage, padding round trips."""

import numpy as np
import jax.numpy as jnp

from difficp_tpu.utils.io import pad_frames, pad_structures, read_point_sets
from difficp_tpu.utils.point_sets import (
    grid_support,
    intrinsic_scale,
    point_set_distance,
)

rng = np.random.default_rng(0)
X = rng.normal(size=(40, 2)).astype(np.float32)
Y = rng.normal(size=(30, 2)).astype(np.float32)


def test_intrinsic_scale_regular_grid():
    g = np.stack(np.meshgrid(np.arange(5.0), np.arange(5.0)), -1).reshape(-1, 2)
    s = intrinsic_scale(g.astype(np.float32))
    assert abs(s - 1.0) < 1e-5  # NN distance on a unit grid is 1


def test_point_set_distance_bruteforce():
    """Match the closed-form L2 distance of Gaussian-blurred clouds
    (reference point_sets.py:46-95)."""
    sx, sy = 0.4, 0.3

    def blur_ip(a, b, sa, sb):
        # <fA, fB> with N(mu1,s1)*N(mu2,s2) inner product formula
        s = np.sqrt(sa**2 + sb**2)
        d = a.shape[1]
        c = 1.0 / ((2 * np.pi) ** (d / 2) * s**d)
        tot = 0.0
        for i in range(a.shape[0]):
            for j in range(b.shape[0]):
                z2 = ((a[i] - b[j]) ** 2).sum()
                tot += c * np.exp(-z2 / (2 * s**2))
        return tot / (a.shape[0] * b.shape[0])

    want = (
        blur_ip(X, X, sx, sx) + blur_ip(Y, Y, sy, sy) - 2 * blur_ip(X, Y, sx, sy)
    )
    got = float(point_set_distance(X, Y, sigma_x=sx, sigma_y=sy))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_point_set_distance_zero_on_identical():
    d = float(point_set_distance(X, X, sigma_x=0.3, sigma_y=0.3))
    assert abs(d) < 1e-5


def test_grid_support_covers_points():
    r = 0.5
    grid = grid_support(X, r)
    d2 = ((X[:, None, :] - grid[None, :, :]) ** 2).sum(-1)
    # every point within one grid-diagonal of a grid point
    assert (np.sqrt(d2.min(1)) <= r).all()


def test_pad_frames_roundtrip():
    sets = [rng.normal(size=(n, 2)).astype(np.float32) for n in (10, 17, 13)]
    pf = pad_frames(sets)
    assert pf.x.shape[0] == 3 and pf.x.shape[1] % 8 == 0
    for k, s in enumerate(sets):
        np.testing.assert_allclose(pf.unpad(k), s)
        assert float(pf.mask[k].sum()) == s.shape[0]


def test_read_point_sets_formats():
    single = X
    x, k, s, d = read_point_sets(single)
    assert (k, s, d) == (1, 1, 2)
    x, k, s, d = read_point_sets([X, Y])
    assert (k, s, d) == (2, 1, 2)
    x, k, s, d = read_point_sets([[X, Y], [Y, X]])
    assert (k, s, d) == (2, 2, 2)
    structs = pad_structures([[X, Y], [Y, X]])
    assert len(structs) == 2 and structs[0].k == 2


def test_point_set_distance_intrinsic_scale_warning():
    """A requested blur below the set's intrinsic (mean-NN) scale warns,
    like the reference (point_sets.py:67-75); at/above it stays silent."""
    import warnings

    s_int = intrinsic_scale(X)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        point_set_distance(X, Y, sigma_x=0.1 * s_int, sigma_y=1.0)
    assert any("intrinsic scale" in str(w.message) for w in rec)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        point_set_distance(X, Y, sigma_x=2.0 * s_int,
                           sigma_y=2.0 * intrinsic_scale(Y))
    assert not [w for w in rec if "intrinsic scale" in str(w.message)]
