"""Point-set helper functions: intrinsic scale, blurred point-set distance,
greedy decimation, grid support generation.

Re-designs of reference diffICP/tools/point_sets.py:13-133 and the grid
support construction of PSR.set_support_scheme (reference PSR.py:472-482).
Decimation is a host-side greedy set-cover (setup-time only); a C++
implementation is used when available (difficp_tpu/native), with a numpy
fallback.
"""

from __future__ import annotations

import math
import warnings

import jax.numpy as jnp
import numpy as np

from difficp_tpu.ops import backend as _backend
from difficp_tpu.ops.reductions import kred_scal


def intrinsic_scale(x, mask=None) -> float:
    """Mean nearest-neighbour distance of the point set — the minimal blur
    at which the set stops being resolvable (reference point_sets.py:13-26).

    Runs through the backend dispatch: dense below the pair limit, tiled
    blockwise/pallas Kmin(2) above it (usable at 100k+ points)."""
    nn2 = _backend.second_min_sqdist(jnp.asarray(x), mask)
    if mask is not None:
        m = jnp.asarray(mask)
        val = jnp.sqrt(nn2)
        return float(jnp.sum(jnp.where(m > 0, val, 0.0)) / jnp.sum(m))
    return float(jnp.mean(jnp.sqrt(nn2)))


def point_set_distance(
    x, y, sigma_x=None, sigma_y=None, w_x=None, w_y=None,
    mask_x=None, mask_y=None,
):
    """L2 distance between Gaussian-blurred point clouds, with scale mixing
    sigma_xy = sqrt(sigma_x^2 + sigma_y^2) and Gaussian normalization
    constants (reference point_sets.py:46-95)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    d = x.shape[1]
    # intrinsic-scale guard (reference point_sets.py:67-75): a requested
    # blur below the set's mean nearest-neighbour distance makes the
    # "blurred density" distance resolution-limited by sampling, not shape —
    # a user-facing footgun worth a setup-time warning (host-side only)
    s_x_int = intrinsic_scale(x, mask_x)
    if sigma_x is None:
        sigma_x = s_x_int
    elif sigma_x < s_x_int:
        warnings.warn(
            f"point_set_distance: requested sigma_x={sigma_x:.4g} is below "
            f"the intrinsic scale {s_x_int:.4g} of point set X. You should "
            "probably augment sigma_x.", stacklevel=2)
    s_y_int = intrinsic_scale(y, mask_y)
    if sigma_y is None:
        sigma_y = s_y_int
    elif sigma_y < s_y_int:
        warnings.warn(
            f"point_set_distance: requested sigma_y={sigma_y:.4g} is below "
            f"the intrinsic scale {s_y_int:.4g} of point set Y. You should "
            "probably augment sigma_y.", stacklevel=2)

    nx = float(mask_x.sum()) if mask_x is not None else x.shape[0]
    ny = float(mask_y.sum()) if mask_y is not None else y.shape[0]
    if w_x is None:
        w_x = (jnp.ones(x.shape[0]) if mask_x is None else jnp.asarray(mask_x)) / nx
    if w_y is None:
        w_y = (jnp.ones(y.shape[0]) if mask_y is None else jnp.asarray(mask_y)) / ny

    s_xx = math.sqrt(2.0) * sigma_x
    s_yy = math.sqrt(2.0) * sigma_y
    s_xy = math.sqrt(sigma_x**2 + sigma_y**2)

    def c(s):
        return 1.0 / ((2 * math.pi) ** (d / 2) * s**d)

    term_xx = c(s_xx) * jnp.sum(kred_scal(x, x, w_x, s_xx, mask_y=mask_x) * w_x)
    term_yy = c(s_yy) * jnp.sum(kred_scal(y, y, w_y, s_yy, mask_y=mask_y) * w_y)
    term_xy = c(s_xy) * jnp.sum(kred_scal(x, y, w_y, s_xy, mask_y=mask_y) * w_x)
    return term_xx + term_yy - 2.0 * term_xy


def decimate(x, r) -> tuple[list[int], list[int]]:
    """Greedy cover decimation: pick a subset such that every point lies
    within radius r of a kept point; repeatedly keep the point covering the
    most uncovered neighbours (reference point_sets.py:102-133).

    Host-side, setup-time only.  Uses the C++ kernel when built.
    :return: (kept indices, rejected indices)
    """
    x = np.asarray(x, np.float32)
    try:
        from difficp_tpu.native import decimate_native

        kept = decimate_native(x, float(r))
        kept_set = set(kept)
        rejected = [i for i in range(x.shape[0]) if i not in kept_set]
        return list(kept), rejected
    except Exception:
        pass

    n = x.shape[0]
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    cov = d2 <= r * r
    notcovered = np.arange(n)
    kept = []
    while notcovered.size:
        sub = cov[np.ix_(notcovered, notcovered)]
        i = int(sub.sum(axis=0).argmax())
        gid = int(notcovered[i])
        kept.append(gid)
        neigh = cov[gid]
        notcovered = notcovered[~neigh[notcovered]]
    kept_set = set(kept)
    rejected = [i for i in range(n) if i not in kept_set]
    return kept, rejected


def grid_support(points, rcover, relmargin=0.1, ticks=None) -> np.ndarray:
    """Rectangular grid of support points covering the data bounding box with
    step rcover (reference PSR.py:472-482; D-dimensional generalization).

    :param points: (N, D) array (or list of arrays) setting the bounds.
    :param ticks: optional explicit list of per-dimension tick arrays.
    :return: (Ngrid, D) float32 array of grid points.
    """
    if ticks is None:
        if isinstance(points, (list, tuple)):
            pts = np.concatenate([np.asarray(p).reshape(-1, np.asarray(p).shape[-1])
                                  for p in points], axis=0)
        else:
            pts = np.asarray(points).reshape(-1, np.asarray(points).shape[-1])
        lo = pts.min(axis=0)
        hi = pts.max(axis=0)
        mid_lo = (1 + relmargin) * lo - relmargin * hi
        mid_hi = (1 + relmargin) * hi - relmargin * lo
        ticks = [
            np.arange(mid_lo[d] - rcover / 2, mid_hi[d] + rcover / 2, rcover)
            for d in range(pts.shape[1])
        ]
    mesh = np.meshgrid(*ticks, indexing="xy")
    grid = np.stack(mesh, axis=-1).reshape(-1, len(ticks), order="F")
    return np.ascontiguousarray(grid, np.float32)
