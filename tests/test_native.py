"""Native decimation kernel: cover property + parity with the Python greedy
reference, and the dispatch in utils.point_sets.decimate."""

import numpy as np
import pytest

from difficp_tpu.utils.point_sets import decimate


def _python_greedy(x, r):
    # reference algorithm verbatim semantics (point_sets.py:102-133)
    n = x.shape[0]
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    cov = d2 <= r * r
    notcovered = list(range(n))
    kept = []
    while notcovered:
        sub = cov[np.ix_(notcovered, notcovered)]
        i = int(sub.sum(axis=0).argmax())
        gid = notcovered[i]
        kept.append(gid)
        neigh = set(np.nonzero(cov[gid])[0].tolist())
        notcovered = [j for j in notcovered if j not in neigh]
    return kept


def test_native_builds_and_covers():
    pytest.importorskip("ctypes")
    from difficp_tpu.native import decimate_native

    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 2)).astype(np.float32)
    r = 0.4
    kept = decimate_native(x, r)
    assert len(kept) > 0
    # cover property: every point within r of some kept point
    d2 = ((x[:, None, :] - x[None, kept, :]) ** 2).sum(-1)
    assert (d2.min(axis=1) <= r * r + 1e-6).all()
    # greedy size close to the python reference's
    ref = _python_greedy(x, r)
    assert abs(len(kept) - len(ref)) <= max(2, 0.15 * len(ref))


def test_native_3d():
    from difficp_tpu.native import decimate_native

    rng = np.random.default_rng(1)
    x = rng.normal(size=(400, 3)).astype(np.float32)
    r = 0.8
    kept = decimate_native(x, r)
    d2 = ((x[:, None, :] - x[None, kept, :]) ** 2).sum(-1)
    assert (d2.min(axis=1) <= r * r + 1e-6).all()


def test_decimate_dispatch_covers():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(300, 2)).astype(np.float32)
    kept, rejected = decimate(x, 0.5)
    assert sorted(kept + rejected) == list(range(300))
    d2 = ((x[:, None, :] - x[None, kept, :]) ** 2).sum(-1)
    assert (d2.min(axis=1) <= 0.25 + 1e-6).all()
