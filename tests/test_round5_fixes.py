"""Round-5 regression tests: device-derived VMEM budgets, the sym-table
mask-monomial ValueError, and the okf-gated bracket flip in the line
search (ADVICE r4 + VERDICT r4 items 7/9)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difficp_tpu.ops import pallas_reductions as pr
from difficp_tpu.ops import pair_poly as pp


def test_vmem_budget_derived_from_device():
    # on the CPU test mesh the default capacity is 16 MB, and the derived
    # budget must reproduce the hand-calibrated v5e value of rounds 2-4
    assert pr._sym_budget_floats() == (15 * 1024 * 1024) // 8
    assert pr._sym_max_mpad() == 81920


def test_vmem_budget_env_override(monkeypatch):
    monkeypatch.setenv("DIFFICP_VMEM_BYTES", str(32 * 1024 * 1024))
    pr._device_vmem_bytes.cache_clear()
    pr._sym_budget_floats.cache_clear()
    pr._sym_max_mpad.cache_clear()
    try:
        assert pr._device_vmem_bytes() == 32 * 1024 * 1024
        assert pr._sym_budget_floats() == (31 * 1024 * 1024) // 8
    finally:
        monkeypatch.delenv("DIFFICP_VMEM_BYTES")
        pr._device_vmem_bytes.cache_clear()
        pr._sym_budget_floats.cache_clear()
        pr._sym_max_mpad.cache_clear()


def test_sym_table_mask_monomial_raises_valueerror():
    # must be a ValueError (survives python -O), not a bare assert
    x = jnp.zeros((16, 2), jnp.float32)
    col_vals = {
        "q0": x[:, 0], "q1": x[:, 1], "m": jnp.ones((16,), jnp.float32),
        "w": jnp.ones((16,), jnp.float32),
    }
    with pytest.raises(ValueError, match="mask"):
        pp._sym_table([("w",)], x, col_vals, 0.5, t=8)


def test_linesearch_aberrant_bracket_trial_recovers():
    """A finite-but-aberrant (> errthresh) trial with positive directional
    derivative during BRACKETING must not open a degenerate zoom bracket:
    the search still finds a strong-Wolfe point on a 1-D objective built to
    hit that path (f finite but > errthresh beyond x=2, rising slope)."""
    from difficp_tpu.utils.lbfgs import lbfgs_optimize

    def f(x):
        v = x[0]
        # parabola with minimum at 1; beyond 2 the value jumps finite-huge
        base = (v - 1.0) ** 2
        spike = jnp.where(v > 2.0, 1e12, 0.0)
        return base + spike

    x0 = jnp.array([0.0], jnp.float32)
    res = lbfgs_optimize(f, x0, nmax=2, inner=8, max_linesearch_steps=12,
                         errthresh=1e6)
    xs = float(res.params[0])
    # converged toward the parabola minimum, never stuck at the spike
    assert np.isfinite(float(res.loss))
    assert 0.0 < xs <= 2.0
    assert float(res.loss) < float(f(x0))
