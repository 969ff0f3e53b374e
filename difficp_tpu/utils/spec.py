"""Dtype / device policy (the JAX analog of the reference's ``tools/spec.py``).

The reference keeps ``{dtype, device}`` dicts (``defspec``/``cpuspec``/``gpuspec``,
reference diffICP/tools/spec.py:24-32) and a coherence check ``getspec``
(spec.py:39-43).  In JAX, device placement is handled by shardings/jit, so the
spec reduces to a dtype policy: float32 compute everywhere (matching the
reference's float32 policy, spec.py:14), with float32 accumulation inside
kernels.  Helper utilities for canonicalizing inputs live here too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Compute dtype for all point-set math (reference is float32 end-to-end).
default_dtype = jnp.float32


def as_array(x, dtype=None) -> jax.Array:
    """Convert array-like (numpy / torch / list / jax) to a jax array.

    Torch tensors are supported without importing torch (duck-typed via
    ``.detach().cpu().numpy()``) so test fixtures generated with the torch
    reference can be fed in directly.
    """
    if dtype is None:
        dtype = default_dtype
    if hasattr(x, "detach") and hasattr(x, "cpu"):  # torch tensor
        x = x.detach().cpu().numpy()
    return jnp.asarray(np.asarray(x), dtype=dtype)


def on_cpu(x):
    """Host copy of an array (numpy), e.g. for matplotlib / pickling."""
    return np.asarray(x)
