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
    affine params, warped points, bookkeeping).

    Pickle-free: plain arrays in one .npz plus a JSON header (kind, Cfe, FE)
    — no arbitrary-code-on-load trust surface, unlike the reference's pickle
    checkpoints (spec.py:46-61)."""
    from difficp_tpu.models.psr import AffinePSR, DiffPSR

    arrays = {
        "x1": np.asarray(psr.x1),
        "y": np.asarray(psr.y),
        "ptw": np.asarray(psr.ptw),
        "regloss": np.asarray(psr.regloss),
        "quadloss": np.asarray(psr.quadloss),
    }
    for s, g in enumerate(psr.gmm):
        for name, v in zip(g._fields, g):
            arrays[f"gmm{s}_{name}"] = np.asarray(v)
    if isinstance(psr, DiffPSR):
        kind = "diff"
        arrays["a0"] = np.asarray(psr.a0)
        arrays["q0"] = np.asarray(psr.q0)
        arrays["qmask"] = np.asarray(psr.qmask)
    elif isinstance(psr, AffinePSR):
        kind = "affine"
        arrays["M"] = np.asarray(psr.M)
        arrays["t"] = np.asarray(psr.t)
    else:
        raise TypeError(f"unsupported PSR type: {type(psr)!r}")
    header = {
        "kind": kind,
        "n_gmm": len(psr.gmm),
        "gmm_fields": list(psr.gmm[0]._fields),
        "Cfe": [float(c) for c in psr.Cfe],
        "FE": psr.FE,
    }
    arrays["__header__"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_psr(path: str, psr):
    """Restore a checkpoint into a freshly-constructed PSR of the same
    configuration (data/configs are reproducible; only dynamic state is
    stored)."""
    from difficp_tpu.models import gmm as gmm_mod

    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path, allow_pickle=False)
    hdr = json.loads(bytes(data["__header__"].tobytes()).decode())
    psr.gmm = [
        gmm_mod.GMMState(
            *(jnp.asarray(data[f"gmm{s}_{name}"]) for name in hdr["gmm_fields"])
        )
        for s in range(hdr["n_gmm"])
    ]
    psr.x1 = jnp.asarray(data["x1"])
    psr.y = jnp.asarray(data["y"])
    psr.ptw = jnp.asarray(data["ptw"])
    psr.Cfe = [jnp.asarray(c, jnp.float32) for c in hdr["Cfe"]]
    psr.regloss = jnp.asarray(data["regloss"], jnp.float32)
    psr.quadloss = jnp.asarray(data["quadloss"], jnp.float32)
    psr.FE = hdr["FE"]
    if hdr["kind"] == "diff":
        psr.a0 = jnp.asarray(data["a0"])
        psr.q0 = jnp.asarray(data["q0"])
        psr.qmask = jnp.asarray(data["qmask"])
    else:
        psr.M = jnp.asarray(data["M"])
        psr.t = jnp.asarray(data["t"])
    return psr
