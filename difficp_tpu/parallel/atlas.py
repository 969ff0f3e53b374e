"""Distributed atlas building: frames sharded over a device mesh.

The reference is strictly single-process / single-device; its latent parallel
axes (SURVEY §2.5) are realized here the TPU way:

- **Frame axis (data parallel)**: the K independent per-frame registrations
  (reference PSR.py:528 sequential loop) are vmapped and sharded over a
  1-D ``Mesh(('frames',))``; each device optimizes its local frames' momenta
  in lockstep, no communication needed.
- **GMM EM across all frames**: every M-step quantity is a sum over points of
  responsibility-weighted statistics (SURVEY §3.3), so the distributed EM is:
  compute per-point E-step terms locally, ``psum`` the
  ``difficp_tpu.models.gmm.MStats`` pytree over the mesh, apply the update
  identically on every device.  ``em_step_frames_sharded`` implements this
  with ``shard_map`` (explicit collectives); the jit auto-partitioner path
  (just sharding the inputs of the normal code) is equivalent.
- Multi-host: the same code under ``jax.distributed.initialize`` — the mesh
  spans hosts, psums ride ICI within a slice and DCN across slices.

``atlas_train_step`` is the fused one-iteration training step (EM + one
registration L-BFGS pass) used by the multichip dry-run and benchmarks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from difficp_tpu.models import gmm as gmm_mod
from difficp_tpu.models import lddmm as lddmm_mod


def make_mesh(n_devices: Optional[int] = None, axis: str = "frames") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_psr(psr, mesh: Mesh, axis: str = "frames"):
    """Place a DiffPSR/AffinePSR's per-frame arrays on the mesh, sharded over
    frames; GMM parameters replicated.  The PSR's jitted work functions then
    run multi-device via the XLA partitioner with no code change."""
    fsh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    for name in ("x0", "x1", "y", "xmask", "q0", "qmask", "a0"):
        if hasattr(psr, name):
            setattr(psr, name, jax.device_put(getattr(psr, name), fsh))
    psr.gmm = [jax.device_put(g, rep) for g in psr.gmm]
    return psr


@partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "axis", "skip_m"),
)
def em_step_frames_sharded(state, x, mask, cfg, mesh, axis="frames",
                           skip_m=False):
    """One EM step on frame-sharded data (K, N, D) with explicit collectives.

    Exact same math as ``gmm.em_step`` on the flattened points: local E-step
    + psum'd MStats (the Schur-style reduction of BASELINE.json).
    :return: (new GMMState [replicated], Y (K,N,D), Cfe, FE)
    """

    def local(st, xl, ml):
        k_loc, n, d = xl.shape
        out = gmm_mod.em_step(
            st, xl.reshape(k_loc * n, d), ml.reshape(k_loc * n), cfg,
            skip_m=skip_m, axis_name=axis,
        )
        return out.state, out.y.reshape(k_loc, n, d), out.cfe, out.fe

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P(axis), P(), P()),
        check_vma=False,
    )(state, x, mask)


class AtlasStepOut(NamedTuple):
    gmm: gmm_mod.GMMState
    a0: jax.Array
    x1: jax.Array
    y: jax.Array
    cfe: jax.Array
    fe: jax.Array
    regloss: jax.Array
    quadloss: jax.Array
    alpha: any = None   # (K,) accepted line-search step sizes — thread back
    #   as the next step's ``alpha0`` (zeros = cold 1/||g0|| seeding)
    memory: any = None  # per-frame batched LBFGSMemory (``carry_memory``):
    #   thread back as ``mem0`` so split steps keep quasi-Newton state


def make_atlas_train_step(gcfg: gmm_mod.GMMConfig, lcfg: lddmm_mod.LDDMMConfig,
                          mesh: Mesh, axis: str = "frames",
                          em_iters: int = 5, reg_nmax: int = 1,
                          tol: float = 1e-3, use_ext: bool = True,
                          reg_inner: int = 20, reg_ls: int = 25,
                          carry_memory: bool = False, memory_size: int = 10):
    """Build the jitted one-iteration atlas training step over the mesh.

    One call = [em_iters EM steps on all frames' warped points] then [one
    vmapped L-BFGS registration pass per frame] — the body of the reference's
    outer loop (ICP_atlas.py:269-298), fully on-device.

    The step threads per-frame warm-start step sizes: pass ``alpha0``
    (zeros = cold) and feed ``out.alpha`` back in.  With ``carry_memory``
    it also takes/returns the per-frame batched curvature memory
    (``zero_atlas_memory`` for step 0) — the same split-call quasi-Newton
    persistence as the single-chip ``DiffPSR.run(carry_memory=True)``.
    """

    def reg_local(gstate, q0l, a0l, x0l, yl, qml, xml, ptwl, all_, meml):
        sig2 = gstate.sigma ** 2

        def one(q0k, a0k, x0k, yk, qmk, xmk, wk, alk, memk):
            def dataloss(pts):
                # gammaT inlier weight, matching the single-device quadloss
                # (models/psr.py _quadloss; GMM.py:323)
                return jnp.sum(
                    (xmk * wk)[:, None] * (pts - yk) ** 2 / (2.0 * sig2)
                )

            res = lddmm_mod.optimize(
                lcfg, dataloss, q0k, a0k,
                x0k if use_ext else None, qmk,
                xmk if use_ext else None, nmax=reg_nmax, tol=tol,
                inner=reg_inner, max_linesearch_steps=reg_ls,
                alpha0=alk, memory0=memk if carry_memory else None,
            )
            x1k = res.final.x if use_ext else res.final.q
            return (res.p0, x1k, res.trajl, res.datal, res.alpha,
                    res.memory if carry_memory else jnp.zeros((),
                                                              jnp.float32))

        return jax.vmap(one)(q0l, a0l, x0l, yl, qml, xml, ptwl, all_, meml)

    def em_local(gstate, x1l, xml):
        k_loc, n, d = x1l.shape

        def body(st, _):
            out = gmm_mod.em_step(
                st, x1l.reshape(k_loc * n, d), xml.reshape(k_loc * n), gcfg,
                axis_name=axis,
            )
            return out.state, None

        gstate, _ = jax.lax.scan(body, gstate, None, length=em_iters)
        out = gmm_mod.em_step(
            gstate, x1l.reshape(k_loc * n, d), xml.reshape(k_loc * n), gcfg,
            skip_m=True, axis_name=axis,
        )
        return (
            out.state, out.y.reshape(k_loc, n, d), out.cfe,
            out.gamt.reshape(k_loc, n),
        )

    def step(gstate, q0, a0, x0, x1, qmask, xmask, alpha0, mem0):
        def local(gstate, q0l, a0l, x0l, x1l, qml, xml, all_, meml):
            gstate, yl, cfe, ptwl = em_local(gstate, x1l, xml)
            a0l, x1l, trajl, datal, all_, meml = reg_local(
                gstate, q0l, a0l, x0l, yl, qml, xml, ptwl, all_, meml
            )
            quad = jax.lax.psum(jnp.sum(datal), axis)
            regl = jax.lax.psum(jnp.sum(trajl), axis)
            fe = cfe + quad + regl
            return gstate, a0l, x1l, yl, cfe, fe, trajl, datal, all_, meml

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                      P(axis), P(axis), P(axis)),
            out_specs=(P(), P(axis), P(axis), P(axis), P(), P(), P(axis),
                       P(axis), P(axis), P(axis)),
            check_vma=False,
        )(gstate, q0, a0, x0, x1, qmask, xmask, alpha0, mem0)

    def _train(gstate, q0, a0, x0, x1, qmask, xmask, alpha0,
               mem0) -> AtlasStepOut:
        (gstate, a0, x1, y, cfe, fe, regloss, quadloss, alpha,
         mem) = step(gstate, q0, a0, x0, x1, qmask, xmask, alpha0, mem0)
        return AtlasStepOut(
            gmm=gstate, a0=a0, x1=x1, y=y, cfe=cfe, fe=fe,
            regloss=regloss, quadloss=quadloss, alpha=alpha,
            memory=mem if carry_memory else None,
        )

    if carry_memory:
        return jax.jit(_train)

    @jax.jit
    def train_step(gstate, q0, a0, x0, x1, qmask, xmask,
                   alpha0=None) -> AtlasStepOut:
        if alpha0 is None:
            alpha0 = jnp.zeros((a0.shape[0],), jnp.float32)
        # dummy per-frame scalar keeps the vmap/shard_map operand uniform
        mem0 = jnp.zeros((a0.shape[0],), jnp.float32)
        return _train(gstate, q0, a0, x0, x1, qmask, xmask, alpha0, mem0)

    return train_step


def zero_atlas_memory(a0, memory_size: int = 10):
    """Per-frame batched empty curvature memory for the frame-sharded atlas
    step (the ``mem0`` of step 0 with ``carry_memory=True``)."""
    from difficp_tpu.utils.lbfgs import zero_memory

    k, n = a0.shape[0], a0[0].size
    return jax.vmap(lambda _: zero_memory(n, memory_size, a0.dtype))(
        jnp.arange(k))


