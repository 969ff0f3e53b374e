"""End-to-end POINT-sharded two-set registration over a device mesh.

This is the piece the reference cannot express at all: one point set so
large it spans chips, registered onto a GMM with the full diffICP
alternation (reference ICP_two_set.py:269-298 outer loop, PSR.py Reg_opt /
GMM_opt), entirely SPMD:

- **E/M steps**: points sharded over the mesh; ``gmm.em_step`` computes
  local sufficient statistics and psums the ``MStats`` pytree
  (``axis_name``), so every device applies the identical M-step update.
- **Registration**: the L-BFGS loss is a ``shard_map`` whose RHS is the
  ring-rotated kernel reduction (``parallel.ring``); each device holds only
  its momenta shard, gradients flow through the ring (ppermute transposes),
  and the optimizer algebra (two-loop recursion, zoom line search dots)
  runs on the sharded global arrays under ``jit`` — XLA inserts the
  collectives (the scaling-book recipe: manual shard_map for the hot
  kernel, automatic propagation for the glue).

Per-device memory is O(M/nd x tile): a 1M-point registration compiles and
runs on an 8-device mesh holding 128k points each (see
tests/test_parallel_twoset.py and ``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from difficp_tpu.models import gmm as gmm_mod
from difficp_tpu.models import lddmm as lddmm_mod
from difficp_tpu.parallel import ring
from difficp_tpu.utils.lbfgs import lbfgs_optimize


def make_sharded_reg_loss(lcfg: lddmm_mod.LDDMMConfig, mesh: Mesh,
                          axis: str = "points", ring_tile: int = 1024,
                          with_aux: bool = False):
    """Build the sharded registration loss
    ``loss(a0, q0, y, w, mask, sig2) -> scalar`` (all point arrays sharded
    over ``axis``; dense support, warped points are q1):

        lambd * H(q0, a0) + divcost + sum_i m_i w_i |q1_i - y_i|^2 / (2 sig2)

    — exactly ``lddmm.trajloss`` + the gammaT-weighted quadratic dataloss of
    ``models/psr.py`` (GMM.py:323), evaluated without any device ever
    holding more than its point shard.

    ``with_aux``: return ``(loss, (q1, trajl, quad))`` — the arrival points
    and loss terms of THIS evaluation, so the optimizer's best-eval aux
    replaces the per-step final re-shoot (a full ring shoot at scale).
    """
    local_shoot = ring.make_local_shoot(
        lcfg.sigma, lcfg.eta, lcfg.withlogdet, lcfg.nt, axis, lcfg.scheme,
        ring_tile,
    )

    def local_loss(a0l, q0l, yl, wl, ml, sig2):
        q1, _, cost = local_shoot(q0l, a0l, ml)
        h = ring.ring_hamiltonian(q0l, a0l, ml, lcfg.sigma, lcfg.eta, axis,
                                  ring_tile)
        quad = jax.lax.psum(
            jnp.sum((ml * wl)[:, None] * (q1 - yl) ** 2), axis
        ) / (2.0 * sig2)
        trajl = lcfg.lambd * h + cost
        if with_aux:
            return trajl + quad, q1, trajl, quad
        return trajl + quad

    if with_aux:
        sm = jax.shard_map(
            local_loss,
            mesh=mesh,
            in_specs=(P(axis),) * 5 + (P(),),
            out_specs=(P(), P(axis), P(), P()),
            check_vma=False,
        )

        def loss_aux(*args):
            loss, q1, trajl, quad = sm(*args)
            return loss, (q1, trajl, quad)

        return loss_aux
    return jax.shard_map(
        local_loss,
        mesh=mesh,
        in_specs=(P(axis),) * 5 + (P(),),
        out_specs=P(),
        check_vma=False,
    )


class TwosetStepOut(NamedTuple):
    gmm: gmm_mod.GMMState
    a0: jax.Array      # (M, D) momenta, point-sharded
    x1: jax.Array      # (M, D) warped points, point-sharded
    y: jax.Array       # (M, D) EM quadratic targets, point-sharded
    cfe: jax.Array     # ()  free-energy offset
    fe: jax.Array      # ()  free energy (the monotone oracle quantity)
    trajl: jax.Array   # ()  lambd*H + divcost
    quad: jax.Array    # ()  weighted quadratic dataloss
    alpha: jax.Array = jnp.asarray(0.0)  # accepted line-search step size
    #   (pass back as the step's ``alpha0`` to warm-start the next zoom)
    memory: any = None  # L-BFGS curvature memory (with ``carry_memory``):
    #   pass back as the next step's ``mem0`` — the EM targets drift slowly,
    #   so split sharded steps keep quasi-Newton convergence exactly like
    #   DiffPSR.run(carry_memory=True) on the single-chip path


def make_twoset_step(gcfg: gmm_mod.GMMConfig, lcfg: lddmm_mod.LDDMMConfig,
                     mesh: Mesh, axis: str = "points",
                     em_iters: int = 5, reg_nmax: int = 1,
                     reg_inner: int = 20, reg_ls: int = 25,
                     tol: float = 1e-3, ring_tile: int = 1024,
                     em_tile: Optional[int] = None,
                     carry_memory: bool = False,
                     memory_size: int = 10):
    """Build the jitted fused one-iteration two-set step over the mesh:
    [em_iters EM steps on the warped points] then [one L-BFGS registration
    pass on the sharded momenta] — the body of the reference outer loop
    (ICP_two_set.py / PSR.py GMM_opt+Reg_opt), dense support, K=1.

    The optimizer's best-eval aux carries the arrival points and loss terms
    out of the line search, so the step never re-shoots at the returned
    momenta (the final shoot was a full ring pass at scale).

    ``carry_memory``: the step takes ``mem0`` (use ``zero_twoset_memory``
    for step 0) and returns the final curvature memory — thread it across
    steps.  ``memory_size`` is kept small by default: each (s, y) pair is a
    full momenta-sized sharded array (m x M x D floats per device shard).
    """
    reg_loss = make_sharded_reg_loss(lcfg, mesh, axis, ring_tile,
                                     with_aux=True)

    def em_local(st, xl, ml):
        def body(s, _):
            o = gmm_mod.em_step(s, xl, ml, gcfg, axis_name=axis,
                                tile=em_tile)
            return o.state, None

        st, _ = jax.lax.scan(body, st, None, length=em_iters)
        out = gmm_mod.em_step(st, xl, ml, gcfg, skip_m=True, axis_name=axis,
                              tile=em_tile)
        return out.state, out.y, out.cfe, out.gamt

    em_sm = jax.shard_map(
        em_local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P(axis), P(), P(axis)),
        check_vma=False,
    )

    def _step(gstate, q0, a0, x1, mask, alpha0, mem0) -> TwosetStepOut:
        gstate, y, cfe, ptw = em_sm(gstate, x1, mask)
        sig2 = gstate.sigma ** 2

        def lossfn(p):
            return reg_loss(p, q0, y, ptw, mask, sig2)

        def _seed():
            # cold call: classical 1/||g0|| zoom seed.  lax.cond here is a
            # true runtime branch (K=1, no vmap), so warm calls skip the
            # extra loss+grad eval while keeping ONE compiled program —
            # thread ``out.alpha`` back in as ``alpha0`` on later calls.
            g0 = jax.grad(lambda p: lossfn(p)[0])(a0)
            gn = jnp.sqrt(jnp.sum(g0**2))
            return jnp.minimum(1.0, 1.0 / jnp.maximum(gn, 1e-12)).astype(
                jnp.float32)

        alpha0 = jnp.asarray(alpha0, jnp.float32)
        al = jax.lax.cond(alpha0 > 0.0, lambda: alpha0, _seed)
        res = lbfgs_optimize(
            lossfn, a0, nmax=reg_nmax, inner=reg_inner, tol=tol,
            max_linesearch_steps=reg_ls, alpha0=al, has_aux=True,
            memory0=mem0, memory_size=memory_size,
        )
        a0n = res.params
        x1n, trajl, quad = res.aux
        fe = cfe + trajl + quad
        return TwosetStepOut(
            gmm=gstate, a0=a0n, x1=x1n, y=y, cfe=cfe, fe=fe, trajl=trajl,
            quad=quad, alpha=res.alpha,
            memory=res.memory if carry_memory else None,
        )

    if carry_memory:
        return jax.jit(_step)

    @jax.jit
    def step(gstate, q0, a0, x1, mask,
             alpha0=jnp.zeros((), jnp.float32)) -> TwosetStepOut:
        return _step(gstate, q0, a0, x1, mask, alpha0, None)

    return step


def zero_twoset_memory(a0, memory_size: int = 10):
    """Empty curvature memory for the sharded two-set step (the ``mem0`` of
    step 0 with ``carry_memory=True``)."""
    from difficp_tpu.utils.lbfgs import zero_memory

    return zero_memory(a0.size, memory_size, a0.dtype)


def shard_twoset(mesh: Mesh, axis: str, *arrays):
    """Place point arrays on the mesh, sharded over their leading axis."""
    sh = NamedSharding(mesh, P(axis))
    return tuple(jax.device_put(a, sh) for a in arrays)
