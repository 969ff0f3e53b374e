"""Ring-rotated pairwise reductions for point sets sharded across chips.

The SP/CP analog of SURVEY §5 ("long-context"): when a single point set
exceeds one chip (100k+ points), shard the points over the mesh and rotate
the j-side shards around the ring — each device computes its i-shard's
partial reduction against every rotating shard, so the full O(M^2) pair
space is covered with O(M/nd) memory per device and only neighbour
communication (``lax.ppermute`` over ICI).

Inside each rotation the cross terms are *streamed* through the blockwise
tiled kernels (``ops.blockwise.lddmm_rhs_cross`` / ``_rhs_ext_blockwise``),
so per-device memory stays O(shard x tile) — a 1M-point set on 8 devices
never materializes more than a (131k, tile) slab.  All reductions are
reverse-differentiable (the rotation loop is a ``lax.scan``; ppermute
transposes to the reverse permutation), which is what lets a full L-BFGS
registration run on sharded momenta (``parallel.twoset``).

``ring_rhs_self`` / ``ring_rhs_ext`` match the semantics of
``ops.reductions.lddmm_rhs_self`` / ``lddmm_rhs_ext`` (reference
LDDMM.py:176-227) for any eta; masks handle padding as everywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from difficp_tpu.ops import blockwise as bw


def _use_pallas_ring() -> bool:
    """Rotation-body backend choice: the payload-matmul cross kernels on
    TPU (or when the backend is forced to pallas), blockwise scans
    elsewhere — same policy as ops.backend."""
    from difficp_tpu.ops import backend as _backend

    if _backend._FORCE["mode"] == "pallas":
        return True
    if _backend._FORCE["mode"] is not None:
        return False
    return jax.default_backend() == "tpu"


_op_cache = {}


def _cross_op(kind, sigma, eta, withlogdet):
    from difficp_tpu.ops import pallas_reductions as pr

    key = (kind, float(sigma), float(eta), bool(withlogdet))
    if key not in _op_cache:
        maker = {"rhs": pr.make_rhs_cross, "xrhs": pr.make_rhs_xcross,
                 "ham": pr.make_hamiltonian_cross}[kind]
        _op_cache[key] = (maker(sigma, eta, withlogdet) if kind != "ham"
                          else maker(sigma, eta))
    return _op_cache[key]


def _ring_scan(body, carry0, rotating, axis_name):
    """Scan ``body`` nd times, rotating ``rotating`` (a tuple of per-shard
    arrays) one neighbour step around the ring after each application."""
    nd = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % nd) for i in range(nd)]

    def step(state, _):
        carry, rot = state
        carry = body(carry, rot)
        rot = tuple(jax.lax.ppermute(r, axis_name, perm) for r in rot)
        return (carry, rot), None

    (carry, _), _ = jax.lax.scan(
        jax.checkpoint(step, prevent_cse=False), (carry0, rotating), None,
        length=nd,
    )
    return carry


def ring_rhs_self(q, p, mask, sigma, withlogdet, axis_name: str,
                  eta: float = 0.0, tile: int = 1024):
    """Fused self RHS over a point-sharded set (inside shard_map).

    q/p/mask are the LOCAL shard; returns local (vq, -Gq) rows and the
    GLOBAL dcost (psum-reduced).
    """

    if _use_pallas_ring():
        op = _cross_op("rhs", sigma, eta, withlogdet)

        def body(carry, rot):
            vq, mgq, dc = carry
            qr, pr, mr = rot
            dvq, dmgq, ddc = op(q, p, mask, qr, pr, mr)
            return (vq + dvq, mgq + dmgq, dc + ddc)

        carry0 = (jnp.zeros_like(q), jnp.zeros_like(q),
                  jnp.zeros((), q.dtype))
        vq, mgq, dc = _ring_scan(body, carry0, (q, p, mask), axis_name)
        return vq, mgq, jax.lax.psum(dc, axis_name)

    def body(carry, rot):
        vq, gq, dc = carry
        qr, pr, mr = rot
        dvq, dgq, ddc = bw._rhs_cross_blockwise(
            q, p, mask, qr, pr, mr, sigma, eta, withlogdet, tile
        )
        return (vq + dvq, gq + dgq, dc + ddc)

    carry0 = (jnp.zeros_like(q), jnp.zeros_like(q), jnp.zeros((), q.dtype))
    vq, gq, dc = _ring_scan(body, carry0, (q, p, mask), axis_name)
    dc = jax.lax.psum(dc, axis_name)
    vq = vq * mask[:, None]
    gq = gq * mask[:, None]
    return vq, -gq, dc


def ring_rhs_ext(q, p, x, mask_q, mask_x, sigma, withlogdet, axis_name: str,
                 eta: float = 0.0, tile: int = 1024):
    """Fused self+external RHS, BOTH sets point-sharded (inside shard_map).

    The (q, p) support shards rotate; each device folds them into its local
    q rows (self terms) and its local x rows (advection + logdet cost),
    matching ``ops.reductions.lddmm_rhs_ext``: returns local (vq, -Gq, vx)
    rows and the GLOBAL dcost.
    """

    if _use_pallas_ring():
        op = _cross_op("rhs", sigma, eta, False)
        xop = _cross_op("xrhs", sigma, eta, withlogdet)

        def body(carry, rot):
            vq, mgq, vx, dc = carry
            qr, pr, mr = rot
            dvq, dmgq, _ = op(q, p, mask_q, qr, pr, mr)
            dvx, ddc = xop(x, mask_x, qr, pr, mr)
            return (vq + dvq, mgq + dmgq, vx + dvx, dc + ddc)

        carry0 = (
            jnp.zeros_like(q), jnp.zeros_like(q), jnp.zeros_like(x),
            jnp.zeros((), q.dtype),
        )
        vq, mgq, vx, dc = _ring_scan(body, carry0, (q, p, mask_q),
                                     axis_name)
        return vq, mgq, jax.lax.psum(dc, axis_name), vx

    def body(carry, rot):
        vq, gq, vx, dc = carry
        qr, pr, mr = rot
        dvq, dgq, _ = bw._rhs_cross_blockwise(
            q, p, mask_q, qr, pr, mr, sigma, eta, False, tile
        )
        dvx, ddc = bw._rhs_ext_blockwise(
            x, qr, pr, mr, mask_x, sigma, eta, withlogdet, tile
        )
        return (vq + dvq, gq + dgq, vx + dvx, dc + ddc)

    carry0 = (
        jnp.zeros_like(q), jnp.zeros_like(q), jnp.zeros_like(x),
        jnp.zeros((), q.dtype),
    )
    vq, gq, vx, dc = _ring_scan(body, carry0, (q, p, mask_q), axis_name)
    dc = jax.lax.psum(dc, axis_name)
    vq = vq * mask_q[:, None]
    gq = gq * mask_q[:, None]
    vx = vx * mask_x[:, None]
    return vq, -gq, dc, vx


def ring_hamiltonian(q, p, mask, sigma, eta, axis_name: str,
                     tile: int = 1024):
    """Global H(q, p) of a point-sharded set (inside shard_map), incl. the
    gradcomponent eta terms (LDDMM.py:142-159)."""

    if _use_pallas_ring():
        op = _cross_op("ham", sigma, eta, False)

        def body(h, rot):
            qr, pr, mr = rot
            return h + op(q, p, mask, qr, pr, mr)
    else:
        def body(h, rot):
            qr, pr, mr = rot
            return h + bw.hamiltonian_cross(
                q, p, qr, pr, sigma, eta, mask, mr, tile
            )

    h = _ring_scan(body, jnp.zeros((), q.dtype), (q, p, mask), axis_name)
    return jax.lax.psum(h, axis_name)


def make_local_shoot(sigma: float, eta: float, withlogdet: bool, nt: int,
                     axis: str, scheme: str = "Euler", tile: int = 1024):
    """Geodesic shoot on local shards (for use INSIDE shard_map): Euler /
    Ralston steps whose RHS is the ring reduction.  ``(q, p, mask[, x,
    xmask]) -> (q1, p1, cost[, x1])``; fully reverse-differentiable."""

    def local_shoot(q, p, mask, x=None, xmask=None):
        dt = 1.0 / nt
        ext = x is not None

        def rhs(q, p, x):
            if ext:
                return ring_rhs_ext(q, p, x, mask, xmask, sigma, withlogdet,
                                    axis, eta, tile)
            vq, mgq, dc = ring_rhs_self(q, p, mask, sigma, withlogdet, axis,
                                        eta, tile)
            return vq, mgq, dc, None

        def step(carry, _):
            q, p, x, cost = carry
            vq, mgq, dc, vx = rhs(q, p, x)
            if scheme == "Euler":
                xn = x + dt * vx if ext else None
                return (q + dt * vq, p + dt * mgq, xn, cost + dt * dc), None
            qi, pi = q + (2 * dt / 3) * vq, p + (2 * dt / 3) * mgq
            xi = x + (2 * dt / 3) * vx if ext else None
            vqi, mgqi, dci, vxi = rhs(qi, pi, xi)
            xn = x + 0.25 * dt * (vx + 3 * vxi) if ext else None
            return (
                q + 0.25 * dt * (vq + 3 * vqi),
                p + 0.25 * dt * (mgq + 3 * mgqi),
                xn,
                cost + 0.25 * dt * (dc + 3 * dci),
            ), None

        (q1, p1, x1, cost), _ = jax.lax.scan(
            jax.checkpoint(step, prevent_cse=False),
            (q, p, x, jnp.zeros((), q.dtype)), None, length=nt,
        )
        if ext:
            return q1, p1, cost, x1
        return q1, p1, cost

    return local_shoot


def make_ring_shoot(sigma: float, lambd: float, withlogdet: bool, nt: int,
                    mesh: Mesh, axis: str = "points",
                    scheme: str = "Euler", eta: float = 0.0,
                    tile: int = 1024):
    """Point-sharded geodesic shoot: returns a jitted fn
    (q0_sharded, p0_sharded, mask) -> (q1, p1, divcost)."""
    local_shoot = make_local_shoot(sigma, eta, withlogdet, nt, axis, scheme,
                                   tile)
    return jax.jit(
        jax.shard_map(
            local_shoot,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P()),
            check_vma=False,
        )
    )
