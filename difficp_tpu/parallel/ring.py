"""Ring-rotated pairwise reductions for point sets sharded across chips.

The SP/CP analog of SURVEY §5 ("long-context"): when a single point set
exceeds one chip (100k+ points), shard the points over the mesh and rotate
the j-side tiles around the ring — each device computes its i-shard's
partial reduction against every rotating tile, so the full O(M^2) pair space
is covered with O(M/nd) memory per device and only neighbour communication
(``lax.ppermute`` over ICI; the explicit-RDMA pallas variant of the same
schedule is a drop-in upgrade).

``ring_rhs_self`` matches ``ops.reductions.lddmm_rhs_self`` semantics for
the eta == 0 (classic/hybrid) field; masks handle padding as everywhere.
Usable inside ``shard_map`` (see ``ring_shoot`` and the equivalence test).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _tile_terms(qi, pi, mi, qj, pj, mj, sigma, withlogdet):
    """Dense cross-tile terms: rows = local i-shard, cols = rotating tile."""
    sig2 = sigma * sigma
    diff = qi[:, None, :] - qj[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    k = jnp.exp(-d2 / (2.0 * sig2)) * mj[None, :]
    vq = jnp.matmul(k, pj, precision="highest")
    dots = jnp.matmul(pi, pj.T, precision="highest")
    gq = jnp.einsum("mt,mtd->md", k * dots, -diff, precision="highest") / sig2
    if withlogdet:
        dc = (
            jnp.einsum("mt,mtd,md->", k * mi[:, None], -diff, pi,
                       precision="highest")
            / sig2
        )
    else:
        dc = jnp.zeros((), qi.dtype)
    return vq, gq, dc


def ring_rhs_self(q, p, mask, sigma, withlogdet, axis_name: str):
    """Fused self RHS over a point-sharded set (inside shard_map).

    q/p/mask are the LOCAL shard; returns local (vq, -Gq) rows and the
    GLOBAL dcost (psum-reduced).
    """
    nd = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % nd) for i in range(nd)]

    def body(i, carry):
        vq, gq, dc, qr, pr, mr = carry
        dvq, dgq, ddc = _tile_terms(q, p, mask, qr, pr, mr, sigma, withlogdet)
        vq = vq + dvq
        gq = gq + dgq
        dc = dc + ddc
        qr = jax.lax.ppermute(qr, axis_name, perm)
        pr = jax.lax.ppermute(pr, axis_name, perm)
        mr = jax.lax.ppermute(mr, axis_name, perm)
        return (vq, gq, dc, qr, pr, mr)

    carry0 = (
        jnp.zeros_like(q), jnp.zeros_like(q), jnp.zeros((), q.dtype),
        q, p, mask,
    )
    vq, gq, dc, *_ = jax.lax.fori_loop(0, nd, body, carry0)
    dc = jax.lax.psum(dc, axis_name)
    vq = vq * mask[:, None]
    gq = gq * mask[:, None]
    return vq, -gq, dc


def make_ring_shoot(sigma: float, lambd: float, withlogdet: bool, nt: int,
                    mesh: Mesh, axis: str = "points",
                    scheme: str = "Euler"):
    """Point-sharded geodesic shoot: Euler/Ralston steps whose RHS is the
    ring reduction.  Returns a jitted fn (q0_sharded, p0_sharded, mask) ->
    (q1, p1, divcost)."""

    def local_shoot(q, p, mask):
        dt = 1.0 / nt

        def rhs(q, p):
            return ring_rhs_self(q, p, mask, sigma, withlogdet, axis)

        def step(carry, _):
            q, p, cost = carry
            vq, mgq, dc = rhs(q, p)
            if scheme == "Euler":
                return (q + dt * vq, p + dt * mgq, cost + dt * dc), None
            qi, pi = q + (2 * dt / 3) * vq, p + (2 * dt / 3) * mgq
            vqi, mgqi, dci = rhs(qi, pi)
            return (
                q + 0.25 * dt * (vq + 3 * vqi),
                p + 0.25 * dt * (mgq + 3 * mgqi),
                cost + 0.25 * dt * (dc + 3 * dci),
            ), None

        (q1, p1, cost), _ = jax.lax.scan(
            step, (q, p, jnp.zeros((), q.dtype)), None, length=nt
        )
        return q1, p1, cost

    return jax.jit(
        jax.shard_map(
            local_shoot,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P()),
            check_vma=False,
        )
    )
