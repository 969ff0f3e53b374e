"""Blockwise (tiled) Gaussian pairwise reductions for large point sets.

Same signatures/semantics as ``difficp_tpu.ops.reductions`` but the (M, N)
kernel matrix is never materialized: a ``lax.scan`` streams j-tiles and
accumulates per-i outputs — the role KeOps' tiled CUDA reductions play in the
reference (kernel.py:99-104: dense "crash[es] on large datasets").
Fully differentiable (gradients stream the same tiles).

The Pallas backend (``pallas_reductions``) implements the same contract with
explicit VMEM control; this module is the portable fallback and the
correctness oracle for it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _pad_to(x, n, axis=0):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


def _tiles(n, tile):
    return -(-n // tile)


@partial(jax.checkpoint, static_argnums=(7, 8, 9))
def _rhs_cross_blockwise(qr, pr, mr, qc, pc, mc, sigma, eta, withlogdet, tile):
    """Fused RHS rows-against-cols, accumulated over col tiles.

    Rows (``qr``/``pr``) are the output index i; cols (``qc``/``pc``) are
    streamed j-tiles.  The self RHS is the special case rows == cols; the
    ring-sharded RHS (parallel/ring.py) calls this once per rotating shard.
    ``mr`` only weights the scalar logdet cost (row masking of vq/gq is the
    caller's job, matching the self path).
    """
    m, d = qr.shape
    n = qc.shape[0]
    nt = _tiles(n, tile)
    npad = nt * tile
    qj = _pad_to(qc, npad).reshape(nt, tile, d)
    pj = _pad_to(pc, npad).reshape(nt, tile, d)
    mj = _pad_to(mc, npad).reshape(nt, tile)

    sig2 = sigma**2

    def body(acc, tile_in):
        vq, gq, dcost = acc
        qjt, pjt, mjt = tile_in
        diff = qr[:, None, :] - qjt[None, :, :]       # (M, T, D)
        d2 = jnp.sum(diff * diff, axis=-1)
        k = jnp.exp(-d2 / (2.0 * sig2)) * mjt[None, :]
        vq = vq + jnp.matmul(k, pjt, precision="highest")
        dots = jnp.matmul(pr, pjt.T, precision="highest")                              # (M, T)
        gq = gq + jnp.einsum("mt,mtd->md", k * dots, -diff, precision="highest") / sig2
        if eta != 0.0:
            vq = vq - eta * (jnp.einsum("mt,mtd->md", k, -diff, precision="highest") / sig2)
            cb = pr[:, None, :] - pjt[None, :, :]
            proj = jnp.sum(diff * cb, axis=-1)
            hess = jnp.einsum(
                "mt,mtd->md", k, diff * proj[:, :, None] / sig2**2 - cb / sig2,
                precision="highest",
            )
            coef = k * (d2 / sigma**6 - (d + 2) / sigma**4)
            glap = jnp.einsum("mt,mtd->md", coef, -diff, precision="highest")
            gq = gq - eta * hess - eta**2 * glap
        if withlogdet:
            km = k * mr[:, None]
            dc = jnp.einsum("mt,mtd,md->", km, -diff, pr, precision="highest") / sig2
            if eta != 0.0:
                dc = dc + eta * jnp.sum(km * (d2 / sigma**4 - d / sigma**2))
            dcost = dcost + dc
        return (vq, gq, dcost), None

    acc0 = (
        jnp.zeros((m, d), qr.dtype),
        jnp.zeros((m, d), qr.dtype),
        jnp.zeros((), qr.dtype),
    )
    # checkpoint each tile step: the backward pass recomputes the (M, tile)
    # kernel tile instead of storing it (otherwise grads materialize
    # ntiles x (M, tile, D) residuals -> HBM OOM at scale)
    (vq, gq, dcost), _ = jax.lax.scan(
        jax.checkpoint(body, prevent_cse=False), acc0, (qj, pj, mj)
    )
    return vq, gq, dcost


def _rhs_self_blockwise(q, p, maskj, sigma, eta, withlogdet, tile):
    """Fused self-RHS accumulated over j-tiles.

    maskj: (M,) column mask (already includes padding); row outputs for all M.
    """
    return _rhs_cross_blockwise(
        q, p, maskj, q, p, maskj, sigma, eta, withlogdet, tile
    )


def lddmm_rhs_cross(qr, pr, qc, pc, sigma, eta, withlogdet, mask_r=None,
                    mask_c=None, tile=1024):
    """Cross-shard fused RHS: row outputs (vq, -Gq) for ``qr`` against the
    point set ``qc`` (streamed), plus the rows' share of the logdet cost.
    Summing this over a partition of the full set's cols reproduces
    ``lddmm_rhs_self`` exactly (the ring schedule of parallel/ring.py)."""
    mr = mask_r if mask_r is not None else jnp.ones((qr.shape[0],), qr.dtype)
    mc = mask_c if mask_c is not None else jnp.ones((qc.shape[0],), qc.dtype)
    vq, gq, dcost = _rhs_cross_blockwise(
        qr, pr, mr, qc, pc, mc, sigma, eta, withlogdet, tile
    )
    if mask_r is not None:
        vq = vq * mask_r[:, None]
        gq = gq * mask_r[:, None]
    return vq, -gq, dcost


def lddmm_rhs_self(q, p, sigma, eta, withlogdet, mask_q=None, tile=1024):
    """Blockwise version of reductions.lddmm_rhs_self."""
    m = q.shape[0]
    maskj = mask_q if mask_q is not None else jnp.ones((m,), q.dtype)
    vq, gq, dcost = _rhs_self_blockwise(
        q, p, maskj, sigma, eta, withlogdet, tile
    )
    if mask_q is not None:
        vq = vq * mask_q[:, None]
        gq = gq * mask_q[:, None]
    return vq, -gq, dcost


@partial(jax.checkpoint, static_argnums=(6, 7, 8))
def _rhs_ext_blockwise(x, q, p, maskq, maskx, sigma, eta, withlogdet,
                       tile=1024):
    """v at external x plus logdet cost at x, streamed over x-tiles for the
    cost and q already small enough; here we stream over q-tiles for vx."""
    nx, d = x.shape
    m = q.shape[0]
    nt = _tiles(m, tile)
    mpad = nt * tile
    qj = _pad_to(q, mpad).reshape(nt, tile, d)
    pj = _pad_to(p, mpad).reshape(nt, tile, d)
    mj = _pad_to(maskq, mpad).reshape(nt, tile)
    sig2 = sigma**2

    def body(acc, tile_in):
        vx, dcost = acc
        qjt, pjt, mjt = tile_in
        diff = x[:, None, :] - qjt[None, :, :]  # (Nx, T, D)
        d2 = jnp.sum(diff * diff, axis=-1)
        k = jnp.exp(-d2 / (2.0 * sig2)) * mjt[None, :]
        vx = vx + jnp.matmul(k, pjt, precision="highest")
        if eta != 0.0:
            vx = vx - eta * (jnp.einsum("nt,ntd->nd", k, -diff, precision="highest") / sig2)
        if withlogdet:
            km = k * maskx[:, None]
            dc = -jnp.einsum("nt,ntd,td->", km, -diff, pjt, precision="highest") / sig2
            if eta != 0.0:
                dc = dc + eta * jnp.sum(km * (d2 / sigma**4 - d / sigma**2))
            dcost = dcost + dc
        return (vx, dcost), None

    acc0 = (jnp.zeros((nx, d), x.dtype), jnp.zeros((), x.dtype))
    (vx, dcost), _ = jax.lax.scan(
        jax.checkpoint(body, prevent_cse=False), acc0, (qj, pj, mj)
    )
    return vx, dcost


def lddmm_rhs_ext(q, p, x, sigma, eta, withlogdet, mask_q=None, mask_x=None,
                  tile=1024):
    """Blockwise version of reductions.lddmm_rhs_ext."""
    vq, mgq, _ = lddmm_rhs_self(q, p, sigma, eta, False, mask_q, tile)
    maskq = mask_q if mask_q is not None else jnp.ones((q.shape[0],), q.dtype)
    maskx = mask_x if mask_x is not None else jnp.ones((x.shape[0],), x.dtype)
    vx, dcost = _rhs_ext_blockwise(
        x, q, p, maskq, maskx, sigma, eta, withlogdet, tile
    )
    if not withlogdet:
        dcost = jnp.zeros((), q.dtype)
    if mask_x is not None:
        vx = vx * mask_x[:, None]
    return vq, mgq, dcost, vx


def v_field(x, q, p, sigma, eta, mask_q=None, tile=1024):
    vx, _ = _rhs_ext_blockwise(
        x, q, p,
        mask_q if mask_q is not None else jnp.ones((q.shape[0],), q.dtype),
        jnp.ones((x.shape[0],), x.dtype),
        sigma, eta, False, tile,
    )
    return vx


def _stream_y(y, extra, mask_y, tile):
    """Pad and tile the j-side arrays for a scan."""
    n = y.shape[0]
    nt = _tiles(n, tile)
    npad = nt * tile
    yj = _pad_to(y, npad).reshape(nt, tile, y.shape[1])
    my = mask_y if mask_y is not None else jnp.ones((n,), y.dtype)
    mj = _pad_to(my, npad).reshape(nt, tile)
    ej = tuple(
        _pad_to(e, npad).reshape((nt, tile) + e.shape[1:]) for e in extra
    )
    return yj, mj, ej


def kred(x, y, b, sigma, mask_y=None, tile=1024):
    """Blockwise kernel-sum convolution sum_j K(x_i - y_j) b_j
    (the KeOps KRed role, reference kernel.py:138)."""
    yj, mj, (bj,) = _stream_y(y, (b,), mask_y, tile)
    sig2 = sigma**2

    def body(acc, tin):
        yjt, mjt, bjt = tin
        d2 = jnp.sum((x[:, None, :] - yjt[None, :, :]) ** 2, axis=-1)
        k = jnp.exp(-d2 / (2.0 * sig2)) * mjt[None, :]
        return acc + jnp.matmul(k, bjt, precision="highest"), None

    acc0 = jnp.zeros((x.shape[0], b.shape[1]), x.dtype)
    out, _ = jax.lax.scan(
        jax.checkpoint(body, prevent_cse=False), acc0, (yj, mj, bj)
    )
    return out


def kred_scal(x, y, d, sigma, mask_y=None, tile=1024):
    """Blockwise sum_j K(x_i - y_j) d_j, scalar payload (kernel.py:134)."""
    return kred(x, y, d[:, None], sigma, mask_y, tile)[:, 0]


def grad_kred(x, y, sigma, mask_y=None, tile=1024):
    """Blockwise sum_j (grad K)(x_i - y_j) (kernel.py:142)."""
    yj, mj, _ = _stream_y(y, (), mask_y, tile)
    sig2 = sigma**2

    def body(acc, tin):
        yjt, mjt = tin
        diff = x[:, None, :] - yjt[None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        k = jnp.exp(-d2 / (2.0 * sig2)) * mjt[None, :]
        return acc + jnp.einsum(
            "mt,mtd->md", k, -diff, precision="highest"
        ) / sig2, None

    acc0 = jnp.zeros_like(x)
    out, _ = jax.lax.scan(
        jax.checkpoint(body, prevent_cse=False), acc0, (yj, mj)
    )
    return out


def mdivsum(x, q, p, sigma, eta, mask_q=None, mask_x=None, tile=1024):
    """Blockwise -sum_i div(v)(x_i) (reference LDDMM.py:120-138), streaming
    x-tiles against the resident support (q, p) — matches
    ``reductions.mdivsum`` above the dense pair limit."""
    d = q.shape[1]
    xj, mj, _ = _stream_y(x, (), mask_x, tile)
    sig2 = sigma**2
    mq = mask_q if mask_q is not None else None

    def body(acc, tin):
        xjt, mjt = tin
        diff = q[:, None, :] - xjt[None, :, :]        # (M, T, D)
        d2 = jnp.sum(diff * diff, axis=-1)
        k = jnp.exp(-d2 / (2.0 * sig2)) * mjt[None, :]
        if mq is not None:
            k = k * mq[:, None]
        g = jnp.einsum("mt,mtd,md->", k, -diff, p, precision="highest") / sig2
        if eta != 0.0:
            g = g + eta * jnp.sum(k * (d2 / sig2**2 - d / sig2))
        return acc + g, None

    out, _ = jax.lax.scan(
        jax.checkpoint(body, prevent_cse=False), jnp.zeros((), q.dtype),
        (xj, mj),
    )
    return out


def hamiltonian_cross(qr, pr, qc, pc, sigma, eta, mask_r=None, mask_c=None,
                      tile=1024):
    """Rows-against-cols share of the blockwise Hamiltonian: summing over a
    partition of the cols reproduces ``hamiltonian`` (ring schedule)."""
    d = qr.shape[1]
    qj, mj, (pj,) = _stream_y(qc, (pc,), mask_c, tile)
    sig2 = sigma**2
    mrow = mask_r if mask_r is not None else None

    def body(acc, tin):
        qjt, mjt, pjt = tin
        diff = qr[:, None, :] - qjt[None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        k = jnp.exp(-d2 / (2.0 * sig2)) * mjt[None, :]
        if mrow is not None:
            k = k * mrow[:, None]
        h = 0.5 * jnp.einsum("mt,md,td->", k, pr, pjt, precision="highest")
        if eta != 0.0:
            bsum = jnp.einsum(
                "mt,mtd,md->", k, -diff, pr, precision="highest"
            ) / sig2
            csum = jnp.sum(k * (d2 / sig2**2 - d / sig2))
            h = h - eta * bsum - 0.5 * eta**2 * csum
        return acc + h, None

    h, _ = jax.lax.scan(
        jax.checkpoint(body, prevent_cse=False),
        jnp.zeros((), qr.dtype), (qj, mj, pj),
    )
    return h


def hamiltonian(q, p, sigma, eta, mask_q=None, tile=1024):
    """Blockwise H(q,p) incl. the gradcomponent eta terms (LDDMM.py:142-159)
    — the large-M path the dense hamiltonian cannot represent."""
    return hamiltonian_cross(q, p, q, p, sigma, eta, mask_q, mask_q, tile)


# ---------------------------------------------------------------------------
# Tiled nearest-neighbour reductions (the KeOps Kmin/Kmin(2) role:
# reference kernel.py:324-328, point_sets.py:23-25) — running min / top-2
# over streamed j-tiles, O(M + N) memory.
# ---------------------------------------------------------------------------


def min_sqdist(x, y, mask_y=None, tile=2048):
    """Blockwise min_j |x_i - y_j|^2 (masked y excluded); never materializes
    the (M, N) distance matrix."""
    nx, d = x.shape
    n = y.shape[0]
    nt = _tiles(n, tile)
    npad = nt * tile
    yj = _pad_to(y, npad).reshape(nt, tile, d)
    my = mask_y if mask_y is not None else jnp.ones((n,), x.dtype)
    mj = _pad_to(my, npad).reshape(nt, tile)  # zero-padded -> excluded

    def body(acc, tile_in):
        yjt, mjt = tile_in
        d2 = jnp.sum((x[:, None, :] - yjt[None, :, :]) ** 2, axis=-1)
        d2 = jnp.where(mjt[None, :] > 0, d2, jnp.inf)
        return jnp.minimum(acc, jnp.min(d2, axis=1)), None

    acc0 = jnp.full((nx,), jnp.inf, x.dtype)
    out, _ = jax.lax.scan(body, acc0, (yj, mj))
    return out


def _top2_scan(x, y, mask_y, tile, self_indices):
    """Running (min1, min2) of masked |x_i - y_j|^2 over j-tiles.

    ``self_indices``: optional (M,) row indices; when given, the pair
    (i, j == self_indices_i) is excluded (Kmin(2) self mode).
    """
    nx, d = x.shape
    n = y.shape[0]
    nt = _tiles(n, tile)
    npad = nt * tile
    yj = _pad_to(y, npad).reshape(nt, tile, d)
    mj = _pad_to(mask_y, npad).reshape(nt, tile)
    jidx = jnp.arange(npad, dtype=jnp.int32).reshape(nt, tile)

    def body(acc, tile_in):
        a1, a2 = acc
        yjt, mjt, jt = tile_in
        d2 = jnp.sum((x[:, None, :] - yjt[None, :, :]) ** 2, axis=-1)
        d2 = jnp.where(mjt[None, :] > 0, d2, jnp.inf)
        if self_indices is not None:
            d2 = jnp.where(
                jt[None, :] == self_indices[:, None], jnp.inf, d2
            )
        # tile top-2 by index-stable top_k on the negated distances
        t = -jax.lax.top_k(-d2, 2)[0]  # (M, 2) ascending
        merged = jnp.sort(
            jnp.stack([a1, a2, t[:, 0], t[:, 1]], axis=1), axis=1
        )
        return (merged[:, 0], merged[:, 1]), None

    acc0 = (
        jnp.full((nx,), jnp.inf, x.dtype),
        jnp.full((nx,), jnp.inf, x.dtype),
    )
    (m1, m2), _ = jax.lax.scan(body, acc0, (yj, mj, jidx))
    return m1, m2


def second_min_sqdist(x, mask=None, tile=2048):
    """Blockwise nearest-neighbour (excluding self) squared distance —
    the KeOps Kmin(2) of reference point_sets.py:23-25.  The reference keeps
    the trivial self-pair as the first minimum; here self is excluded
    outright, so the first of the streamed top-2 is the answer."""
    m = mask if mask is not None else jnp.ones((x.shape[0],), x.dtype)
    idx = jnp.arange(x.shape[0], dtype=jnp.int32)
    m1, _ = _top2_scan(x, x, m, tile, idx)
    return m1
