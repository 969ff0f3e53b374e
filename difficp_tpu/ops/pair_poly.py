"""Bilinear pair-polynomial compiler: auto-derived payload-matmul VJPs.

Every pairwise Gaussian reduction in this framework has the form

    L = sum_ij k_ij S_ij,   k_ij = exp(-|q_i - q_j|^2 / 2 sigma^2),

where the pair density S is a POLYNOMIAL in row-side quantities (q_i, p_i,
cotangents gv_i/gg_i, masks) and col-side quantities (q_j, p_j, ...).  Its
gradients are again such sums:

    dL/d(row var v at l) = sum_j k_lj [ dS/dv - u * delta * S ]   (q vars)
    dL/d(col var v at l) = sum_i k_il [ ... ]  == row form of the SWAPPED
                                                  polynomial (k symmetric)

and any such polynomial evaluates as a payload-matmul kernel-sum: group
terms by their col-side monomial -> the payload-column table, contract with
the kernel tile on the MXU (``pallas_ksum.pairwise_ksum``), then recombine
with the row-side monomials in plain jnp.

This module implements that algebra (``BP``), the evaluation
(``eval_polys``), and the backward-pass polynomials of the fused LDDMM RHS
for ANY eta (the gradcomponent model, reference LDDMM.py:113-116,150-155,
176-227) — replacing the blockwise-VJP fallback with generated MXU kernels.
The eta == 0 hand-written backward kernels (``pallas_reductions``) remain
the fast path for the default configs; tests cross-check the generated
polynomials against them and against the blockwise VJP.

Monomial magnitudes: coordinates must be pre-centered by the caller
(``pallas_reductions._mm_center``) — the expansion of delta-powers into raw
monomials cancels catastrophically for clouds far from the origin.
"""

from __future__ import annotations

import jax.numpy as jnp

from difficp_tpu.ops.pallas_ksum import pairwise_ksum, pairwise_ksum_sym

_EPS = 1e-30

# Self FORWARD evaluations switch to the SYMMETRIC generic kernel (each
# unordered tile pair's exp computed once, pallas_ksum.pairwise_ksum_sym)
# above this many points — below it the dual-table + block-pair fixed cost
# outweighs the halved exp work (same crossover as the hand-written
# eta == 0 symmetric kernels, pallas_reductions._SYM_BWD_MIN_M).  Measured
# TPU v5e at M=131k, d=2: fwd 211 vs 178 Gpair/s ordered.
_SYM_MIN_M = 32768
# ... and only while the union payload table is narrow enough that the
# kernel stays exp-bound: past this the MXU contraction dominates and the
# symmetric pass saves nothing (measured: the 121-col d=2 BACKWARD is
# already MXU/table-bound at 127-128 Gpair/s either way — the generated
# backward therefore stays on the ordered kernel; see rhs_self_bwd_poly).
_SYM_MAX_COLS = 192


class BP:
    """Bilinear-separable pair polynomial: dict {(row_mono, col_mono): c}
    with monomials as sorted tuples of variable names."""

    __slots__ = ("t",)

    def __init__(self, t=None):
        self.t = dict(t) if t else {}

    @staticmethod
    def const(c):
        return BP({((), ()): float(c)}) if c else BP()

    @staticmethod
    def rvar(name):
        return BP({((name,), ()): 1.0})

    @staticmethod
    def cvar(name):
        return BP({((), (name,)): 1.0})

    def _acc(self, key, c):
        v = self.t.get(key, 0.0) + c
        if abs(v) < _EPS:
            self.t.pop(key, None)
        else:
            self.t[key] = v

    def __add__(self, other):
        if not isinstance(other, BP):
            other = BP.const(other)
        out = BP(self.t)
        for k, c in other.t.items():
            out._acc(k, c)
        return out

    __radd__ = __add__

    def __neg__(self):
        return BP({k: -c for k, c in self.t.items()})

    def __sub__(self, other):
        return self + (-other if isinstance(other, BP) else BP.const(-other))

    def __rsub__(self, other):
        return (-self) + other

    def __mul__(self, other):
        if not isinstance(other, BP):
            return BP({k: c * float(other) for k, c in self.t.items()}
                      if other else None)
        out = BP()
        for (rm1, cm1), c1 in self.t.items():
            for (rm2, cm2), c2 in other.t.items():
                key = (tuple(sorted(rm1 + rm2)), tuple(sorted(cm1 + cm2)))
                out._acc(key, c1 * c2)
        return out

    __rmul__ = __mul__

    def swap(self):
        """Exchange row and col roles (valid under the symmetric kernel)."""
        return BP({(cm, rm): c for (rm, cm), c in self.t.items()})

    def diff(self, var, side):
        """Partial derivative wrt a row-side (side=0) or col-side (side=1)
        occurrence of ``var``."""
        out = BP()
        for (rm, cm), c in self.t.items():
            mono = rm if side == 0 else cm
            n = mono.count(var)
            if n == 0:
                continue
            reduced = list(mono)
            reduced.remove(var)
            reduced = tuple(reduced)
            key = (reduced, cm) if side == 0 else (rm, reduced)
            out._acc(key, c * n)
        return out

    def col_monomials(self):
        return {cm for (_, cm) in self.t}


def _dot_bp(a, b):
    out = BP()
    for x, y in zip(a, b):
        out = out + x * y
    return out


def _sym_table(cms, x, col_vals, sigma, t):
    """Evaluate the union kernel-sum table through the SYMMETRIC generic
    kernel (self set: rows == cols == ``x``).  Requires every col monomial
    to carry the binary mask variable ``m`` at least once (true of every
    density in this module — each is built from the mm = m_i m_j factor);
    the kernel multiplies each payload row by m exactly once, valid for
    0/1 masks since m^k == m."""
    nx, d = x.shape
    coord = {f"q{e}" for e in range(d)}
    names = [f"q{e}" for e in range(d)] + sorted(
        {n for cm in cms for n in cm} - coord - {"m"}
    )
    row_of = {n: i for i, n in enumerate(names)}
    var_rows = [col_vals[n] for n in names] + [col_vals["m"]]
    monos = tuple(
        tuple(row_of[n] for n in cm if n != "m") for cm in cms
    )
    if not all("m" in cm for cm in cms):
        # correctness precondition, not a debug check: a density whose col
        # monomial lacks the mask variable would silently drop masking in
        # the sym path (must survive python -O)
        raise ValueError(f"sym kernel-sum col monomial without mask m: {cms}")
    return pairwise_ksum_sym(var_rows, d, len(names), monos, sigma, t=t)


def eval_polys(polys, x, y, row_vals, col_vals, sigma, ti=256, tj=512,
               sym=False):
    """Evaluate {name: BP} as out[name]_i = sum_j k(x_i - y_j) P_ij.

    ``row_vals`` / ``col_vals``: {var: (Nx,) / (Ny,) array}.  ONE generic
    payload-matmul kernel call evaluates every polynomial at once (the
    union of their col-monomial tables), then a cheap jnp row-side
    recombination per output.  Masks must be encoded as polynomial
    variables (no implicit mask here).  ``sym=True`` (valid ONLY when x is
    y — a self evaluation) computes the table through the symmetric-pair
    kernel: each unordered tile pair's exp evaluated once.
    """
    cms = sorted({cm for p in polys.values() for cm in p.col_monomials()})
    idx = {cm: i for i, cm in enumerate(cms)}
    if sym:
        assert x is y, "sym=True requires a self evaluation (x is y)"
        A = _sym_table(cms, x, col_vals, sigma, ti)  # (Nx, ncols)
    else:
        ny = y.shape[0]
        one_c = jnp.ones((ny,), y.dtype)

        def cval(cm):
            v = one_c
            for name in cm:
                v = v * col_vals[name]
            return v

        table = jnp.stack([cval(cm) for cm in cms], axis=1)
        A = pairwise_ksum(x, y, table, sigma, None, ti, tj)  # (Nx, ncols)

    nx = x.shape[0]
    one_r = jnp.ones((nx,), x.dtype)
    rcache = {(): one_r}

    def rval(rm):
        if rm not in rcache:
            v = rval(rm[:-1]) * row_vals[rm[-1]]
            rcache[rm] = v
        return rcache[rm]

    outs = {}
    for name, p in polys.items():
        acc = jnp.zeros((nx,), x.dtype)
        # group by row monomial: one multiply-add per distinct row factor
        groups = {}
        for (rm, cm), c in p.t.items():
            groups.setdefault(rm, []).append((c, idx[cm]))
        for rm, terms in groups.items():
            col_comb = sum(c * A[:, i] for c, i in terms)
            acc = acc + rval(rm) * col_comb
        outs[name] = acc
    return outs


# ---------------------------------------------------------------------------
# Fused-RHS pair densities (any eta) and their backward polynomials
# ---------------------------------------------------------------------------

def _q(e, side):
    return (BP.rvar if side == 0 else BP.cvar)(f"q{e}")


def _self_component_polys(d, u, eta):
    """The OUTPUT densities of the fused self RHS, mask factors included
    (reference LDDMM.py:100-116,176-216; streaming kernels
    ``_rhs_self_kernel`` / ``_vx_kernel``):

      vq_i  = m_i sum_j k m_j (p_j + eta u delta)
      Gq_i  = m_i sum_j k m_j (-u (p_i.p_j) delta
                               - eta (u^2 (delta.c) delta - u c)
                               + eta^2 u^2 (d2 u - (d+2)) delta),
              c = p_i - p_j
      dc    = sum_i m_i sum_j k m_j (-u (p_i.delta) + eta u (d2 u - d))

    Returns ``(vq[d], gq[d], dc)`` as BPs.  The FORWARD evaluates these
    directly (``rhs_self_fwd_poly``); the BACKWARD differentiates the
    cotangent-weighted combination (``_rhs_pair_density``) — one shared
    construction, so fwd and bwd can never drift apart.
    """
    delta = [_q(e, 0) - _q(e, 1) for e in range(d)]
    d2 = _dot_bp(delta, delta)
    rp = [BP.rvar(f"p{e}") for e in range(d)]
    cp = [BP.cvar(f"p{e}") for e in range(d)]
    mm = BP.rvar("m") * BP.cvar("m")

    vq = [mm * (cp[e] + (eta * u) * delta[e]) for e in range(d)]
    pp = _dot_bp(rp, cp)
    cvec = [rp[e] - cp[e] for e in range(d)]
    gq = [
        mm * ((-u) * pp * delta[e]
              - eta * ((u * u) * _dot_bp(delta, cvec) * delta[e]
                       - u * cvec[e])
              + (eta * eta * u * u) * (u * d2 - (d + 2)) * delta[e])
        for e in range(d)
    ]
    dc = mm * ((-u) * _dot_bp(rp, delta) + (eta * u) * (u * d2 - d))
    return vq, gq, dc


def _ext_component_polys(d, u, eta):
    """Output densities of the ext cross terms: rows are data points x
    (their coordinates bound to the row ``q`` vars), cols the support
    (q, p).  ``vx`` is the advecting field at x; ``dcx`` the x-side logdet
    cost with the +u (delta.p_j) sign (reference LDDMM.py:120-138;
    streaming kernel ``_vx_kernel``)."""
    delta = [_q(e, 0) - _q(e, 1) for e in range(d)]
    d2 = _dot_bp(delta, delta)
    cp = [BP.cvar(f"p{e}") for e in range(d)]
    mm = BP.rvar("m") * BP.cvar("m")
    vx = [mm * (cp[e] + (eta * u) * delta[e]) for e in range(d)]
    dcx = mm * (u * _dot_bp(cp, delta) + (eta * u) * (u * d2 - d))
    return vx, dcx


def _rhs_pair_density(d, u, eta, self_pair: bool):
    """The cotangent-weighted pair density S_ij of the fused RHS:

    L = sum_i gv_i.vq_i + gg_i.(-Gq_i) + gc * dcost  ==  sum_ij k_ij S_ij

    built from the shared component densities (``_self_component_polys`` /
    ``_ext_component_polys``).  ``self_pair=False`` is the ext cross
    density: gv plays the gx role and dc is the x-side cost.
    Row vars: q,p,g(=gv),h(=gg),m,C(=gc broadcast); col vars: q,p,m.
    """
    rg = [BP.rvar(f"g{e}") for e in range(d)]
    rC = BP.rvar("C")
    if self_pair:
        vq, gq, dc = _self_component_polys(d, u, eta)
        rh = [BP.rvar(f"h{e}") for e in range(d)]
        s = _dot_bp(rg, vq) - _dot_bp(rh, gq) + rC * dc
    else:
        vx, dcx = _ext_component_polys(d, u, eta)
        s = _dot_bp(rg, vx) + rC * dcx
    return s


def _self_fwd_polys(d, sigma, eta, withlogdet):
    key = ("selffwd", d, float(sigma), float(eta), bool(withlogdet))
    if key not in _POLY_CACHE:
        u = 1.0 / (float(sigma) ** 2)
        vq, gq, dc = _self_component_polys(d, u, float(eta))
        polys = {}
        for e in range(d):
            polys[f"vq{e}"] = vq[e]
            polys[f"gq{e}"] = gq[e]
        if withlogdet:
            polys["dc"] = dc
        _POLY_CACHE[key] = polys
    return _POLY_CACHE[key]


def _use_sym(m, polys):
    ncols = len({cm for p in polys.values() for cm in p.col_monomials()})
    return m >= _SYM_MIN_M and ncols <= _SYM_MAX_COLS


def rhs_self_fwd_poly(q, p, mask, sigma, eta, withlogdet, ti=256, tj=512):
    """(vq, Gq, dc) of the fused self RHS for any eta — payload-matmul
    forward generated from the same component densities as the backward
    (the caller centers q).  Contract == the streaming ``_rhs_self_kernel``
    (which runs the VPU at ~1/3 the MXU pace at scale)."""
    m, d = q.shape
    vals = {"m": mask}
    for e in range(d):
        vals[f"q{e}"] = q[:, e]
        vals[f"p{e}"] = p[:, e]
    polys = _self_fwd_polys(d, sigma, eta, withlogdet)
    outs = eval_polys(polys, q, q, vals, vals, sigma, ti, tj,
                      sym=_use_sym(m, polys))
    vq = jnp.stack([outs[f"vq{e}"] for e in range(d)], axis=1)
    gq = jnp.stack([outs[f"gq{e}"] for e in range(d)], axis=1)
    dc = jnp.sum(outs["dc"]) if withlogdet else jnp.zeros((), q.dtype)
    return vq, gq, dc


def _ext_fwd_polys(d, sigma, eta, withlogdet):
    key = ("extfwd", d, float(sigma), float(eta), bool(withlogdet))
    if key not in _POLY_CACHE:
        u = 1.0 / (float(sigma) ** 2)
        vx, dcx = _ext_component_polys(d, u, float(eta))
        polys = {f"vx{e}": vx[e] for e in range(d)}
        if withlogdet:
            polys["dcx"] = dcx
        _POLY_CACHE[key] = polys
    return _POLY_CACHE[key]


def rhs_ext_fwd_poly(q, p, x, mask_q, mask_x, sigma, eta, withlogdet,
                     ti=256, tj=512):
    """(vx, dc) of the ext cross terms for any eta — payload-matmul forward
    (caller centers q and x by the same shift).  Contract == the streaming
    ``_vx_kernel``."""
    nx, d = x.shape
    xvals = {"m": mask_x}
    qvals = {"m": mask_q}
    for e in range(d):
        xvals[f"q{e}"] = x[:, e]
        qvals[f"q{e}"] = q[:, e]
        qvals[f"p{e}"] = p[:, e]
    outs = eval_polys(_ext_fwd_polys(d, sigma, eta, withlogdet), x, q,
                      xvals, qvals, sigma, ti, tj)
    vx = jnp.stack([outs[f"vx{e}"] for e in range(d)], axis=1)
    dc = jnp.sum(outs["dcx"]) if withlogdet else jnp.zeros((), x.dtype)
    return vx, dc


def _grad_polys(s, d, u, sides=("row", "col")):
    """Backward polynomials of L = sum_ij k S: outputs dq*/dp* per side.

    Row side:  dq_e = dS/drq_e - u delta_e S,  dp_e = dS/drp_e
    Col side (relabeled through the swapped polynomial so every output is a
    row-indexed kernel-sum):  dq_e += swap(dS/dcq_e) - u delta_e swap(S),
    dp_e += swap(dS/dcp_e).
    """
    delta = [_q(e, 0) - _q(e, 1) for e in range(d)]
    out = {}
    for e in range(d):
        pq = BP()
        pp_ = BP()
        if "row" in sides:
            pq = pq + s.diff(f"q{e}", 0) - u * (delta[e] * s)
            pp_ = pp_ + s.diff(f"p{e}", 0)
        if "col" in sides:
            sw = s.swap()
            pq = pq + sw.diff(f"q{e}", 0) - u * (delta[e] * sw)
            pp_ = pp_ + sw.diff(f"p{e}", 0)
        out[f"dq{e}"] = pq
        out[f"dp{e}"] = pp_
    return out


_POLY_CACHE = {}


def _self_bwd_polys(d, sigma, eta):
    key = ("self", d, float(sigma), float(eta))
    if key not in _POLY_CACHE:
        u = 1.0 / (float(sigma) ** 2)
        s = _rhs_pair_density(d, u, float(eta), self_pair=True)
        _POLY_CACHE[key] = _grad_polys(s, d, u)
    return _POLY_CACHE[key]


def rhs_self_bwd_poly(q, p, mask, gv, gg, gc, sigma, eta, ti=256, tj=512):
    """(dq, dp) of the fused self RHS for any eta — generated payload-matmul
    backward (the caller centers q).  Contract == the hand-written
    ``_rhs_self_bwd_mm`` (eta == 0) extended to the gradcomponent model."""
    m, d = q.shape
    vals = {"m": mask, "C": jnp.broadcast_to(jnp.asarray(gc, q.dtype), (m,))}
    for e in range(d):
        vals[f"q{e}"] = q[:, e]
        vals[f"p{e}"] = p[:, e]
        vals[f"g{e}"] = gv[:, e]
        vals[f"h{e}"] = gg[:, e]
    polys = _self_bwd_polys(d, sigma, eta)
    # measured TPU v5e, M=131k, d=2 (121-col table): sym 128 Gpair/s vs
    # ordered 127 — the backward is not exp-bound at this width, so the
    # halved exp buys nothing (the fwd's 20-col table IS: 211 vs 178).
    # Stay on the ordered kernel: identical speed, one fewer compiled
    # variant per registration program.
    outs = eval_polys(polys, q, q, vals, vals, sigma, ti, tj)
    dq = jnp.stack([outs[f"dq{e}"] for e in range(d)], axis=1)
    dp = jnp.stack([outs[f"dp{e}"] for e in range(d)], axis=1)
    return dq, dp


def _cross_bwd_polys(d, sigma, eta):
    """Backward polynomials of the CROSS fused RHS (ring rotations): row
    outputs (dq_row, dp_row) and col outputs (dq_col, dp_col) kept separate
    — rows hold the cotangents (gv, gg, gc), cols are the rotating shard."""
    key = ("cross", d, float(sigma), float(eta))
    if key not in _POLY_CACHE:
        u = 1.0 / (float(sigma) ** 2)
        s = _rhs_pair_density(d, u, float(eta), self_pair=True)
        row = _grad_polys(s, d, u, sides=("row",))
        sw = s.swap()
        delta_sw = [_q(e, 0) - _q(e, 1) for e in range(d)]
        col = {}
        for e in range(d):
            col[f"dq{e}"] = sw.diff(f"q{e}", 0) - u * (delta_sw[e] * sw)
            col[f"dp{e}"] = sw.diff(f"p{e}", 0)
        _POLY_CACHE[key] = (row, col)
    return _POLY_CACHE[key]


def rhs_cross_bwd_poly(qr, pr, mr, qc_, pc_, mc_, gv, gg, gc, sigma, eta,
                       ti=256, tj=512):
    """(dq_row, dp_row, dq_col, dp_col) of the cross fused RHS — generated
    payload-matmul backward, two kernel-sum directions (rows-vs-cols and
    cols-vs-rows).  Caller centers BOTH sides by one shift."""
    m, d = qr.shape
    n = qc_.shape[0]
    row_polys, col_polys = _cross_bwd_polys(d, sigma, eta)
    zc = jnp.zeros((n,), qr.dtype)
    rvals = {"m": mr, "C": jnp.broadcast_to(jnp.asarray(gc, qr.dtype), (m,))}
    cvals = {"m": mc_, "C": zc}
    for e in range(d):
        rvals[f"q{e}"] = qr[:, e]
        rvals[f"p{e}"] = pr[:, e]
        rvals[f"g{e}"] = gv[:, e]
        rvals[f"h{e}"] = gg[:, e]
        cvals[f"q{e}"] = qc_[:, e]
        cvals[f"p{e}"] = pc_[:, e]
        cvals[f"g{e}"] = zc
        cvals[f"h{e}"] = zc
    outs_r = eval_polys(row_polys, qr, qc_, rvals, cvals, sigma, ti, tj)
    outs_c = eval_polys(col_polys, qc_, qr, cvals, rvals, sigma, ti, tj)
    dqr = jnp.stack([outs_r[f"dq{e}"] for e in range(d)], axis=1)
    dpr = jnp.stack([outs_r[f"dp{e}"] for e in range(d)], axis=1)
    dqc = jnp.stack([outs_c[f"dq{e}"] for e in range(d)], axis=1)
    dpc = jnp.stack([outs_c[f"dp{e}"] for e in range(d)], axis=1)
    return dqr, dpr, dqc, dpc


def _ham_density(d, u, eta):
    """Pair density of the cross Hamiltonian share (LDDMM.py:142-159):
    H_share = sum_ij k m_i m_j [ 1/2 (p_i.p_j) + eta u (p_i.delta)
                                 - 1/2 eta^2 u (d2 u - d) ]."""
    delta = [_q(e, 0) - _q(e, 1) for e in range(d)]
    d2 = _dot_bp(delta, delta)
    rp = [BP.rvar(f"p{e}") for e in range(d)]
    cp = [BP.cvar(f"p{e}") for e in range(d)]
    s = 0.5 * _dot_bp(rp, cp)
    if eta:
        s = s + (eta * u) * _dot_bp(rp, delta)
        s = s - (0.5 * eta * eta * u) * (u * d2 - d)
    return BP.rvar("m") * BP.cvar("m") * s


def _ham_cross_polys(d, sigma, eta):
    key = ("hamx", d, float(sigma), float(eta))
    if key not in _POLY_CACHE:
        u = 1.0 / (float(sigma) ** 2)
        s = _ham_density(d, u, float(eta))
        # value + row-side gradient in one direction; col side by swap
        row = _grad_polys(s, d, u, sides=("row",))
        row["h"] = s
        sw = s.swap()
        delta_sw = [_q(e, 0) - _q(e, 1) for e in range(d)]
        col = {}
        for e in range(d):
            col[f"dq{e}"] = sw.diff(f"q{e}", 0) - u * (delta_sw[e] * sw)
            col[f"dp{e}"] = sw.diff(f"p{e}", 0)
        _POLY_CACHE[key] = (row, col)
    return _POLY_CACHE[key]


def hamiltonian_cross_poly(qr, pr, mr, qc_, pc_, mc_, sigma, eta,
                           grad_sides=(), ti=256, tj=512):
    """Cross Hamiltonian share H(rows; cols) and, optionally, its gradients
    wrt each side ('row' / 'col' in ``grad_sides``).  Caller centers."""
    m, d = qr.shape
    row_polys, col_polys = _ham_cross_polys(d, sigma, eta)

    def vals(q_, p_, m_):
        v = {"m": m_}
        for e in range(d):
            v[f"q{e}"] = q_[:, e]
            v[f"p{e}"] = p_[:, e]
        return v

    rvals = vals(qr, pr, mr)
    cvals = vals(qc_, pc_, mc_)
    want = {"h": row_polys["h"]}
    if "row" in grad_sides:
        want.update({k: v for k, v in row_polys.items() if k != "h"})
    outs_r = eval_polys(want, qr, qc_, rvals, cvals, sigma, ti, tj)
    h = jnp.sum(outs_r["h"])
    res = {"h": h}
    if "row" in grad_sides:
        res["dq_row"] = jnp.stack([outs_r[f"dq{e}"] for e in range(d)], 1)
        res["dp_row"] = jnp.stack([outs_r[f"dp{e}"] for e in range(d)], 1)
    if "col" in grad_sides:
        outs_c = eval_polys(col_polys, qc_, qr, cvals, rvals, sigma, ti, tj)
        res["dq_col"] = jnp.stack([outs_c[f"dq{e}"] for e in range(d)], 1)
        res["dp_col"] = jnp.stack([outs_c[f"dp{e}"] for e in range(d)], 1)
    return res


def _ext_bwd_polys(d, sigma, eta):
    u = 1.0 / (float(sigma) ** 2)
    key = ("ext", d, float(sigma), float(eta))
    if key not in _POLY_CACHE:
        s = _rhs_pair_density(d, u, float(eta), self_pair=False)
        # rows = data points x (outputs dx); cols = support (q, p)
        row = _grad_polys(s, d, u, sides=("row",))
        dx = {f"dx{e}": row[f"dq{e}"] for e in range(d)}
        # support-side outputs evaluate in the reverse direction: rows = q
        sw = s.swap()
        delta_sw = [_q(e, 0) - _q(e, 1) for e in range(d)]
        dqp = {}
        for e in range(d):
            # in sw, q/p of the SUPPORT are row vars; delta of sw is
            # q_support - x, the negative of the density's delta — the
            # k-derivative sign folds into sw's own delta
            dqp[f"dq{e}"] = sw.diff(f"q{e}", 0) - u * (delta_sw[e] * sw)
            dqp[f"dp{e}"] = sw.diff(f"p{e}", 0)
        _POLY_CACHE[key] = (dx, dqp)
    return _POLY_CACHE[key]


def rhs_ext_bwd_poly(q, p, x, mask_q, mask_x, gx, gc, sigma, eta,
                     ti=256, tj=512):
    """(dq, dp, dx) of the ext cross terms (vx + x-side logdet cost) for any
    eta — generated payload-matmul backward (caller centers q and x by the
    same shift).  Contract == the hand-written ``_ext_bwd_pallas``."""
    nx, d = x.shape
    m = q.shape[0]
    dx_polys, dqp_polys = _ext_bwd_polys(d, sigma, eta)
    gc_x = jnp.broadcast_to(jnp.asarray(gc, x.dtype), (nx,))
    xvals = {"m": mask_x, "C": gc_x}
    qvals = {"m": mask_q, "C": jnp.zeros((m,), q.dtype)}  # C is x-side
    for e in range(d):
        xvals[f"q{e}"] = x[:, e]
        xvals[f"g{e}"] = gx[:, e]
        xvals[f"p{e}"] = jnp.zeros((nx,), x.dtype)  # x rows carry no p
        qvals[f"q{e}"] = q[:, e]
        qvals[f"p{e}"] = p[:, e]
        qvals[f"g{e}"] = jnp.zeros((m,), q.dtype)

    outs_x = eval_polys(dx_polys, x, q, xvals, qvals, sigma, ti, tj)
    dx = jnp.stack([outs_x[f"dx{e}"] for e in range(d)], axis=1)

    # reverse direction: rows = support q, cols = data x (swapped vals)
    outs_q = eval_polys(dqp_polys, q, x, qvals, xvals, sigma, ti, tj)
    dq = jnp.stack([outs_q[f"dq{e}"] for e in range(d)], axis=1)
    dp = jnp.stack([outs_q[f"dp{e}"] for e in range(d)], axis=1)
    return dq, dp, dx
