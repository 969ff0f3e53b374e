"""Backend dispatch for the pairwise-reduction compute path.

Three backends with identical contracts:

- ``dense``     — materialize the (M, N) tile in registers/VMEM via plain jnp
                  (fastest for small problems; the torch-dense analog).
- ``blockwise`` — lax.scan over j-tiles, O(M + N) memory (the KeOps analog).
- ``pallas``    — hand-tiled TPU kernels (difficp_tpu.ops.pallas_reductions)
                  for the hottest forward ops on large sets.

Shapes are static under jit, so dispatch happens at trace time.  The
crossover is set by ``DENSE_PAIR_LIMIT`` (#pairwise elements): below it the
dense path wins (XLA fuses everything into one kernel); above it dense would
materialize multi-hundred-MB buffers (the reference's own note: torch
backend "crash[es] on large datasets", kernel.py:99-104).
"""

from __future__ import annotations

import os

from difficp_tpu.ops import blockwise as _block
from difficp_tpu.ops import reductions as _dense

# 4M pairs * ~6 (M,N)-temps * 4B ~= 100MB peak — safe; beyond, stream.
DENSE_PAIR_LIMIT = int(os.environ.get("DIFFICP_DENSE_PAIR_LIMIT", 4_000_000))

_FORCE = {"mode": None}  # None = auto; "dense" | "blockwise" | "pallas"


def set_backend(mode):
    """Force a backend globally (None = size-based auto).  The analog of the
    reference's set_computversion (kernel.py:91-110)."""
    assert mode in (None, "dense", "blockwise", "pallas")
    _FORCE["mode"] = mode


def set_bwd_precision(mode):
    """Backward-pass precision policy for the Pallas custom-VJP ops:
    "fast" (payload-matmul kernels, dq relative floor ~8e-4) or "accurate"
    (blockwise VJP, f32-exact, ~10x slower).  Applies at trace time — set
    before jitting.  See pallas_reductions._BWD_PRECISION."""
    from difficp_tpu.ops.pallas_reductions import set_bwd_precision as _set

    _set(mode)


def _on_tpu():
    import jax

    return jax.default_backend() == "tpu"


def _use_dense(m, n, pallas_capable=True):
    if _FORCE["mode"] == "dense":
        return True
    if _FORCE["mode"] in ("blockwise", "pallas"):
        return False
    # NOTE (r5, measured): do NOT route tiny sizes to pallas on TPU.  A
    # first A/B suggesting pallas wins at ~500-pt frames was a jit-cache
    # artifact (the fused-loop program had been traced under the dense
    # backend; set_backend is trace-time state).  A clean-process pallas
    # trace of the same workload runs ~3x SLOWER than dense (8.0 vs 2.4-
    # 3.7 s per 8 fused iterations): each pallas call carries ~100-200 us
    # of in-program launch overhead and a tiny-frame fwd+bwd shoot makes
    # ~100 of them per loss+grad eval, while the dense path is a handful
    # of XLA fusions over (K, n, n) tiles that fit HBM bandwidth fine at
    # this size.
    return m * n <= DENSE_PAIR_LIMIT


def _use_pallas(eta):
    # all eta handled since round 2 (gradcomponent terms stream in-kernel;
    # eta != 0 backward runs the blockwise VJP inside the custom_vjp ops)
    if _FORCE["mode"] == "pallas":
        return True
    if _FORCE["mode"] is not None:
        return False
    import jax

    # pallas fused kernels: TPU-compiled fast path (interpret mode on CPU is
    # slow, so auto mode only selects them on real TPU)
    return jax.default_backend() == "tpu"


_pallas_cache = {}


def _pallas_self(sigma, eta, withlogdet):
    from difficp_tpu.ops.pallas_reductions import make_rhs_self

    key = ("self", float(sigma), float(eta), bool(withlogdet))
    if key not in _pallas_cache:
        _pallas_cache[key] = make_rhs_self(sigma, eta, withlogdet)
    return _pallas_cache[key]


def _pallas_ext(sigma, eta, withlogdet):
    from difficp_tpu.ops.pallas_reductions import make_rhs_ext

    key = ("ext", float(sigma), float(eta), bool(withlogdet))
    if key not in _pallas_cache:
        _pallas_cache[key] = make_rhs_ext(sigma, eta, withlogdet)
    return _pallas_cache[key]


def _ones_like_rows(a):
    import jax.numpy as jnp

    return jnp.ones((a.shape[0],), a.dtype)


def lddmm_rhs_self(q, p, sigma, eta, withlogdet, mask_q=None):
    if _use_dense(q.shape[0], q.shape[0]):
        return _dense.lddmm_rhs_self(q, p, sigma, eta, withlogdet, mask_q)
    if _use_pallas(eta):
        mq = mask_q if mask_q is not None else _ones_like_rows(q)
        return _pallas_self(sigma, eta, withlogdet)(q, p, mq)
    return _block.lddmm_rhs_self(q, p, sigma, eta, withlogdet, mask_q)


def lddmm_rhs_ext(q, p, x, sigma, eta, withlogdet, mask_q=None, mask_x=None):
    m = q.shape[0]
    if _use_dense(m, m + x.shape[0]):
        return _dense.lddmm_rhs_ext(q, p, x, sigma, eta, withlogdet, mask_q, mask_x)
    if _use_pallas(eta):
        mq = mask_q if mask_q is not None else _ones_like_rows(q)
        mx = mask_x if mask_x is not None else _ones_like_rows(x)
        return _pallas_ext(sigma, eta, withlogdet)(q, p, x, mq, mx)
    return _block.lddmm_rhs_ext(q, p, x, sigma, eta, withlogdet, mask_q, mask_x)


def _static_float(v):
    """float(v) if v is a trace-time constant, else None (rare: a traced
    sigma cannot key a static-sigma kernel factory — fall back)."""
    try:
        return float(v)
    except Exception:
        return None


def v_field(x, q, p, sigma, eta, mask_q=None):
    sig = _static_float(sigma)
    # a traced sigma cannot key the static-sigma pallas factory — keep the
    # dense path preferred below the pair limit there
    if _use_dense(x.shape[0], q.shape[0], pallas_capable=sig is not None):
        return _dense.v_field(x, q, p, sigma, eta, mask_q)
    if _use_pallas_generic() and sig is not None:
        from difficp_tpu.ops.pallas_ksum import make_v_field

        key = ("vfield", sig, float(eta))
        if key not in _pallas_cache:
            _pallas_cache[key] = make_v_field(sig, float(eta))
        mq = mask_q if mask_q is not None else _ones_like_rows(q)
        return _pallas_cache[key](x, q, p, mq)
    return _block.v_field(x, q, p, sigma, eta, mask_q)


def mdivsum(x, q, p, sigma, eta, mask_q=None, mask_x=None):
    """Standalone -sum div(v) at data points (LDDMM.py:120-138); the shoot's
    hot path gets this fused inside lddmm_rhs_* instead.  Above the dense
    pair limit: the generated payload-matmul kernel (value AND gradients,
    r5 — its pair density is the ext dcx component of the pair-polynomial
    compiler); blockwise when sigma is traced or pallas is unavailable."""
    sig = _static_float(sigma)
    if _use_dense(q.shape[0], x.shape[0], pallas_capable=False):
        return _dense.mdivsum(x, q, p, sigma, eta, mask_q, mask_x)
    if _use_pallas_generic() and sig is not None:
        from difficp_tpu.ops.pallas_ksum import make_mdivsum

        key = ("mdiv", sig, float(eta))
        if key not in _pallas_cache:
            _pallas_cache[key] = make_mdivsum(sig, float(eta))
        mq = mask_q if mask_q is not None else _ones_like_rows(q)
        mx = mask_x if mask_x is not None else _ones_like_rows(x)
        return _pallas_cache[key](x, q, p, mq, mx)
    return _block.mdivsum(x, q, p, sigma, eta, mask_q, mask_x)


def _use_pallas_generic():
    """Pallas dispatch for the non-RHS kernels (no eta restriction)."""
    if _FORCE["mode"] == "pallas":
        return True
    if _FORCE["mode"] is not None:
        return False
    import jax

    return jax.default_backend() == "tpu"


def min_sqdist(x, y, mask_y=None):
    """min_j |x_i - y_j|^2 with the same tiling discipline as the RHS ops
    (KeOps sqdist.min role, reference kernel.py:324-328)."""
    if _use_dense(x.shape[0], y.shape[0]):
        return _dense.min_sqdist(x, y, mask_y)
    if _use_pallas_generic():
        from difficp_tpu.ops.pallas_reductions import kmin2_pallas

        m1, _ = kmin2_pallas(x, y, mask_y, exclude_self=False)
        return m1
    return _block.min_sqdist(x, y, mask_y)


def second_min_sqdist(x, mask=None):
    """Nearest-neighbour (excluding self) squared distance — KeOps Kmin(2),
    reference point_sets.py:23-25.  Tiled above DENSE_PAIR_LIMIT (the dense
    (N, N) materialization is unusable at 100k+ points)."""
    if _use_dense(x.shape[0], x.shape[0]):
        return _dense.second_min_sqdist(x, mask)
    if _use_pallas_generic():
        from difficp_tpu.ops.pallas_reductions import kmin2_pallas

        # self excluded in-kernel, so the first minimum is the NN distance
        m1, _ = kmin2_pallas(x, x, mask, exclude_self=True)
        return m1
    return _block.second_min_sqdist(x, mask)


def check_coverage(x, y, sigma, r_threshold, mask_x=None, mask_y=None):
    """True for x_i farther than r_threshold*sigma from every y_j
    (kernel.py:324-328), via the dispatched min reduction."""
    import jax.numpy as jnp

    uncov = min_sqdist(x, y, mask_y) > (r_threshold * sigma) ** 2
    if mask_x is not None:
        uncov = jnp.logical_and(uncov, mask_x > 0)
    return uncov


def hamiltonian(q, p, sigma, eta, mask_q=None):
    """H(q, p) any eta (LDDMM.py:142-159) — evaluated (and differentiated)
    in EVERY L-BFGS trajloss at scale, so it gets the payload-matmul path:
    value AND gradient each cost one fused-RHS-grade kernel call."""
    sig = _static_float(sigma)
    if _use_dense(q.shape[0], q.shape[0], pallas_capable=sig is not None):
        return _dense.hamiltonian(q, p, sigma, eta, mask_q)
    if _use_pallas_generic() and sig is not None:
        from difficp_tpu.ops.pallas_ksum import make_hamiltonian

        key = ("ham", sig, float(eta))
        if key not in _pallas_cache:
            _pallas_cache[key] = make_hamiltonian(sig, float(eta))
        mq = mask_q if mask_q is not None else _ones_like_rows(q)
        return _pallas_cache[key](q, p, mq)
    return _block.hamiltonian(q, p, sigma, eta, mask_q)


def grad_kred(x, y, sigma, mask_y=None):
    """sum_j (grad K)(x_i - y_j) (kernel.py:142), size-dispatched."""
    if _use_dense(x.shape[0], y.shape[0]):
        return _dense.grad_kred(x, y, sigma, mask_y)
    if _use_pallas_generic():
        from difficp_tpu.ops.pallas_ksum import grad_kred_mm

        return grad_kred_mm(x, y, sigma, mask_y)
    return _block.grad_kred(x, y, sigma, mask_y)


def kred(x, y, b, sigma, mask_y=None):
    """Kernel-sum convolution sum_j K(x_i - y_j) b_j (the KeOps KRed role,
    kernel.py:138), size-dispatched — the standard algorithm's data_distance
    rides this instead of materializing the (Nx, Ny) Gram matrix."""
    if _use_dense(x.shape[0], y.shape[0]):
        return _dense.kred(x, y, b, sigma, mask_y)
    if _use_pallas_generic():
        from difficp_tpu.ops.pallas_ksum import kred_mm

        return kred_mm(x, y, b, sigma, mask_y)
    return _block.kred(x, y, b, sigma, mask_y)


def kred_scal(x, y, d, sigma, mask_y=None):
    """sum_j K(x_i - y_j) d_j, scalar payload (kernel.py:134)."""
    if _use_dense(x.shape[0], y.shape[0]):
        return _dense.kred_scal(x, y, d, sigma, mask_y)
    if _use_pallas_generic():
        from difficp_tpu.ops.pallas_ksum import kred_scal_mm

        return kred_scal_mm(x, y, d, sigma, mask_y)
    return _block.kred_scal(x, y, d, sigma, mask_y)
