"""Jittable / vmappable L-BFGS with a vmap-clean strong-Wolfe line search.

Reimplements the optimization contract of the reference's torch wrapper
(reference diffICP/tools/optim.py:10-110):

- L-BFGS with strong-Wolfe line search, a bounded number of outer steps each
  consisting of ``inner`` quasi-Newton iterations (torch: max_iter=20);
- best-so-far parameter tracking across EVERY function evaluation, including
  line-search trials (optim.py:34-47);
- divergence safety: non-finite / aberrant (> errthresh) trial losses are
  rejected inside the line search, so the iterate can never move to a
  non-finite point (a strictly stronger guarantee than the reference's
  restore-best-and-perturb recovery, optim.py:60-97);
- stop when the relative parameter change over an outer step drops below
  ``tol`` (optim.py:99-105).

Why hand-rolled rather than optax.lbfgs
---------------------------------------

Every production path vmaps this optimizer across frames (the K independent
per-frame registrations of the reference's sequential ``for k in range(K)``
loop, PSR.py:528).  Under ``vmap``, ``lax.cond`` executes BOTH branches, so
optax's zoom line search (``cond(interval_found, zoom, search)``) plus
``value_and_grad_from_state``'s reuse-cond pay ~2.6x redundant loss
evaluations per L-BFGS step (measured: 18 vs 7 evals on an identical
nmax=1/inner=6 problem).  Each evaluation here is a full forward+backward
geodesic shoot, so this was the dominant cost of registration at scale.

This implementation is built so that ONE ``value_and_grad`` runs per
line-search iteration, with no ``lax.cond`` anywhere:

- the bracketing and zoom phases of the strong-Wolfe search share a single
  ``lax.while_loop`` body whose phase is a boolean selected via ``jnp.where``
  (safeguarded cubic interpolation inside the zoom bracket, 2x growth while
  bracketing);
- the (value, gradient) pair of the ACCEPTED trial is threaded directly into
  the next quasi-Newton iteration (coherence invariant: the carry always
  holds the loss and gradient AT the current iterate), so no step ever
  re-evaluates the objective;
- the classical ``min(1, 1/||g0||)`` first-step seed falls out of the
  mandatory entry evaluation for free, so cold and warm starts compile to
  the SAME program (one compiled variant per configuration).

The quasi-Newton direction is the standard two-loop recursion over a
fixed-size circular (s, y) memory — pure ``jnp``, vmappable, with masked
entries for a partially filled memory.  All data-sized dot products pin
``precision="highest"`` (TPU MXU defaults to bf16 otherwise).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


class LBFGSResult(NamedTuple):
    params: any       # best parameters found (pytree, same structure as p0)
    loss: jax.Array   # best loss value
    n_steps: jax.Array  # number of outer steps taken
    change: jax.Array   # last relative parameter change (rms)
    alpha: jax.Array = jnp.asarray(0.0)  # first accepted line-search step
    #   size; feed back as ``alpha0`` of the next call on the same problem
    #   (warm start) to skip the first line search's bracketing phase
    alpha_qn: jax.Array = jnp.asarray(1.0)  # adaptive QUASI-NEWTON trial
    #   scale: the natural L-BFGS trial is 1.0 once the memory holds a
    #   pair, but on stiff raw-sum objectives a lane whose true Wolfe step
    #   sits orders below 1 re-pays the whole bracket/zoom descent EVERY
    #   watchdog-split call (measured at K=10 x 65k: half the lanes burned
    #   the full 6-eval budget per program).  This threads 8x the last step
    #   that made real relative progress; feed back as ``alpha_qn0``.
    aux: any = None   # with ``has_aux``: the auxiliary output of lossfn AT
    #   the best evaluation (e.g. the arrival ShootState — saves callers the
    #   re-shoot at the returned params, reference optim.py re-evaluates)
    n_evals: any = None  # total line-search loss+grad evaluations this call
    #   (excludes the entry eval); observability for program sizing under
    #   the execution watchdog — read it to budget inner/ls at scale
    memory: any = None  # final L-BFGS curvature memory (LBFGSMemory); feed
    #   back as ``memory0`` of the next call on the same problem so a
    #   watchdog-split sequence of short calls behaves like the reference's
    #   one long call (fresh memory per short call = steepest descent,
    #   which cannot move a stiff raw-sum objective at scale: measured
    #   useful steps below the f32 resolution of the iterate at M=131k)
    grad: any = None  # gradient AT ``params`` (pytree like p0).  Together
    #   with ``loss`` and ``aux`` this is everything the next call on the
    #   SAME objective needs to skip its mandatory entry evaluation
    #   (``value0``/``grad0``/``aux0``): at scale the entry value+grad is a
    #   full fwd+bwd shoot — half the cost of a steady nmax=1 step
    stalled: any = None  # True when this call ended with the lane frozen
    #   (torch inner tolerances, or a full-budget line search that found no
    #   step — the lane is converged at f32 resolution).  Feed back as
    #   ``stall0`` while the objective is UNCHANGED: torch's single long
    #   call freezes such a lane once and never line-searches it again,
    #   but watchdog-split short calls re-animate it every call — at
    #   K=10 x 65k a handful of f32-converged lanes re-burned the full
    #   6-eval budget per program finding nothing, pinning the vmapped
    #   joint search (measured 112-138 s/outer-iter vs ~60 healthy).
    #   Reset it (None / False) whenever the objective moves (EM update,
    #   support change) — same lifecycle as ``value0``/``grad0``.


class LBFGSMemory(NamedTuple):
    """Circular (s, y) curvature memory of ``lbfgs_optimize`` — thread
    across calls via ``memory0=res.memory`` (vmapped callers carry a (K,)
    batch of it like the warm-start alpha)."""
    S: jax.Array      # (m, n) step differences, newest at (pos - 1) % m
    Y: jax.Array      # (m, n) gradient differences
    rho: jax.Array    # (m,) 1 / <s, y>
    pos: jax.Array    # scalar int — next write slot
    count: jax.Array  # scalar int — number of valid pairs (<= m)


def zero_memory(n: int, memory_size: int = 20,
                dtype=jnp.float32) -> LBFGSMemory:
    """Empty curvature memory for an ``n``-parameter problem — the cold
    sentinel for ``memory0`` threading (count == 0 behaves exactly like
    passing no memory, so cold and warm calls share one compiled program;
    vmapped callers broadcast it to a (K,) batch)."""
    return LBFGSMemory(
        S=jnp.zeros((memory_size, n), dtype),
        Y=jnp.zeros((memory_size, n), dtype),
        rho=jnp.zeros((memory_size,), dtype),
        # non-weak int32 like the pos/count a result carries: a weak-typed
        # fresh memory vs a strong-typed carried one changes the jit
        # signature and silently recompiles the whole registration graph
        # on the FIRST carried call (~10 min remotely at 131k)
        pos=jnp.zeros((), jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


# steps below this are exact-zero / denormal artifacts, never real steps.
# This is deliberately far below any physical step size: at M=131k the
# genuine Wolfe step of the raw-sum registration objective measures
# ~1e-13, and an absolute floor of 1e-10 (the r2 value) silently discarded
# every curvature pair and warm seed there — quality protection is the
# SCALE-FREE <s, y> cosine gate plus the true-accept flag, not an absolute
# step floor.
_ALPHA_DEGENERATE = 1e-25

_C1 = 1e-4   # Armijo (sufficient decrease) constant
_C2 = 0.9    # strong-Wolfe curvature constant (quasi-Newton standard)

# torch.optim.LBFGS default inner stopping tolerances (the reference wraps
# torch with these defaults, optim.py:27): an inner iteration whose loss
# decrease AND parameter step are both below tolerance_change (or whose
# gradient is below tolerance_grad) freezes the lane for the rest of this
# call's inner loop.  Without this, converged lanes burn every inner
# iteration accepting measurable-zero "wandering" steps — f32 cannot even
# represent loss changes below eps(|f|), so freezing there is exact.
_TOL_CHANGE = 1e-9
_TOL_GRAD = 1e-7


def _dot(a, b):
    # data-sized reduction: pin f32-highest on the TPU MXU
    return jnp.dot(a, b, precision="highest")


def _rms(tree):
    sq = sum(jnp.sum(a * a) for a in jax.tree.leaves(tree))
    n = sum(a.size for a in jax.tree.leaves(tree))
    return jnp.sqrt(sq / max(n, 1))


def _seed_core(lossfn: Callable, p0):
    """(l0, seed): one value_and_grad eval and the classical first-step
    zoom seed ~ min(1, 1/||g0||).  Non-finite entry loss or gradient falls
    back to the 1.0 sentinel.  Same norm convention as the free internal
    seeding of ``lbfgs_optimize`` so the two can never diverge."""
    l0, g0 = jax.value_and_grad(lossfn)(p0)
    n = float(sum(a.size for a in jax.tree.leaves(g0)))
    g0_norm = _rms(g0) * jnp.sqrt(jnp.asarray(n, l0.dtype))
    seed = jnp.minimum(1.0, 1.0 / jnp.maximum(g0_norm, 1e-12))
    ok = jnp.logical_and(jnp.isfinite(l0), jnp.isfinite(seed))
    return l0, jnp.where(ok, seed, 1.0).astype(jnp.float32)


def seed_alpha_for(lossfn: Callable, p0) -> jax.Array:
    """Zoom line-search seed ~ min(1, 1/||g0||) for ``lossfn`` at ``p0``.

    Kept for API stability: ``lbfgs_optimize`` now derives this seed for
    free from its mandatory entry evaluation whenever ``alpha0`` is absent
    or degenerate, so calling this externally is only useful to inspect the
    seed itself."""
    return _seed_core(lossfn, p0)[1]


def _cubic_min(a, fa, dga, b, fb, dgb):
    """Minimizer of the cubic through (a, fa, dga), (b, fb, dgb)
    (Nocedal & Wright eq. 3.59).  May return NaN/inf on degenerate input;
    callers safeguard with bisection."""
    d1 = dga + dgb - 3.0 * (fa - fb) / (a - b)
    d2 = jnp.sqrt(jnp.maximum(d1 * d1 - dga * dgb, 0.0)) * jnp.sign(b - a)
    return b - (b - a) * (dgb + d2 - d1) / (dgb - dga + 2.0 * d2)


def _make_linesearch(vg, max_steps: int, errthresh):
    """Strong-Wolfe line search, one ``vg`` evaluation per iteration.

    Bracketing (Nocedal & Wright Alg. 3.5) and zoom (Alg. 3.6) run in one
    ``lax.while_loop`` whose phase is a carried boolean — under vmap each
    joint iteration costs exactly one batched evaluation, and finished
    lanes are masked by the while_loop batching rule at no extra cost.

    Invariants: (a_lo, f_lo, dg_lo, g_lo) is the best Armijo-satisfying
    point seen (a_lo = 0 initially), so the budget-exhausted fallback
    accepts lo — the iterate never moves to a non-finite or non-decreasing
    point.  Trials with non-finite or aberrant (> errthresh) loss fail
    Armijo and shrink the bracket, which is the divergence recovery.
    """

    def linesearch(x, fx, gx, d, a1, best_x, best_f, best_g, best_aux):
        dg0 = _dot(gx, d)
        descent = jnp.logical_and(jnp.isfinite(dg0), dg0 < 0)
        fd = fx.dtype
        zero = jnp.zeros((), fd)

        carry0 = (
            jnp.asarray(0),
            ~descent,                       # done (no-descent lanes skip)
            jnp.zeros((), jnp.bool_),       # in_zoom
            jnp.zeros((), jnp.bool_),       # accepted (strong-Wolfe hit)
            jnp.zeros((), jnp.bool_),       # prev zoom trial hugged an edge
            zero, fx, dg0, gx,              # lo: a, f, dg, full grad
            zero + jnp.inf, zero + jnp.inf, zero,  # hi: a, f, dg
            jnp.maximum(a1, 1e-30).astype(fd),     # current trial step
            zero, fx, gx,                   # accepted: a, f, full grad
            best_x, best_f, best_g, best_aux,
        )

        def cond(c):
            return jnp.logical_and(~c[1], c[0] < max_steps)

        def body(c):
            (k, done, in_zoom, was_acc, was_edge, a_lo, f_lo, dg_lo, g_lo,
             a_hi, f_hi, dg_hi, a, acc_a, acc_f, acc_g,
             bx, bf, bg, baux) = c
            xa = x + a * d
            (fa, aux), ga = vg(xa)
            dga = _dot(ga, d)
            okf = jnp.logical_and(jnp.isfinite(fa), fa <= errthresh)
            # best-so-far at every evaluation (reference optim.py:34-47)
            bb = jnp.logical_and(okf, fa < bf)
            bf = jnp.where(bb, fa, bf)
            bx = jnp.where(bb, xa, bx)
            bg = jnp.where(bb, ga, bg)
            baux = jax.tree.map(lambda n_, o_: jnp.where(bb, n_, o_),
                                aux, baux)

            armijo = jnp.logical_and(okf, fa <= fx + _C1 * a * dg0)
            strong = jnp.logical_and(armijo, jnp.abs(dga) <= -_C2 * dg0)
            # a DIVERGENT trial met while still BRACKETING does not open a
            # bracket (its NaN/aberrant endpoint would force pure bisection
            # from the seed: the stiff raw-sum objectives at 65k+ points
            # have their Wolfe step ~5 orders below the 1/||g0|| seed and
            # blow up to NaN in between, so ~14 halvings never fit a
            # watchdog-sized ls budget — measured ZERO accepted steps and
            # zero FE progress at K=10 x 65k).  Instead back off the trial
            # geometrically (a/64): 3 evals reach a finite region from any
            # seed overshoot, then normal bracket/zoom resumes.
            brk_div = jnp.logical_and(~okf, ~in_zoom)
            hi_cond = jnp.logical_and(
                ~brk_div, jnp.logical_or(~armijo, fa >= f_lo))
            accept = jnp.logical_and(~hi_cond, strong)
            # bracket: derivative turned non-negative -> interval is
            # (a, old lo); zoom: same test in interval orientation
            # okf gate: a finite-but-aberrant (fa > errthresh) bracketing
            # trial must not flip into zoom — lo_upd is suppressed for it,
            # so the flip would open a degenerate a_lo == a_hi bracket.
            flip = jnp.logical_and(
                jnp.logical_and(okf, jnp.logical_and(~hi_cond, ~strong)),
                jnp.where(in_zoom, dga * (a_hi - a_lo) >= 0, dga >= 0),
            )
            na_hi = jnp.where(hi_cond, a, jnp.where(flip, a_lo, a_hi))
            nf_hi = jnp.where(hi_cond, fa, jnp.where(flip, f_lo, f_hi))
            ndg_hi = jnp.where(hi_cond, dga, jnp.where(flip, dg_lo, dg_hi))
            lo_upd = jnp.logical_and(jnp.logical_and(~hi_cond, ~strong), okf)
            na_lo = jnp.where(lo_upd, a, a_lo)
            nf_lo = jnp.where(lo_upd, fa, f_lo)
            ndg_lo = jnp.where(lo_upd, dga, dg_lo)
            ng_lo = jnp.where(lo_upd, ga, g_lo)
            nzoom = jnp.logical_or(in_zoom, jnp.logical_or(hi_cond, flip))

            # next trial inside the zoom bracket: cubic CLAMPED into the
            # 10%-margin interior (a cubic pushing past an edge still moves
            # >=10x toward it per step — plain bisection needs ~12 halvings
            # when the Wolfe step sits 3-4 orders below the seed, which
            # exhausted real 131k line searches).  Two consecutive edge
            # hugs -> bisect (torch _strong_wolfe's insufficient-progress
            # rule), so a stalling cubic cannot pin the bracket.
            cube = _cubic_min(na_lo, nf_lo, ndg_lo, na_hi, nf_hi, ndg_hi)
            amin = jnp.minimum(na_lo, na_hi)
            amax = jnp.maximum(na_lo, na_hi)
            w = amax - amin
            lo_edge = amin + 0.1 * w
            hi_edge = amax - 0.1 * w
            clamped = jnp.clip(cube, lo_edge, hi_edge)
            at_edge = jnp.logical_or(clamped <= lo_edge,
                                     clamped >= hi_edge)
            mid = 0.5 * (na_lo + na_hi)
            use_bisect = jnp.logical_or(
                ~jnp.isfinite(cube), jnp.logical_and(at_edge, was_edge))
            z_next = jnp.where(use_bisect, mid, clamped)
            nwas_edge = jnp.logical_and(at_edge, ~use_bisect)
            # bracketing growth: cubic extrapolation through (lo, trial),
            # clamped to [2a, 10a] (fixed 2x growth needs ~12 doublings to
            # recover a 3-4 orders-too-small seed)
            grow = _cubic_min(a_lo, f_lo, dg_lo, a, fa, dga)
            grow = jnp.where(jnp.isfinite(grow),
                             jnp.clip(grow, 2.0 * a, 10.0 * a), 2.0 * a)
            a_next = jnp.where(nzoom, z_next, grow)
            a_next = jnp.where(brk_div, a * (1.0 / 64.0), a_next)

            nacc_a = jnp.where(accept, a, acc_a)
            nacc_f = jnp.where(accept, fa, acc_f)
            nacc_g = jnp.where(accept, ga, acc_g)
            ndone = jnp.logical_or(done, accept)
            nwas_acc = jnp.logical_or(was_acc, accept)
            return (k + 1, ndone, nzoom, nwas_acc, nwas_edge,
                    na_lo, nf_lo, ndg_lo, ng_lo,
                    na_hi, nf_hi, ndg_hi, a_next, nacc_a, nacc_f, nacc_g,
                    bx, bf, bg, baux)

        out = jax.lax.while_loop(cond, body, carry0)
        (k_end, done, _, was_acc, _, a_lo, f_lo, _, g_lo, _, _, _, _,
         acc_a, acc_f, acc_g, bx, bf, bg, baux) = out
        # budget exhausted: fall back to lo (Armijo-satisfying by
        # invariant; a_lo = 0 means "no move", a safe stall)
        acc_a = jnp.where(done, acc_a, a_lo)
        acc_f = jnp.where(done, acc_f, f_lo)
        acc_g = jnp.where(done, acc_g, g_lo)
        return acc_a, acc_f, acc_g, was_acc, bx, bf, bg, baux, k_end

    return linesearch


def _two_loop(g, S, Y, rho, pos, count, m: int):
    """L-BFGS two-loop recursion over the circular (s, y) memory; masked
    for a partially filled memory; newest-pair gamma scaling."""
    idx = (pos - 1 - jnp.arange(m)) % m          # newest -> oldest
    valid = jnp.arange(m) < count

    # small problems are sequential-op-count bound: unroll the two-loop
    # recursion (2m tiny dots per direction) so XLA fuses it straight-line
    unroll = m if g.size <= 65_536 else 1

    def bwd(q, kv):
        k, v = kv
        al = jnp.where(v, rho[k] * _dot(S[k], q), 0.0)
        return q - al * Y[k], al

    q, als = jax.lax.scan(bwd, g, (idx, valid), unroll=unroll)
    newest = (pos - 1) % m
    sy = _dot(S[newest], Y[newest])
    yy = _dot(Y[newest], Y[newest])
    gamma = jnp.where(count > 0, sy / jnp.maximum(yy, 1e-30), 1.0)
    r = gamma * q

    def fwd(r, kva):
        k, v, al = kva
        beta = jnp.where(v, rho[k] * _dot(Y[k], r), 0.0)
        return r + (al - beta) * S[k], None

    r, _ = jax.lax.scan(fwd, r, (idx[::-1], valid[::-1], als[::-1]),
                        unroll=unroll)
    return -r


def lbfgs_optimize(
    lossfn: Callable,
    p0,
    nmax: int = 10,
    inner: int = 20,
    tol: float = 1e-3,
    errthresh: float = 1e8,
    memory_size: int = 20,
    max_linesearch_steps: int = 25,
    alpha0=None,
    alpha_qn0=None,
    has_aux: bool = False,
    memory0: LBFGSMemory | None = None,
    value0=None,
    grad0=None,
    aux0=None,
    stall0=None,
) -> LBFGSResult:
    """Minimize ``lossfn(params)`` starting from pytree ``p0``.

    Semantics follow reference optim.py: up to ``nmax`` outer steps of
    ``inner`` L-BFGS iterations each; returns the best parameters seen at
    ANY evaluation (line-search trials included).

    ``alpha0``: warm-start step size for the first line search (use the
    ``alpha`` of a previous result on the same problem).  ``None``, a
    non-positive or non-finite value falls back to the free internal
    ``min(1, 1/||g0||)`` seed — cold and warm starts compile to the same
    program, so callers inside jit can pass 0.0 as a dynamic "no warm
    start" sentinel.

    ``has_aux``: ``lossfn`` returns ``(loss, aux)``; the aux of the BEST
    evaluation is returned in ``LBFGSResult.aux`` (lets the LDDMM caller
    reuse the accepted trial's arrival ShootState instead of re-shooting).

    ``memory0``: curvature memory from a previous call on the same problem
    (``res.memory``).  A sequence of short calls (the on-device watchdog
    forces ``nmax=1``-sized programs at scale) then optimizes like the
    reference's single long call; without it every short call restarts as
    steepest descent, which is hopeless on stiff objectives.  The slowly
    moving EM targets between calls make the carried pairs slightly stale —
    the curvature-pair quality gate drops any that turned inconsistent.

    ``value0``/``grad0`` (give both or neither): the loss and gradient AT
    ``p0`` from a previous result on the IDENTICAL objective
    (``res.loss``/``res.grad``) — skips this call's mandatory entry
    ``value_and_grad``.  Unlike ``memory0`` (tolerant of slowly moving
    targets), these are only valid when the objective has NOT changed since
    they were computed (e.g. watchdog-split ``Reg_opt`` calls between EM
    updates); a stale pair silently corrupts the Armijo baseline.  With
    ``has_aux``, pass the matching ``aux0`` (``res.aux``).  This is a
    static (trace-time) switch: threaded and unthreaded calls compile to
    different programs.
    """
    if (value0 is None) != (grad0 is None):
        raise ValueError("value0 and grad0 must be given together")
    if value0 is not None and has_aux and aux0 is None:
        raise ValueError("aux0 is required with value0/grad0 when has_aux")
    x0, unravel = ravel_pytree(p0)
    m = int(memory_size)
    n = x0.size

    def f(x):
        out = lossfn(unravel(x))
        return out if has_aux else (out, ())

    vg = jax.value_and_grad(f, has_aux=True)
    linesearch = _make_linesearch(vg, int(max_linesearch_steps),
                                  jnp.asarray(errthresh))

    # ---- entry evaluation: iteration 1's (value, grad) AND the free
    # 1/||g0|| line-search seed (classical first-step heuristic — the
    # objective is a raw sum over points, reference convention, so the
    # first gradient can be huge and a 1.0 start would burn the whole
    # zoom budget shrinking).  A caller-threaded (value0, grad0) replaces
    # it entirely: at scale this eval is a full fwd+bwd shoot, i.e. half
    # of a steady-state nmax=1 step.
    if value0 is not None:
        f0 = jnp.asarray(value0)
        g0 = ravel_pytree(grad0)[0]
        baux0 = aux0 if has_aux else ()
    else:
        (f0, baux0), g0 = vg(x0)
    g0c = jnp.where(jnp.isfinite(g0), g0, 0.0)
    gnorm = jnp.sqrt(_dot(g0c, g0c))
    seed = jnp.minimum(1.0, 1.0 / jnp.maximum(gnorm, 1e-12))
    seed = jnp.where(jnp.isfinite(seed), seed, 1.0).astype(jnp.float32)
    a0v = jnp.asarray(0.0 if alpha0 is None else alpha0, jnp.float32)
    warm_ok = jnp.logical_and(a0v > _ALPHA_DEGENERATE, jnp.isfinite(a0v))
    alpha_h = jnp.where(warm_ok, a0v, seed)
    # adaptive quasi-Newton trial scale (see LBFGSResult.alpha_qn): 1.0 =
    # the natural trial (cold / healthy); threaded values start the search
    # where the last productive step landed
    aqn0v = jnp.asarray(1.0 if alpha_qn0 is None else alpha_qn0,
                        jnp.float32)
    aqn0v = jnp.where(
        jnp.logical_and(jnp.isfinite(aqn0v), aqn0v > _ALPHA_DEGENERATE),
        jnp.minimum(aqn0v, 1.0), 1.0)

    fd = f0.dtype
    best_x0 = x0
    best_f0 = jnp.where(jnp.isfinite(f0), f0, jnp.asarray(jnp.inf, fd))

    if memory0 is None:
        S0 = jnp.zeros((m, n), x0.dtype)
        Y0 = jnp.zeros((m, n), x0.dtype)
        rho0 = jnp.zeros((m,), fd)
        pos0 = jnp.asarray(0)
        count0 = jnp.asarray(0)
    else:
        S0, Y0 = memory0.S, memory0.Y
        rho0 = memory0.rho
        pos0 = memory0.pos
        count0 = memory0.count

    def make_inner_step(active):
        # ``active`` is this lane's outer-loop condition re-evaluated
        # inside the body; ``act`` (carried) additionally freezes a lane
        # whose last step fell below the torch inner tolerances.
        # Unbatched they are True until convergence.  Under vmap,
        # lax.while_loop runs the body for EVERY lane until ALL finish —
        # a converged lane with its real gradient would keep line-searching
        # a flat landscape and drag the joint line-search trip count.
        # Zeroing its direction makes it a no-descent lane: the line
        # search skips immediately (ZERO evaluations) and the lane freezes
        # at bookkeeping-only cost.
        def inner_step(carry, _):
            (x, fx, gx, S, Y, rho, pos, count, bx, bf, bg, baux,
             a_first, act, nev, aqn, ever_step) = carry
            g_clean = jnp.where(jnp.isfinite(gx), gx, 0.0)
            d = _two_loop(g_clean, S, Y, rho, pos, count, m)
            dg = _dot(g_clean, d)
            # non-descent quasi-Newton direction (stale/corrupt memory):
            # fall back to steepest descent
            d = jnp.where(dg < 0, d, -g_clean)
            d = jnp.where(jnp.logical_and(active, act), d,
                          jnp.zeros_like(d))
            # first step is steepest-descent-scaled (seed); once the
            # memory has a pair, the trial is the ADAPTIVE quasi-Newton
            # scale aqn (1.0 = the natural Nocedal & Wright trial; below it
            # when the last productive step showed the landscape is stiffer
            # — restarting at 1.0 re-paid the whole zoom descent every
            # watchdog-split call on the 65k atlas lanes)
            a1 = jnp.where(count == 0, alpha_h.astype(fd),
                           aqn.astype(fd))
            acc_a, acc_f, acc_g, acc_ok, bx, bf, bg, baux, ls_k = linesearch(
                x, fx, gx, d, a1, bx, bf, bg, baux)
            nev = nev + ls_k
            # adapt the quasi-Newton trial to the step that actually made
            # real relative progress (taken steps with df ~ 0 are converged
            # lanes accepting ~0-length steps — those must NOT collapse the
            # trial, the r2 warm-seed-poison lesson); the /64 lower clamp
            # bounds the per-step shrink, bracketing growth (10x/eval)
            # recovers an undersized trial cheaply.
            # Only TRUE strong-Wolfe accepts with real relative progress
            # update the trial scale.  Letting budget-fallback steps
            # qualify (tried in r5) made the tracker chaotic — fallback
            # sizes encode where the budget ran out, not the landscape —
            # and measurably degraded single-lane convergence quality
            # (chui diffeomorphic FE regressed from 0.7% to 8% off the
            # torch reference at equal budgets).  Lanes that can never
            # truly accept are handled elsewhere: the cross-call STALL
            # flag freezes f32-converged warm lanes, and cold no-step
            # calls bootstrap the warm SEED down by the probed range.
            progress = (fx - acc_f) > 1e-9 * jnp.abs(fx)
            taken_ok = jnp.logical_and(
                jnp.logical_and(acc_a > _ALPHA_DEGENERATE, acc_ok),
                progress)
            # /256 per-update shrink clamp: the stiff-lane scale sits 5-6
            # orders below 1.0 at 65k — /64 took 4+ calls of full-budget
            # descent to reach it, /256 gets there in 2 while still
            # bounding an anomalous single-step collapse (growth back is
            # ~10x/eval)
            aqn = jnp.where(
                taken_ok,
                jnp.clip(8.0 * acc_a.astype(jnp.float32), aqn / 256.0, 1.0),
                aqn)
            s = acc_a * d
            y = acc_g - gx
            sy = _dot(s, y)
            # curvature condition, scale-free: keep the pair only if the
            # (s, y) cosine is meaningfully positive
            sn = jnp.sqrt(_dot(s, s))
            yn = jnp.sqrt(_dot(y, y))
            good = jnp.logical_and(
                jnp.logical_and(acc_a > _ALPHA_DEGENERATE,
                                jnp.isfinite(sy)),
                sy > 1e-10 * jnp.maximum(sn * yn, 1e-30),
            )
            rho_new = 1.0 / jnp.maximum(sy, 1e-30)
            S = jnp.where(good, S.at[pos].set(s), S)
            Y = jnp.where(good, Y.at[pos].set(y), Y)
            rho = jnp.where(good, rho.at[pos].set(rho_new), rho)
            npos = jnp.where(good, (pos + 1) % m, pos)
            ncount = jnp.where(good, jnp.minimum(count + 1, m), count)
            # record the first TRULY accepted (strong-Wolfe, not
            # budget-fallback) steepest-descent step: the warm seed for the
            # NEXT call's first line search.  Fallback steps don't qualify —
            # an exhausted search's a_lo says nothing about the landscape
            # scale.
            a_first = jnp.where(
                jnp.logical_and(
                    jnp.logical_and(a_first <= 0, acc_ok),
                    jnp.logical_and(count == 0,
                                    acc_a > _ALPHA_DEGENERATE)),
                acc_a.astype(jnp.float32), a_first)
            # torch inner stopping rule (LBFGS defaults, reference
            # optim.py:27): loss decrease AND max parameter step below
            # tolerance_change, or gradient below tolerance_grad -> freeze
            # this lane for the remaining inner iterations of this call
            df = fx - acc_f
            step_inf = jnp.max(jnp.abs(s))
            g_inf = jnp.max(jnp.abs(acc_g))
            stopped = jnp.logical_or(
                jnp.logical_and(df <= _TOL_CHANGE, step_inf <= _TOL_CHANGE),
                g_inf <= _TOL_GRAD,
            )
            act = jnp.logical_and(act, ~stopped)
            ever_step = jnp.logical_or(ever_step, acc_a > _ALPHA_DEGENERATE)
            # coherence invariant: (fx, gx) are the loss and gradient AT x
            x = x + s
            return (x, acc_f, acc_g, S, Y, rho, npos, ncount, bx, bf, bg,
                    baux, a_first, act, nev, aqn, ever_step), None

        return inner_step

    # cross-call stall: a stalled-in lane starts with change=0 and the
    # i==0 override suppressed, so the outer loop never runs for it (under
    # vmap its line searches contribute ZERO joint evaluations) — torch's
    # long-call freeze semantics across watchdog-split calls
    stall_v = jnp.asarray(False if stall0 is None else stall0)

    def outer_cond(carry):
        i, change, ref = carry[0], carry[-5], carry[-4]
        keep = jnp.logical_and(i < nmax,
                               change > tol * jnp.maximum(ref, 1e-30))
        return jnp.logical_or(jnp.logical_and(i == 0, ~stall_v), keep)

    def outer_body(carry):
        (i, x, fx, gx, S, Y, rho, pos, count, bx, bf, bg, baux, a_first,
         change, ref, nev, aqn, ever_step) = carry
        active = outer_cond(carry)
        prev = x
        (x, fx, gx, S, Y, rho, pos, count, bx, bf, bg, baux, a_first,
         _, nev, aqn, ever_step), _ = \
            jax.lax.scan(
                make_inner_step(active),
                (x, fx, gx, S, Y, rho, pos, count, bx, bf, bg, baux,
                 a_first, active, nev, aqn, ever_step),
                None, length=inner,
            )
        dx = x - prev
        change = jnp.sqrt(_dot(dx, dx) / max(n, 1)).astype(jnp.float32)
        ref = jnp.sqrt(_dot(prev, prev) / max(n, 1)).astype(jnp.float32)
        return (i + 1, x, fx, gx, S, Y, rho, pos, count, bx, bf, bg, baux,
                a_first, change, ref, nev, aqn, ever_step)

    carry = (
        jnp.asarray(0), x0, f0, g0, S0, Y0, rho0,
        pos0, count0,
        best_x0, best_f0, g0, baux0, jnp.zeros((), jnp.float32),
        jnp.where(stall_v, 0.0, jnp.inf).astype(jnp.float32),
        jnp.asarray(1.0, jnp.float32),
        jnp.asarray(0), aqn0v, jnp.zeros((), jnp.bool_),
    )
    out = jax.lax.while_loop(outer_cond, outer_body, carry)
    (i, x, fx, gx, S, Y, rho, pos, count, bx, bf, bg, baux, a_first,
     change, ref, nev, aqn, ever_step) = out
    # stalled-out: deliberately CONSERVATIVE — only lanes whose last outer
    # step moved the iterate at f32-noise level (the observed pathology:
    # no Armijo point found in the whole budget -> change == 0, or a
    # tolerance-freeze at step_inf <= 1e-9), AND that carried WARM
    # EVIDENCE into this call (a previously accepted step scale or live
    # curvature pairs).  A COLD lane finding nothing only proves the
    # watchdog-sized budget could not descend from the 1/||g0|| seed to
    # the Wolfe zone (5-7 orders at 131k raw-sum scales, > ls evals) —
    # marking it stalled deadlocked the whole K=10 x 131k registration
    # until the next EM reset (observed: call 2 ran 0 evals on ALL lanes
    # at identical FE).  NOT the reference's tol rule: at nmax=1
    # granularity a single coarse below-tol step must not freeze a lane
    # one long reference call would have kept optimizing.
    warm_evidence = jnp.logical_or(warm_ok, count0 > 0)
    stalled_out = jnp.logical_or(stall_v, jnp.logical_and(
        change <= 1e-8 * jnp.maximum(ref, 1e-30), warm_evidence))

    # Warm-start value for the next call: the first TRULY accepted
    # (steepest-descent-scale) step, confined to an asymmetric trust
    # window around the seed this call STARTED from.  Growth stays capped
    # at 16x/call (r2 lesson: an exploded seed poisons later zooms).
    # Shrink is allowed down to 4096x because only strong-Wolfe accepts
    # qualify now — a genuinely tiny landscape scale (measured: 1/||g0||
    # seeds 5e3x above the Wolfe step at 131k) must thread through, or
    # every subsequent search re-pays the shrink — while converged-lane
    # ~0-length budget-fallback steps never reach here (acc_ok gate), and
    # the clamped-cubic zoom recovers a too-small seed at >=10x/eval
    # anyway.
    prev_seed = jnp.where(
        jnp.logical_and(jnp.isfinite(alpha_h), alpha_h > 0.0), alpha_h, 1.0)
    ok = jnp.logical_and(jnp.isfinite(a_first),
                         a_first > _ALPHA_DEGENERATE)
    alpha = jnp.where(ok, jnp.clip(a_first, prev_seed / 4096.0,
                                   prev_seed * 16.0), prev_seed)
    # cold-seed bootstrap: a lane that ran and took NO step anywhere this
    # call learned that the whole probed range [seed * 10^-(ls-1), seed]
    # holds no Armijo point (the zoom shrinks >= 10x/eval) — pass the
    # floor of that range as the next seed, or a watchdog-sized budget
    # can never descend the 5-7 orders from 1/||g0|| to the Wolfe zone at
    # 131k raw-sum scales.  Warm-evidence lanes in this state stall
    # instead (stalled_out), so this only moves genuinely cold searches.
    probe_floor = float(10.0 ** -(int(max_linesearch_steps) - 1))
    cold = jnp.logical_and(~warm_evidence, ~stall_v)
    alpha = jnp.where(
        jnp.logical_and(jnp.logical_and(~ever_step, i > 0), cold),
        jnp.maximum(prev_seed * probe_floor, 1e-20), alpha)
    return LBFGSResult(params=unravel(bx), loss=bf, n_steps=i,
                       change=change, alpha=alpha, alpha_qn=aqn,
                       aux=baux if has_aux else None,
                       n_evals=nev,
                       memory=LBFGSMemory(S=S, Y=Y, rho=rho, pos=pos,
                                          count=count),
                       grad=unravel(bg), stalled=stalled_out)
