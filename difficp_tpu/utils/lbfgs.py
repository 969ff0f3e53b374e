"""Jittable / vmappable L-BFGS with strong-Wolfe line search.

Reimplements the optimization contract of the reference's torch wrapper
(reference diffICP/tools/optim.py:10-110):

- L-BFGS with strong-Wolfe line search, a bounded number of outer steps each
  consisting of ``inner`` quasi-Newton iterations (torch: max_iter=20);
- best-so-far parameter tracking across every function evaluation
  (optim.py:34-47);
- divergence guard: on NaN / aberrantly large loss the best-seen parameters
  are restored and the optimizer state is reset (optim.py:60-97);
- stop when the relative parameter change over an outer step drops below
  ``tol`` (optim.py:99-105).

Built on ``optax.lbfgs`` (pure JAX), so the whole optimization is a single
compiled ``lax.while_loop`` — and, crucially, **vmappable across frames**:
the K independent per-frame registrations of the reference's sequential
``for k in range(K)`` loop (PSR.py:528) run in lockstep on TPU with per-lane
convergence handled by the while_loop batching rule.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
import optax.tree_utils as otu


class LBFGSResult(NamedTuple):
    params: any       # best parameters found (pytree, same structure as p0)
    loss: jax.Array   # best loss value
    n_steps: jax.Array  # number of outer steps taken
    change: jax.Array   # last relative parameter change (rms)
    alpha: jax.Array = jnp.asarray(0.0)  # last accepted line-search step
    #   size; feed back as ``alpha0`` of the next call on the same problem
    #   (warm start) to skip the zoom's bracketing phase


# accepted steps below this are "no progress" artifacts (zoom shrunk to
# nothing on a converged/stuck lane), never useful warm-start seeds
_ALPHA_DEGENERATE = 1e-10


def _rms(tree):
    sq = sum(jnp.sum(a * a) for a in jax.tree.leaves(tree))
    n = sum(a.size for a in jax.tree.leaves(tree))
    return jnp.sqrt(sq / max(n, 1))


def _tree_diff_rms(a, b):
    return _rms(jax.tree.map(lambda x, y: x - y, a, b))


def _seed_core(lossfn: Callable, p0):
    """(l0, seed): one value_and_grad eval and the classical first-step
    zoom seed ~ min(1, 1/||g0||).  Non-finite entry loss or gradient falls
    back to the 1.0 sentinel.  Single implementation shared by the
    external ``seed_alpha_for`` and the internal cold path so the two can
    never diverge."""
    l0, g0 = jax.value_and_grad(lossfn)(p0)
    n = float(sum(a.size for a in jax.tree.leaves(g0)))
    g0_norm = _rms(g0) * jnp.sqrt(jnp.asarray(n, l0.dtype))
    seed = jnp.minimum(1.0, 1.0 / jnp.maximum(g0_norm, 1e-12))
    ok = jnp.logical_and(jnp.isfinite(l0), jnp.isfinite(seed))
    return l0, jnp.where(ok, seed, 1.0).astype(jnp.float32)


def seed_alpha_for(lossfn: Callable, p0) -> jax.Array:
    """Zoom line-search seed ~ min(1, 1/||g0||) for ``lossfn`` at ``p0``
    (the classical first-step heuristic; same norm convention as the
    internal cold-path seeding of ``lbfgs_optimize``).

    Computing the seed in its own small program lets every
    ``lbfgs_optimize`` call take the warm ``alpha0`` path — one compiled
    L-BFGS program per configuration instead of separate cold/warm
    variants (at scale each variant is a multi-minute remote compile,
    while this single fwd+bwd eval compiles in seconds)."""
    return _seed_core(lossfn, p0)[1]


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
) -> LBFGSResult:
    """Minimize ``lossfn(params)`` starting from pytree ``p0``.

    Semantics follow reference optim.py: up to ``nmax`` outer steps of
    ``inner`` L-BFGS iterations each; returns the best parameters seen.

    ``alpha0``: warm-start step size for the first zoom line search (use the
    ``alpha`` of a previous result on the same problem).  ``None`` or a
    non-positive value falls back to the 1/||g0|| first-step heuristic —
    callers inside jit can pass 0.0 as a dynamic "no warm start" sentinel.
    """
    opt = optax.lbfgs(
        memory_size=memory_size,
        linesearch=optax.scale_by_zoom_linesearch(
            max_linesearch_steps=max_linesearch_steps
        ),
    )
    value_and_grad = optax.value_and_grad_from_state(lossfn)

    def make_inner_step(active):
        # ``active`` is this lane's outer-loop condition re-evaluated inside
        # the body.  In unbatched execution it is always True (the body only
        # runs while the condition holds) so gating on it is a no-op.  Under
        # vmap, lax.while_loop runs the body for EVERY lane until ALL lanes
        # finish, only masking the carry — so a converged lane would keep
        # line-searching its flat landscape with its real gradient and
        # exhaust max_linesearch_steps every iteration, dragging the whole
        # batch (the zoom's trip count is the max over lanes).  Feeding done
        # lanes a ZERO gradient makes their zoom direction zero, which
        # satisfies both strong-Wolfe conditions at the first trial — done
        # lanes then cost one (batched) eval instead of the full budget, and
        # the batch runs at the pace of the ACTIVE lanes.
        def inner_step(carry, _):
            params, state, best_p, best_l = carry
            value, grad = value_and_grad(params, state=state)
            grad = jax.tree.map(
                lambda g: jnp.where(active, g, jnp.zeros_like(g)), grad
            )
            # track the pre-update point too: costs nothing (value is
            # already computed) and guarantees best_l <= entry loss even on
            # the warm path, whose best_l starts at +inf without an l0
            # seeding eval
            b0 = jnp.logical_and(value < best_l, jnp.isfinite(value))
            best_p = jax.tree.map(
                lambda c, b: jnp.where(b0, c, b), params, best_p
            )
            best_l = jnp.where(b0, value, best_l)
            updates, new_state = opt.update(
                grad, state, params, value=value, grad=grad, value_fn=lossfn
            )
            new_params = optax.apply_updates(params, updates)
            # freeze done lanes exactly (a (s=0, y=0) memory pair would put
            # 0/0 NaNs in the state and poison the lane's later zooms)
            new_params = jax.tree.map(
                lambda n, p: jnp.where(active, n, p), new_params, params
            )
            new_state = jax.tree.map(
                lambda n, s: jnp.where(active, n, s) if n.shape == s.shape
                else n,
                new_state, state,
            )
            state = new_state
            # value at the accepted line-search point
            new_value = otu.tree_get(state, "value")
            bad = jnp.logical_or(~jnp.isfinite(new_value),
                                 new_value > errthresh)
            better = jnp.logical_and(new_value < best_l, ~bad)
            best_p = jax.tree.map(
                lambda n, b: jnp.where(better, n, b), new_params, best_p
            )
            best_l = jnp.where(better, new_value, best_l)
            # on divergence, fall back to best params (state keeps going;
            # the next linesearch restarts from there)
            new_params = jax.tree.map(
                lambda n, b: jnp.where(bad, b, n), new_params, best_p
            )
            return (new_params, state, best_p, best_l), None

        return inner_step

    def outer_cond(carry):
        i, params, state, best_p, best_l, change, ref = carry
        keep = jnp.logical_and(i < nmax, change > tol * jnp.maximum(ref, 1e-30))
        return jnp.logical_or(i == 0, keep)

    state0 = opt.init(p0)

    def outer_body(carry):
        i, params, state, best_p, best_l, change, ref, key = carry
        active = outer_cond((i, params, state, best_p, best_l, change, ref))
        prev = params
        (params, state, best_p, best_l), _ = jax.lax.scan(
            make_inner_step(active),
            (params, state, best_p, best_l), None, length=inner,
        )
        # divergence recovery (reference optim.py:60-97): if the block ends
        # on a non-finite/aberrant loss, restart from the best-seen params
        # with a 1%-relative random perturbation and a FRESH optimizer state
        cur = otu.tree_get(state, "value")
        diverged = jnp.logical_or(~jnp.isfinite(cur), cur > errthresh)
        key, sub = jax.random.split(key)
        rmod = 0.01

        def perturbed(b, k):
            noise = jax.random.normal(k, b.shape, b.dtype)
            return b + rmod * jnp.std(b) * noise

        leaves, treedef = jax.tree.flatten(best_p)
        subkeys = list(jax.random.split(sub, len(leaves)))
        pert = jax.tree.unflatten(
            treedef, [perturbed(b, k) for b, k in zip(leaves, subkeys)]
        )
        params = jax.tree.map(
            lambda n, pt: jnp.where(diverged, pt, n), params, pert
        )
        state = jax.tree.map(
            lambda s, s0: jnp.where(diverged, s0, s) if s.shape == s0.shape else s,
            state, state0,
        )
        change = _tree_diff_rms(params, prev)
        ref = _rms(prev)
        return (i + 1, params, state, best_p, best_l, change, ref, key)

    # Seed the first line search at ~1/||g0|| (classical first-step
    # heuristic).  The objective is a raw sum over points (reference
    # convention), so the first gradient can be huge; starting the zoom at
    # step 1.0 would burn its whole evaluation budget shrinking.  Subsequent
    # steps reuse the previously accepted step ('keep' strategy), and a
    # positive ``alpha0`` warm start skips the seeding eval entirely (the
    # loss+grad here costs a full fwd+bwd shoot at scale).
    def _seed(_):
        l0, a = _seed_core(lossfn, p0)
        l0 = jnp.where(jnp.isfinite(l0), l0, jnp.inf).astype(jnp.float32)
        return l0, a

    if alpha0 is not None:
        # warm path (STATIC): no seeding eval at all — the zoom recovers on
        # its own from a 1.0 start in the rare cold-sentinel (0.0) case
        # (e.g. iteration 0 of a fused loop), and best-so-far tracking
        # starts from the first accepted iterate.  Degenerate seeds (a
        # collapsed step from a converged lane) also fall back to 1.0: the
        # zoom can only move a factor ~2 per eval, so growing back from
        # ~1e-17 would burn the whole line-search budget every iteration.
        a0v = jnp.asarray(alpha0, jnp.float32)
        l0 = jnp.asarray(jnp.inf, jnp.float32)
        alpha_h = jnp.where(
            jnp.logical_and(a0v > _ALPHA_DEGENERATE, jnp.isfinite(a0v)),
            a0v, 1.0,
        )
    else:
        l0, alpha_h = _seed(None)
    state0 = otu.tree_set(state0, learning_rate=alpha_h.astype(jnp.float32))
    carry = (
        jnp.asarray(0),
        p0,
        state0,
        p0,
        l0,
        jnp.asarray(jnp.inf, dtype=jnp.float32),
        jnp.asarray(1.0, dtype=jnp.float32),
        jax.random.PRNGKey(0),
    )
    i, params, state, best_p, best_l, change, ref, _ = jax.lax.while_loop(
        lambda c: outer_cond(c[:7]), outer_body, carry
    )
    # Warm-start value for the next call: the accepted step, confined to a
    # 16x trust window around the seed this call STARTED from (warm value,
    # 1/||g0|| heuristic, or the 1.0 sentinel).  Rationale: a converged or
    # stuck lane accepts ~0-length steps, and seeding the next zoom there
    # poisons it (the zoom only grows ~2x per eval, so recovering from
    # 1e-9 burns the whole line-search budget every subsequent iteration —
    # and vmapped lanes run at the slowest lane's pace).  A plain relative
    # floor still ratchets down across chained calls; the window caps the
    # drift at 16x per call in either direction, a <=4-eval recovery if the
    # landscape scale genuinely moved further than that.
    raw = jnp.asarray(otu.tree_get(state, "learning_rate"), jnp.float32)
    prev = jnp.where(
        jnp.logical_and(jnp.isfinite(alpha_h), alpha_h > 0.0), alpha_h, 1.0
    )
    # Collapsed = the zoom spent ~its whole shrink budget (raw fell below
    # prev * 2^-(budget-1); bisection moves a factor <=2 per eval), i.e. a
    # failed search on a converged/flat lane — keep prev, since clamping a
    # collapse into the window would still ratchet 16x per call toward the
    # poison.  A GENUINE smaller step (above that floor) pulls the anchor
    # down, clipped to the window, so a bad anchor (e.g. a 1.0 sentinel
    # over a 1e-3-scale problem) adapts out within a few calls instead of
    # pinning forever.
    shrink_floor = prev * (2.0 ** -(max_linesearch_steps - 1))
    ok = jnp.logical_and(
        jnp.isfinite(raw),
        raw > jnp.maximum(shrink_floor, _ALPHA_DEGENERATE),
    )
    alpha = jnp.where(
        ok, jnp.clip(raw, prev / 16.0, prev * 16.0), prev
    )
    return LBFGSResult(params=best_p, loss=best_l, n_steps=i, change=change,
                       alpha=alpha)
