"""Sweep (t, skew, mb) for the d=3 symmetric-pair backward at M=131k
(VERDICT r4 item 2: 123 -> >=160 Gpair/s).  Run from /root/repo."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"),
    )
    import difficp_tpu.ops.pallas_reductions as pr

    m, d, sig = 131072, 3, 0.2
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(0, 1, size=(m, d)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(m, d)) * 0.3, jnp.float32)
    mask = jnp.ones((m,), jnp.float32)
    gv = jnp.asarray(rng.normal(size=(m, d)), jnp.float32)
    gg = jnp.asarray(rng.normal(size=(m, d)), jnp.float32)
    gc = jnp.asarray(0.7, jnp.float32)

    for t, skew, mb in [(256, True, 32768), (256, False, 32768),
                        (512, False, 32768), (512, True, 32768),
                        (256, True, 16384), (384, False, 32768)]:
        fj = jax.jit(lambda q_, p_, gv_, gg_: pr._rhs_self_bwd_sym_mm(
            q_ - pr._mm_center(q_, mask), p_, mask, gv_, -gg_, gc, sig,
            t=t, mb=mb, skew=skew))
        try:
            dq, dp = fj(q, p, gv, gg)
            float(jnp.sum(dq))
            t0 = time.time()
            for _ in range(4):
                dq, dp = fj(q, p, gv, gg)
            float(jnp.sum(dq))
            dt = (time.time() - t0) / 4
            print(f"t={t} skew={skew} mb={mb}: {m*m/dt/1e9:.1f} Gpair/s "
                  f"({dt*1e3:.1f} ms)", flush=True)
        except Exception as e:
            print(f"t={t} skew={skew} mb={mb}: FAILED {type(e).__name__} "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
