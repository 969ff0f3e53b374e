"""A/B the blocked-kernel skewed pipeline at tj=256 for the 121-col any-eta
backward (VERDICT r4 item 5).  Run from /root/repo."""
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
                     ".jax_cache"))
    import difficp_tpu.ops.pallas_ksum as PK
    from difficp_tpu.ops.pallas_reductions import make_rhs_self

    m = 131072
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(m, 2)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(m, 2)), jnp.float32) * 0.3
    mask = jnp.ones((m,), jnp.float32)
    eta_op = make_rhs_self(0.2, 1.0 / 500.0, True)

    def eloss(qq, pp):
        vq, mgq, dc = eta_op(qq, pp, mask)
        return jnp.sum(vq) + jnp.sum(mgq) + dc

    for skew_tj in (None, 256, 384):
        PK._BLOCKED_SKEW_TJ = skew_tj
        ebwd = jax.jit(lambda qq, pp: jax.grad(eloss, argnums=(0, 1))(qq, pp))
        g = ebwd(q, p)
        float(jnp.sum(g[0]))
        t0 = time.time()
        for _ in range(4):
            g = ebwd(q, p)
        float(jnp.sum(g[0]))
        dt = (time.time() - t0) / 4
        print(f"blocked skew_tj={skew_tj}: {m*m/dt/1e9:.1f} Gpair/s "
              f"({dt*1e3:.1f} ms)", flush=True)
    PK._BLOCKED_SKEW_TJ = None


if __name__ == "__main__":
    main()
