"""Registration handles: apply / backward / shoot on external point sets.

Re-design of reference diffICP/core/registrations.py:21-123.  A handle wraps
frozen registration parameters; ``apply`` warps external points forward,
``backward`` inverts (LDDMM: shoot from the arrival state with negated
momenta, registrations.py:66-69; affine: linear solve).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax

from difficp_tpu.models import affine as affine_mod
from difficp_tpu.models import lddmm as lddmm_mod


class LDDMMRegistration(NamedTuple):
    cfg: lddmm_mod.LDDMMConfig
    q0: jax.Array
    a0: jax.Array
    qmask: Optional[jax.Array] = None

    def shoot(self, x=None, backward: bool = False, save_traj: bool = True):
        """Geodesic shoot advecting external points x (registrations.py:56-69)."""
        if not backward:
            return lddmm_mod.shoot(
                self.cfg, self.q0, self.a0, x, self.qmask, save_traj=save_traj
            )
        fwd, _ = lddmm_mod.shoot(self.cfg, self.q0, self.a0, None, self.qmask)
        return lddmm_mod.shoot(
            self.cfg, fwd.q, -fwd.p, x, self.qmask, save_traj=save_traj
        )

    def apply(self, x):
        final, _ = self.shoot(x, save_traj=False)
        return final.x

    def backward(self, y):
        final, _ = self.shoot(y, backward=True, save_traj=False)
        return final.x


class AffineRegistration(NamedTuple):
    cfg: affine_mod.AffineConfig
    m: jax.Array
    t: jax.Array

    def apply(self, x):
        return affine_mod.apply(self.m, self.t, x)

    def backward(self, y):
        return affine_mod.backward(self.m, self.t, y)

    def shoot(self, x):
        """Interpolated trajectory (host-side; visualization)."""
        return affine_mod.shoot(self.cfg, self.m, self.t, x)
