"""Deformation-grid visualization: build 2D grid lines and warp them through
a registration to display the diffeomorphism.

Re-design of reference diffICP/visualization/grid.py:11-92 (Gridlines:
register/shoot/plot, incl. velocity quiver at grid intersections).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class Gridlines:
    """Rectangular grid of polylines (reference grid.py:11-30)."""

    def __init__(self, xticks, yticks, points_per_line: int = 100):
        self.xticks = np.asarray(xticks)
        self.yticks = np.asarray(yticks)
        self.points_per_line = points_per_line
        self.lines = []
        if len(self.xticks) and len(self.yticks):
            for x in self.xticks:
                ys = np.linspace(self.yticks.min(), self.yticks.max(),
                                 points_per_line)
                self.lines.append(np.stack([np.full_like(ys, x), ys], axis=1))
            for y in self.yticks:
                xs = np.linspace(self.xticks.min(), self.xticks.max(),
                                 points_per_line)
                self.lines.append(np.stack([xs, np.full_like(xs, y)], axis=1))

    def get_points(self) -> np.ndarray:
        return np.concatenate(self.lines, axis=0).astype(np.float32)

    @classmethod
    def from_points(cls, points: np.ndarray, points_per_line: int):
        gl = cls([], [], points_per_line)
        gl.lines = np.split(points, points.shape[0] // points_per_line, axis=0)
        return gl

    def plot(self, **kwargs):
        import matplotlib.pyplot as plt

        for line in self.lines:
            plt.plot(line[:, 0], line[:, 1], **kwargs)

    def register(self, registration, backward: bool = False) -> "Gridlines":
        """Warp the grid through a Registration handle (grid.py:55-68)."""
        pts = jnp.asarray(self.get_points())
        out = registration.backward(pts) if backward else registration.apply(pts)
        return Gridlines.from_points(np.asarray(out), self.points_per_line)

    def shoot(self, registration, require_v: bool = False,
              backward: bool = False):
        """Warp the grid at every integration time (grid.py:71-92).

        :return: list of Gridlines (one per time step); with require_v also
            (intersection trajectories, velocity fields at intersections).
        """
        pts = jnp.asarray(self.get_points())
        _, traj = registration.shoot(pts, backward=backward, save_traj=True)
        grids = [
            Gridlines.from_points(np.asarray(traj.x[t]), self.points_per_line)
            for t in range(traj.x.shape[0])
        ]
        if not require_v:
            return grids
        inter = np.stack(np.meshgrid(self.xticks, self.yticks), axis=2)
        inter = jnp.asarray(inter.reshape(-1, 2), jnp.float32)
        _, itraj = registration.shoot(inter, backward=backward, save_traj=True)
        from difficp_tpu.models import lddmm as lddmm_mod

        speeds = [
            np.asarray(
                lddmm_mod.v(
                    registration.cfg, itraj.x[t], itraj.q[t], itraj.p[t],
                    registration.qmask,
                )
            )
            for t in range(itraj.x.shape[0])
        ]
        inters = [np.asarray(itraj.x[t]) for t in range(itraj.x.shape[0])]
        return grids, inters, speeds
