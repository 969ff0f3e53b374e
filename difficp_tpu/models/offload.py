"""Host-offload atlas driver: datasets larger than device HBM.

The TPU analog of the reference's compspec/dataspec split
(/root/reference/diffICP/core/PSR.py:46-63: store on CPU, compute on GPU),
at MultiPSR generality: S structures per frame (each with its own GMM,
PSR.py:104-112) and every DiffPSR support scheme (dense / grid / decim /
custom, PSR.py:430-493).  Per-frame arrays (x0, q0, a0, x1, y, masks) live
in HOST RAM as numpy; every phase streams fixed-size frame chunks through
compiled device programs, so device memory is O(chunk) regardless of the
dataset size.

This works because both phases decompose over frames:

- **EM** (per structure): the M step is a sum of per-point sufficient
  statistics (``gmm.MStats``) — accumulate them chunk-by-chunk with the OLD
  parameters, apply the update once, then a second streamed pass emits the
  quadratic targets / energy terms with the NEW parameters (exactly the
  two-pass discipline of ``gmm._em_step_tiled``, with host RAM as the
  outer tier).
- **Registration**: per-frame independent; each chunk runs the vmapped
  lockstep L-BFGS (``psr._reg_opt_lddmm``) and only (a0, x1) travel back.

The frame axis is padded to a chunk multiple (empty frames are fully
masked) so every chunk reuses ONE compiled program.  Free energy follows
the same bookkeeping as ``MultiPSR.update_FE`` and is asserted monotone by
tests (the repo-wide oracle).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from difficp_tpu.models import gmm as gmm_mod
from difficp_tpu.models import lddmm as lddmm_mod
from difficp_tpu.models.psr import _reg_opt_lddmm, _v2p_all, _v_all
from difficp_tpu.utils.io import pad_frames, pad_structures
from difficp_tpu.utils.point_sets import decimate, grid_support


@partial(jax.jit, static_argnames=("cfg",))
def _stats_chunk(state, x, mask, cfg):
    """MStats of one flattened chunk (old parameters)."""
    e = gmm_mod._e_step(state, x, mask, cfg)
    return gmm_mod._m_stats(e, x, mask)


@partial(jax.jit, static_argnames=("cfg",))
def _values_chunk(new, old, x, mask, cfg):
    """Post-M-step EM values of one flattened chunk: targets y, local
    cfe/quad sums, inlier weights gammaT."""
    e = gmm_mod._e_step(old, x, mask, cfg)
    y, cfe_l, quad_l = gmm_mod._em_values(new, old, e, x, mask, cfg)
    return y, cfe_l, quad_l, e.gamt


class HostOffloadAtlas:
    """Diffeomorphic atlas over host-resident frames (any number of
    structures, any support scheme); drop-in for ``DiffPSR`` when K x N
    exceeds HBM."""

    def __init__(self, x, gmm_states, gmm_cfgs,
                 lddmm_cfg: lddmm_mod.LDDMMConfig, chunk_frames: int = 8):
        structs = pad_structures(x)
        self.S = len(structs)
        k = structs[0].k
        d = structs[0].x.shape[2]
        self.chunk = int(chunk_frames)
        kpad = -(-k // self.chunk) * self.chunk
        self.K, self.Kpad, self.D = k, kpad, d

        # static slices of each structure inside the concatenated frame view
        self.slices = []
        off = 0
        for pf in structs:
            self.slices.append((off, off + pf.nmax))
            off += pf.nmax
        self.Ntot = off
        self.struct_n = [np.asarray(pf.n) for pf in structs]

        def host_concat(parts):
            out = np.zeros((kpad,) + parts.shape[1:], np.float32)
            out[:k] = parts
            out[k:] = parts[0]  # masked filler frames
            return out

        x_cat = np.concatenate([np.asarray(pf.x) for pf in structs], axis=1)
        m_cat = np.concatenate([np.asarray(pf.mask) for pf in structs],
                               axis=1)
        # host-resident numpy (the dataspec tier)
        self.x0 = host_concat(x_cat)
        self.mask = np.zeros((kpad, self.Ntot), np.float32)
        self.mask[:k] = m_cat
        self.x1 = self.x0.copy()
        self.y = self.x0.copy()
        self.ptw = np.ones((kpad, self.Ntot), np.float32)

        # support = all data points until set_support_scheme (PSR.py:394-397)
        self.support_scheme = None
        self.q0 = self.x0.copy()
        self.qmask = self.mask.copy()
        self.a0 = np.zeros_like(self.q0)

        # small replicated state stays on device (the compspec tier)
        if isinstance(gmm_states, gmm_mod.GMMState):
            gmm_states = [gmm_states] * self.S
            gmm_cfgs = [gmm_cfgs] * self.S
        if len(gmm_states) != self.S:
            raise ValueError("need one GMM per structure")
        self.gmm = [gmm_mod.GMMState(*map(jnp.asarray, st))
                    for st in gmm_states]
        self.gcfg = list(gmm_cfgs)
        self.lcfg = lddmm_cfg
        self.cfe = [0.0] * self.S
        self.quadloss = 0.0
        self.regloss = 0.0
        self.FE = None
        self.fe_increase_events = 0
        self.printstuff = False
        self._alpha = np.zeros((kpad,), np.float32)  # per-frame warm starts
        self._init_a0()

    def _chunks(self):
        for c0 in range(0, self.Kpad, self.chunk):
            yield slice(c0, c0 + self.chunk)

    # ------------------------------------------------------------- support

    def _init_a0(self, rcond=1e-3):
        """Zero-initial-speed momenta (PSR.py:406-413): exactly zero for
        eta == 0; a chunked RKHS solve per frame otherwise."""
        if self.lcfg.eta == 0.0:
            self.a0[:] = 0.0
            return
        for sl in self._chunks():
            q0 = jnp.asarray(self.q0[sl])
            a0 = _v2p_all(self.lcfg, q0, jnp.zeros_like(q0),
                          jnp.asarray(self.qmask[sl]), rcond)
            self.a0[sl] = np.asarray(a0)

    def set_support_scheme(self, scheme="grid", rho=1.0, q0=None,
                           rcond=1e-1):
        """Choose the LDDMM support (PSR.py:430-493) without ever holding
        more than one frame chunk on device: 'grid' (one shared grid over
        the host data's bounding box), 'decim' (per-frame greedy cover,
        host-side numpy), or 'custom' points."""
        r_cover = rho * self.lcfg.sigma
        q0_prev, qmask_prev, a0_prev = self.q0, self.qmask, self.a0

        if scheme == "grid":
            pts = grid_support(self.x0[:self.K].reshape(-1, self.D), r_cover)
            self.q0 = np.broadcast_to(
                pts[None].astype(np.float32), (self.Kpad,) + pts.shape
            ).copy()
            self.qmask = np.ones((self.Kpad, pts.shape[0]), np.float32)
        elif scheme == "decim":
            per_frame = []
            for kk in range(self.K):
                pts = []
                for s, (lo, hi) in enumerate(self.slices):
                    xs = self.x0[kk, lo:hi][: int(self.struct_n[s][kk])]
                    kept, _ = decimate(xs, r_cover)
                    pts.append(xs[kept])
                per_frame.append(np.concatenate(pts, axis=0))
            per_frame += [per_frame[0]] * (self.Kpad - self.K)
            padded = pad_frames(per_frame)
            self.q0 = np.array(padded.x)
            self.qmask = np.array(padded.mask)
            self.qmask[self.K:] = 0.0
        elif scheme == "custom":
            assert q0 is not None
            q0 = np.asarray(q0, np.float32)
            self.q0 = np.broadcast_to(q0[None],
                                      (self.Kpad,) + q0.shape).copy()
            self.qmask = np.ones((self.Kpad, q0.shape[0]), np.float32)
        else:
            raise ValueError(f"Unknown support scheme: {scheme}")
        self.support_scheme = scheme

        # project the previous vector field onto the new support, chunked
        # (PSR.py:415-425); for eta == 0 with zero momenta this is zeros
        self.a0 = np.zeros_like(self.q0)
        if np.abs(a0_prev).max() > 0.0:
            for sl in self._chunks():
                v_new = _v_all(
                    self.lcfg, jnp.asarray(self.q0[sl]),
                    jnp.asarray(q0_prev[sl]), jnp.asarray(a0_prev[sl]),
                    jnp.asarray(qmask_prev[sl]),
                )
                a0 = _v2p_all(self.lcfg, jnp.asarray(self.q0[sl]), v_new,
                              jnp.asarray(self.qmask[sl]), rcond)
                self.a0[sl] = np.asarray(a0)
        self._alpha[:] = 0.0  # new optimization landscape: cold seeds

    # ------------------------------------------------------------------ EM

    def _em_sweep(self, skip_m=False):
        """One streamed EM iteration over all host frames, per structure."""
        d = self.D
        quad = 0.0
        for s, (lo, hi) in enumerate(self.slices):
            if not skip_m:
                stats = None
                for sl in self._chunks():
                    xc = jnp.asarray(self.x1[sl, lo:hi].reshape(-1, d))
                    mc = jnp.asarray(self.mask[sl, lo:hi].reshape(-1))
                    st = _stats_chunk(self.gmm[s], xc, mc, self.gcfg[s])
                    stats = st if stats is None else jax.tree.map(
                        jnp.add, stats, st)
                new = gmm_mod._apply_stats(self.gmm[s], stats, self.gcfg[s],
                                           d)
            else:
                new = self.gmm[s]
            cfe_s = 0.0
            nmax_s = hi - lo
            for sl in self._chunks():
                xc = jnp.asarray(self.x1[sl, lo:hi].reshape(-1, d))
                mc = jnp.asarray(self.mask[sl, lo:hi].reshape(-1))
                y, cfe_l, quad_l, gamt = _values_chunk(new, self.gmm[s], xc,
                                                       mc, self.gcfg[s])
                self.y[sl, lo:hi] = np.asarray(y).reshape(-1, nmax_s, d)
                self.ptw[sl, lo:hi] = np.asarray(gamt).reshape(-1, nmax_s)
                cfe_s += float(cfe_l)
                quad += float(quad_l)
            self.gmm[s] = new
            self.cfe[s] = cfe_s
        self.quadloss = quad
        return sum(self.cfe) + quad + self.regloss

    def GMM_opt(self, max_iterations: int = 25, tol: float = 1e-3):
        last = None
        n_done = 0
        for _ in range(max_iterations):
            fe = self._em_sweep()
            n_done += 1
            if last is not None and abs(fe - last) < tol * abs(last):
                break
            last = fe
        self._update_fe(f"GMM offload sweep x{n_done}")

    # ---------------------------------------------------------------- Reg

    def _sig2_chunk(self, nframes):
        segs = [
            np.full((nframes, hi - lo), float(self.gmm[s].sigma) ** 2,
                    np.float32)
            for s, (lo, hi) in enumerate(self.slices)
        ]
        return jnp.asarray(np.concatenate(segs, axis=1))

    def Reg_opt(self, tol: float = 1e-3, nmax: int = 10, inner: int = 20,
                ls_steps: int = 25):
        use_ext = self.support_scheme is not None
        regl = 0.0
        quad = 0.0
        for sl in self._chunks():
            q0 = jnp.asarray(self.q0[sl])
            a0 = jnp.asarray(self.a0[sl])
            x0 = jnp.asarray(self.x0[sl])
            y = jnp.asarray(self.y[sl])
            qmk = jnp.asarray(self.qmask[sl])
            xmk = jnp.asarray(self.mask[sl])
            w = jnp.asarray(self.ptw[sl])
            s2 = self._sig2_chunk(q0.shape[0])
            # zero entries are the cold sentinel: lbfgs_optimize seeds
            # them at ~1/||g0|| for free from its entry evaluation
            al0 = jnp.asarray(self._alpha[sl])
            (a0n, x1, trajl, datal, _, _, _, alpha, _, _, _, _,
             _) = _reg_opt_lddmm(
                self.lcfg, q0, a0, x0, y, s2, qmk, xmk, w,
                nmax=nmax, tol=tol, use_ext=use_ext, coverage_check=False,
                inner=inner, ls_steps=ls_steps, alpha0=al0,
            )
            self.a0[sl] = np.asarray(a0n)
            self.x1[sl] = np.asarray(x1)
            self._alpha[sl] = np.asarray(alpha)
            regl += float(jnp.sum(trajl))
            quad += float(jnp.sum(datal))
        self.regloss = regl
        self.quadloss = quad
        self._update_fe("Reg offload pass")

    # ------------------------------------------------------------- driver

    def _update_fe(self, message=None):
        fe = sum(self.cfe) + self.quadloss + self.regloss
        if self.FE is not None and fe > self.FE + 1e-4 * abs(self.FE):
            self.fe_increase_events += 1
            if self.printstuff:
                print("WARNING: measured increase in free energy !")
        self.FE = fe
        if self.printstuff and message:
            print(f"{message:<50s} FE = {fe:.2f}")

    def run(self, n_iters: int, max_em: int = 25, em_tol: float = 1e-3,
            reg_nmax: int = 10, reg_tol: float = 1e-3, reg_inner: int = 20,
            reg_ls: int = 25):
        fes = []
        for _ in range(n_iters):
            self.GMM_opt(max_iterations=max_em, tol=em_tol)
            self.Reg_opt(tol=reg_tol, nmax=reg_nmax, inner=reg_inner,
                         ls_steps=reg_ls)
            fes.append(self.FE)
        return np.asarray(fes)
