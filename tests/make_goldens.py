"""Generate golden values by running the torch reference implementation.

Run once (CPU, torch backend):  python tests/make_goldens.py
Outputs .npz files under tests/goldens/ which are committed to the repo; the
test suite only reads the .npz files (no torch needed at test time).

The reference is treated strictly as an *oracle*: we call its public entry
points on seeded data and record inputs/outputs.
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference")

# The reference unconditionally imports pykeops inside tools/point_sets.py;
# pykeops is absent in this image (so the reference runs its torch backend).
# Replace that single module with torch-backed equivalents of the three
# helpers it exports, so the rest of the reference imports cleanly.
import types


def _make_point_sets_stub():
    import torch as _torch

    mod = types.ModuleType("diffICP.tools.point_sets")

    def intrinsic_scale(x):
        d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        nn = _torch.topk(d2, 2, dim=1, largest=False).values[:, 1]
        return float(nn.mean().sqrt())

    def decimate(x, r):
        d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        m = (d2 <= r**2).numpy()
        n = x.shape[0]
        notcovered = list(range(n))
        kept = []
        while notcovered:
            sub = m[np.ix_(notcovered, notcovered)]
            i = int(sub.sum(axis=0).argmax())
            gid = notcovered[i]
            kept.append(gid)
            neigh = set(np.nonzero(m[gid])[0].tolist())
            notcovered = [j for j in notcovered if j not in neigh]
        rejected = [i for i in range(n) if i not in kept]
        return kept, rejected

    def point_set_distance(*a, **k):
        raise NotImplementedError("not needed for goldens")

    mod.intrinsic_scale = intrinsic_scale
    mod.decimate = decimate
    mod.point_set_distance = point_set_distance
    return mod


sys.modules["diffICP.tools.point_sets"] = _make_point_sets_stub()

import matplotlib
matplotlib.use("Agg")

import torch

torch.set_default_dtype(torch.float32)

OUT = os.path.join(os.path.dirname(__file__), "goldens")
os.makedirs(OUT, exist_ok=True)


def t2n(x):
    if isinstance(x, torch.Tensor):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def golden_gmm():
    from diffICP.core.GMM import GaussianMixtureUnif

    rng = np.random.default_rng(42)
    n, c, d = 200, 7, 2
    x = rng.normal(size=(n, d)).astype(np.float32) * 0.5
    mu0 = rng.normal(size=(c, d)).astype(np.float32) * 0.5
    w0 = rng.normal(size=(c,)).astype(np.float32) * 0.3
    sigma0 = 0.35

    results = {"x": x, "mu0": mu0, "w0": w0, "sigma0": sigma0}

    for use_out in (False, True):
        tag = "out" if use_out else "noout"
        gmm = GaussianMixtureUnif(
            torch.tensor(mu0), sigma=sigma0, use_outliers=use_out,
            computversion="torch",
        )
        gmm.w = torch.tensor(w0)
        if use_out:
            gmm.outliers["eta0"] = -1.0
            gmm.set_vol0(torch.tensor(x))
            results[f"{tag}_vol0"] = gmm.outliers["vol0"]

        # values-only step (skip_M): exact Cfe/FE semantics, no staleness
        y, cfe, fe = gmm.EM_step(torch.tensor(x), skip_M=True)
        results[f"{tag}_skipM_Y"] = t2n(y)
        results[f"{tag}_skipM_Cfe"] = t2n(cfe)
        results[f"{tag}_skipM_FE"] = t2n(fe)

        # full M step parameter updates
        y, cfe, fe = gmm.EM_step(torch.tensor(x), skip_M=False)
        results[f"{tag}_M_mu"] = t2n(gmm.mu)
        results[f"{tag}_M_w"] = t2n(gmm.w)
        results[f"{tag}_M_sigma"] = np.float32(gmm.sigma)
        if use_out:
            results[f"{tag}_M_eta0"] = np.float32(gmm.outliers["eta0"])
        results[f"{tag}_M_Y"] = t2n(y)

        # 20 EM iterations: record FE sequence (monotonicity + convergence)
        gmm2 = GaussianMixtureUnif(
            torch.tensor(mu0), sigma=sigma0, use_outliers=use_out,
            computversion="torch",
        )
        gmm2.w = torch.tensor(w0)
        if use_out:
            gmm2.outliers["eta0"] = -1.0
            gmm2.set_vol0(torch.tensor(x))
        fes = []
        for _ in range(20):
            _, _, fe = gmm2.EM_step(torch.tensor(x))
            fes.append(float(fe))
        results[f"{tag}_FE_seq"] = np.asarray(fes, np.float32)
        results[f"{tag}_final_mu"] = t2n(gmm2.mu)
        results[f"{tag}_final_sigma"] = np.float32(gmm2.sigma)

    np.savez(os.path.join(OUT, "gmm.npz"), **results)
    print("gmm.npz written")


def golden_lddmm():
    from diffICP.core.LDDMM import LDDMMModel

    rng = np.random.default_rng(7)
    m, nx, d = 30, 50, 2
    q0 = rng.normal(size=(m, d)).astype(np.float32) * 0.5
    p0 = rng.normal(size=(m, d)).astype(np.float32) * 0.3
    x0 = rng.normal(size=(nx, d)).astype(np.float32) * 0.5
    results = {"q0": q0, "p0": p0, "x0": x0}

    for version in ("classic", "logdet", "hybrid"):
        for scheme in ("Euler", "Ralston"):
            lm = LDDMMModel(
                sigma=0.4, D=d, lambd=3.0, version=version,
                computversion="torch", scheme=scheme, nt=10,
            )
            tag = f"{version}_{scheme}"
            results[f"{tag}_H"] = t2n(lm.Hamiltonian(torch.tensor(q0), torch.tensor(p0)))
            shoot = lm.Shoot(torch.tensor(q0), torch.tensor(p0))
            results[f"{tag}_q1"] = t2n(shoot[-1][0])
            results[f"{tag}_p1"] = t2n(shoot[-1][1])
            results[f"{tag}_cost1"] = t2n(shoot[-1][2])
            results[f"{tag}_trajloss"] = t2n(lm.trajloss(shoot))
            shoot_x = lm.Shoot(torch.tensor(q0), torch.tensor(p0), torch.tensor(x0))
            results[f"{tag}_x1"] = t2n(shoot_x[-1][3])
            results[f"{tag}_costx1"] = t2n(shoot_x[-1][2])
            results[f"{tag}_trajloss_x"] = t2n(lm.trajloss(shoot_x))

    # v2p golden (pinv with rcond)
    lm = LDDMMModel(sigma=0.4, D=d, lambd=3.0, version="classic",
                    computversion="torch", nt=10)
    v = rng.normal(size=(m, d)).astype(np.float32) * 0.2
    p = lm.v2p(torch.tensor(q0), torch.tensor(v), rcond=1e-3)
    results["v2p_v"] = v
    results["v2p_p"] = t2n(p)

    np.savez(os.path.join(OUT, "lddmm.npz"), **results)
    print("lddmm.npz written")


def golden_affine():
    from diffICP.core.affine import AffineModel

    rng = np.random.default_rng(11)
    n, d = 80, 2
    x = rng.normal(size=(n, d)).astype(np.float32)
    # a rotated/scaled/translated + noisy copy
    th = 0.4
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)
    y = x @ (1.3 * rot).T + np.array([0.5, -0.2], np.float32) + 0.05 * rng.normal(
        size=(n, d)
    ).astype(np.float32)
    z = (0.5 + rng.uniform(size=(n,))).astype(np.float32)
    w = (0.5 + rng.uniform(size=(n,))).astype(np.float32)
    results = {"x": x, "y": y, "z": z, "w": w}

    for version in ("rigid", "similarity", "general_affine", "translation"):
        for withlogdet in (False, True):
            am = AffineModel(d, version=version, withlogdet=withlogdet, with_t=True)
            mm, tt, tx, datal, regl = am.Optimize(
                torch.tensor(x), torch.tensor(y), torch.tensor(z), torch.tensor(w)
            )
            tag = f"{version}_{'ld' if withlogdet else 'nold'}"
            results[f"{tag}_M"] = t2n(mm)
            results[f"{tag}_t"] = t2n(tt)
            results[f"{tag}_datal"] = np.float32(datal)
            results[f"{tag}_regl"] = np.float32(regl)

    # Shoot golden (rigid)
    am = AffineModel(d, version="rigid", withlogdet=True, with_t=True, nt=5)
    mm, tt, *_ = am.Optimize(torch.tensor(x), torch.tensor(y), torch.tensor(z))
    shoot = am.Shoot(mm, tt, torch.tensor(x[:10]))
    results["shoot_M"] = t2n(mm)
    results["shoot_t"] = t2n(tt)
    results["shoot_traj"] = np.stack([t2n(s[0]) for s in shoot])
    np.savez(os.path.join(OUT, "affine.npz"), **results)
    print("affine.npz written")


def golden_spiral():
    """Seeded spiral point sets + a reference diffICP_basic-style run."""
    from diffICP.examples.generate_spiral_point_sets import generate_spiral_point_sets

    torch.random.manual_seed(1234)
    x0, gmm_g, lm_g = generate_spiral_point_sets(
        K=10, Nkbounds=(100, 121), sigma_GMM=0.025, sigma_LDDMM=0.1,
        lambda_LDDMM=100.0,
    )
    results = {
        "mu0": t2n(gmm_g.mu),
        "sigma_gmm": np.float32(gmm_g.sigma),
    }
    for k, xk in enumerate(x0):
        results[f"x{k}"] = t2n(xk)
    np.savez(os.path.join(OUT, "spiral.npz"), **results)
    print("spiral.npz written")


def golden_basic():
    """Reference diffICP_basic equivalent: 1 set -> fixed spiral GMM.

    Records the final free energy / sigma / residuals after 20 alternations
    (examples/diffICP_basic.py:74-119 config) — the e2e golden.
    """
    from diffICP.core.LDDMM import LDDMMModel
    from diffICP.core.PSR import DiffPSR
    from diffICP.core.GMM import GaussianMixtureUnif
    from diffICP.tools.kernel import GaussKernel

    # The reference's torch fallback of check_coverage compares a
    # torch.return_types.min against a float (kernel.py:328, marked "not
    # tested"); patch with the fixed expression for the golden run.
    def _check_coverage(self, X, Y, Rthreshold):
        return ((X[:, None, :] - Y[None, :, :]) ** 2).sum(-1).min(dim=1).values > (
            Rthreshold * self.sigma
        ) ** 2

    GaussKernel.check_coverage = _check_coverage

    spiral = np.load(os.path.join(OUT, "spiral.npz"))
    x0 = torch.tensor(spiral["x0"])
    gmm = GaussianMixtureUnif(torch.tensor(spiral["mu0"]), computversion="torch")
    gmm.sigma = 0.1
    gmm.to_optimize = {"mu": False, "sigma": True, "w": False, "eta0": False}

    lm = LDDMMModel(sigma=0.2, D=2, lambd=5e2, version="classic",
                    computversion="torch", scheme="Euler", nt=10)
    psr = DiffPSR(x0, gmm, lm)
    psr.set_support_scheme("grid", rho=np.sqrt(2.0))
    psr.printstuff = False
    fes = []
    for it in range(20):
        psr.GMM_opt()
        psr.Reg_opt(tol=1e-5)
        fes.append(psr.FE)
    res = {
        "FE_seq": np.asarray(fes, np.float64),
        "final_sigma": np.float32(psr.GMMi[0].sigma),
        "final_x1": t2n(psr.x1[0, 0]),
        "regloss": np.float32(psr.regloss[0]),
        "quadloss": np.float32(psr.quadloss.sum()),
    }
    np.savez(os.path.join(OUT, "basic_run.npz"), **res)
    print("basic_run.npz written, final FE:", fes[-1])


def golden_multi():
    """Reference diffICP_multi equivalent: K=10 spirals, C=20 GMM inferred,
    LDDMM hybrid, lambda=5e2, sigma=0.2 (examples/diffICP_multi.py:58-99).
    Records final FE and GMM parameters — the atlas e2e golden."""
    from diffICP.core.LDDMM import LDDMMModel
    from diffICP.core.PSR import DiffPSR
    from diffICP.core.GMM import GaussianMixtureUnif
    from diffICP.tools.kernel import GaussKernel

    def _check_coverage(self, X, Y, Rthreshold):
        return ((X[:, None, :] - Y[None, :, :]) ** 2).sum(-1).min(dim=1).values > (
            Rthreshold * self.sigma
        ) ** 2

    GaussKernel.check_coverage = _check_coverage

    spiral = np.load(os.path.join(OUT, "spiral.npz"))
    x0 = [torch.tensor(spiral[f"x{k}"]) for k in range(10)]

    # GMM with C=20 components initialized from point set 0 (ICP_atlas
    # 'init from set' mode), weights optimized, sigma optimized
    torch.random.manual_seed(0)
    C = 20
    mu_init = x0[0][torch.randint(0, x0[0].shape[0], (C,)), :]
    gmm = GaussianMixtureUnif(mu_init, computversion="torch")
    gmm.to_optimize = {"mu": True, "sigma": True, "w": True, "eta0": False}

    lm = LDDMMModel(sigma=0.2, D=2, lambd=5e2, version="hybrid",
                    computversion="torch", scheme="Euler", nt=10)
    psr = DiffPSR(x0, gmm, lm)
    psr.set_support_scheme("grid", rho=1.0)
    psr.printstuff = False
    fes = []
    for it in range(15):
        psr.GMM_opt(max_iterations=25, tol=1e-3)
        psr.Reg_opt(tol=1e-3, nmax=10)
        fes.append(psr.FE)
        print("iter", it, "FE", psr.FE, flush=True)
    res = {
        "mu_init": t2n(mu_init),
        "FE_seq": np.asarray(fes, np.float64),
        "final_mu": t2n(psr.GMMi[0].mu),
        "final_sigma": np.float32(psr.GMMi[0].sigma),
        "final_w": t2n(psr.GMMi[0].w),
        "regloss": np.asarray([float(r) for r in psr.regloss], np.float64),
        "quadloss": t2n(psr.quadloss),
    }
    for k in range(10):
        res[f"x1_{k}"] = t2n(psr.x1[k, 0])
    np.savez(os.path.join(OUT, "multi_run.npz"), **res)
    print("multi_run.npz written, final FE:", fes[-1])


def golden_chui():
    """Reference ICP_two_set on the Chui-Rangarajan dataset 3 (the
    reference's own demo workload, ICP_two_set.py:297-345), similarity and
    diffeomorphic (fixed lambda) variants."""
    import scipy.io

    from diffICP.api.ICP_two_set import ICP_two_set
    from diffICP.tools.kernel import GaussKernel

    def _check_coverage(self, X, Y, Rthreshold):
        return ((X[:, None, :] - Y[None, :, :]) ** 2).sum(-1).min(dim=1).values > (
            Rthreshold * self.sigma
        ) ** 2

    GaussKernel.check_coverage = _check_coverage

    mat = scipy.io.loadmat("/root/reference/diffICP/examples/chui-data/demodata_ex3.mat")
    xa = torch.tensor(np.ascontiguousarray(mat["x3"], np.float32))
    xb = torch.tensor(np.ascontiguousarray(mat["y3"], np.float32))

    res = {"xa": t2n(xa), "xb": t2n(xb)}
    for tag, reg in (
        ("sim", {"type": "similarity"}),
        ("diff", {"type": "diffeomorphic", "lambda_LDDMM": 200.0,
                  "sigma_LDDMM": 0.2}),
    ):
        psr, _ = ICP_two_set(
            xa, xb,
            {"sigma": 0.1, "optimize_sigma": True, "outlier_weight": None},
            reg,
            numerical_options={"computversion": "torch"},
            optim_options={"max_iterations": 30, "convergence_tolerance": 1e-4,
                           "max_repeat_GMM": 25},
            plotstuff=False, printstuff=False,
        )
        res[f"{tag}_FE"] = np.float64(psr.FE)
        res[f"{tag}_sigma"] = np.float32(psr.GMMi[0].sigma)
        res[f"{tag}_x1"] = t2n(psr.x1[0, 0])
        res[f"{tag}_quadloss"] = np.float64(psr.quadloss.sum())
        res[f"{tag}_regloss"] = np.float64(sum(float(r) for r in psr.regloss))
        print(tag, "FE", psr.FE, flush=True)
    np.savez(os.path.join(OUT, "chui_run.npz"), **res)
    print("chui_run.npz written")


def golden_standard():
    """Reference standard_two_set (template-deforms, RKHS measure distance)
    on the spiral pair — validates our PSR_standard energy/optimization."""
    from diffICP.api.standard_two_set import standard_two_set
    from diffICP.core.PSR_standard import data_distance
    from diffICP.tools.kernel import GaussKernel

    def _check_coverage(self, X, Y, Rthreshold):
        return ((X[:, None, :] - Y[None, :, :]) ** 2).sum(-1).min(dim=1).values > (
            Rthreshold * self.sigma
        ) ** 2

    GaussKernel.check_coverage = _check_coverage

    spiral = np.load(os.path.join(OUT, "spiral.npz"))
    xa = torch.tensor(spiral["x0"])  # template (deforms)
    xb = torch.tensor(spiral["x1"])  # data (fixed)

    # raw data_distance value golden (exact formula check)
    dk = GaussKernel(0.1, 2, computversion="torch")
    dd = data_distance(dk, xb, xa)
    res = {
        "xa": t2n(xa), "xb": t2n(xb),
        "data_distance_0.1": np.float64(float(dd)),
    }

    psr, _ = standard_two_set(
        xa, xb,
        {"type": "diffeomorphic", "sigma_data": 0.1, "noise_std": 0.2,
         "sigma_LDDMM": 0.2},
        numerical_options={"computversion": "torch"},
        optim_options={"max_iterations": 6, "convergence_tolerance": 1e-4,
                       "nmax_per_iter": 4},
        plotstuff=False, printstuff=False,
    )
    res["E"] = np.float64(psr.E)
    res["y1"] = t2n(psr.y1[0, 0])
    res["regloss"] = np.float64(float(psr.regloss[0]))
    print("standard E:", psr.E, flush=True)
    np.savez(os.path.join(OUT, "standard_run.npz"), **res)
    print("standard_run.npz written")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "gmm"):
        golden_gmm()
    if which in ("all", "lddmm"):
        golden_lddmm()
    if which in ("all", "affine"):
        golden_affine()
    if which in ("all", "spiral"):
        golden_spiral()
    if which in ("all", "basic"):
        golden_basic()
    if which in ("all", "multi"):
        golden_multi()
    if which in ("all", "chui"):
        golden_chui()
    if which in ("all", "standard"):
        golden_standard()
