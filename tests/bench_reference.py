"""Measure the torch reference's wall-clock on the diffICP_multi workload
(the baseline for bench.py's vs_baseline).  Writes tests/goldens/ref_timing.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(__file__))
from make_goldens import _make_point_sets_stub  # noqa: E402  (installs stub)

sys.modules["diffICP.tools.point_sets"] = _make_point_sets_stub()

import matplotlib

matplotlib.use("Agg")
import torch

from diffICP.core.GMM import GaussianMixtureUnif
from diffICP.core.LDDMM import LDDMMModel
from diffICP.core.PSR import DiffPSR
from diffICP.tools.kernel import GaussKernel


def _check_coverage(self, X, Y, Rthreshold):
    return ((X[:, None, :] - Y[None, :, :]) ** 2).sum(-1).min(dim=1).values > (
        Rthreshold * self.sigma
    ) ** 2


GaussKernel.check_coverage = _check_coverage

HERE = os.path.dirname(__file__)
spiral = np.load(os.path.join(HERE, "goldens", "spiral.npz"))
x0 = [torch.tensor(spiral[f"x{k}"]) for k in range(10)]

torch.random.manual_seed(0)
mu_init = x0[0][torch.randint(0, x0[0].shape[0], (20,)), :]
gmm = GaussianMixtureUnif(mu_init, computversion="torch")
gmm.to_optimize = {"mu": True, "sigma": True, "w": True, "eta0": False}
lm = LDDMMModel(sigma=0.2, D=2, lambd=5e2, version="hybrid",
                computversion="torch", scheme="Euler", nt=10)
psr = DiffPSR(x0, gmm, lm)
psr.set_support_scheme("grid", rho=1.0)
psr.printstuff = False

n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 4
times = []
for it in range(n_iter):
    t0 = time.time()
    psr.GMM_opt(max_iterations=25, tol=1e-3)
    psr.Reg_opt(tol=1e-3, nmax=10)
    times.append(time.time() - t0)
    print(f"iter {it}: {times[-1]:.2f}s FE={psr.FE:.4f}", flush=True)

out = {
    "workload": "diffICP_multi K=10 (~110 pts each), C=20, hybrid lam=5e2",
    "iter_seconds": times,
    "mean_iter_seconds": float(np.mean(times[1:])) if len(times) > 1 else times[0],
    "host": "cpu torch (no keops available)",
}
with open(os.path.join(HERE, "goldens", "ref_timing.json"), "w") as f:
    json.dump(out, f, indent=1)
print("ref_timing.json written:", out["mean_iter_seconds"], "s/iter")
