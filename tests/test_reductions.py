"""Parity tests for the Gaussian pairwise reductions.

Each reduction is checked against an independent numpy brute-force loop
implementation of the closed-form kernel derivatives (the analog of the
reference's KeOps-vs-torch side-by-side check, kernel.py:346-400).
Masked variants must agree with running the op on the unpadded subset.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from difficp_tpu.ops import reductions as R

M, N, D, SIG = 17, 29, 2, 0.7
rng = np.random.default_rng(0)
X = rng.normal(size=(M, D)).astype(np.float32)
Y = rng.normal(size=(N, D)).astype(np.float32)
B = rng.normal(size=(N, D)).astype(np.float32)
C = rng.normal(size=(M, D)).astype(np.float32)
DSCAL = rng.normal(size=(N,)).astype(np.float32)


def bf_k(z):
    return np.exp(-np.sum(z * z) / (2 * SIG**2))


def bf_gradk(z):
    return -z * bf_k(z) / SIG**2


def bf_lapk(z):
    return (np.sum(z * z) / SIG**4 - D / SIG**2) * bf_k(z)


def bf_gradlapk(z):
    return (np.sum(z * z) / SIG**6 - (D + 2) / SIG**4) * (-z * bf_k(z))


def bf_hessk(z):
    return (np.outer(z, z) / SIG**4 - np.eye(D) / SIG**2) * bf_k(z)


def close(a, b, tol=1e-4):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=tol, atol=tol)


def test_kbase():
    want = np.array([sum(bf_k(X[i] - Y[j]) for j in range(N)) for i in range(M)])
    close(R.kbase(X, Y, SIG), want)


def test_kred_scal():
    want = np.array(
        [sum(bf_k(X[i] - Y[j]) * DSCAL[j] for j in range(N)) for i in range(M)]
    )
    close(R.kred_scal(X, Y, DSCAL, SIG), want)


def test_kred():
    want = np.stack(
        [sum(bf_k(X[i] - Y[j]) * B[j] for j in range(N)) for i in range(M)]
    )
    close(R.kred(X, Y, B, SIG), want)


def test_grad_kred():
    want = np.stack(
        [sum(bf_gradk(X[i] - Y[j]) for j in range(N)) for i in range(M)]
    )
    close(R.grad_kred(X, Y, SIG), want)


def test_grad_kred_rev_identity():
    # sum_i c_i . GradKRed(x,y)_i == sum_j GradKRed_rev(x,y,c)_j
    # (reference kernel.py:383-387)
    lhs = float(jnp.sum(jnp.asarray(C) * R.grad_kred(X, Y, SIG)))
    rhs = float(jnp.sum(R.grad_kred_rev(X, Y, C, SIG)))
    assert abs(lhs - rhs) < 1e-4 * max(1.0, abs(lhs))


def test_ddkred():
    want = np.stack(
        [sum(bf_gradk(X[i] - Y[j]) * B[j] for j in range(N)) for i in range(M)]
    )
    close(R.ddkred(X, Y, B, SIG), want)


def test_gendk_red():
    want = np.stack(
        [
            sum(bf_gradk(X[i] - Y[j]) * float(C[i] @ B[j]) for j in range(N))
            for i in range(M)
        ]
    )
    close(R.gendk_red(X, Y, B, C, SIG), want)


def test_hessk_red():
    want = np.stack(
        [
            sum(bf_hessk(X[i] - Y[j]) @ (C[i] - B[j]) for j in range(N))
            for i in range(M)
        ]
    )
    close(R.hessk_red(X, Y, B, C, SIG), want)


def test_lapk_red():
    want = np.array([sum(bf_lapk(X[i] - Y[j]) for j in range(N)) for i in range(M)])
    close(R.lapk_red(X, Y, SIG), want)


def test_gradlapk_red():
    want = np.stack(
        [sum(bf_gradlapk(X[i] - Y[j]) for j in range(N)) for i in range(M)]
    )
    close(R.gradlapk_red(X, Y, SIG), want)


@pytest.mark.parametrize("eta", [0.0, 0.37])
def test_fused_rhs_self_matches_separate(eta):
    p = rng.normal(size=(M, D)).astype(np.float32)
    vq, mgq, dcost = R.lddmm_rhs_self(X, p, SIG, eta, True)
    want_v = R.kred(X, X, p, SIG)
    want_g = R.gendk_red(X, X, p, p, SIG)
    if eta != 0.0:
        want_v = want_v - eta * R.grad_kred(X, X, SIG)
        want_g = (
            want_g
            - eta * R.hessk_red(X, X, p, p, SIG)
            - eta**2 * R.gradlapk_red(X, X, SIG)
        )
    close(vq, want_v)
    close(mgq, -want_g)
    want_c = R.mdivsum(X, X, p, SIG, eta)
    close(dcost, want_c, tol=1e-3)


@pytest.mark.parametrize("eta", [0.0, 0.37])
def test_fused_rhs_ext(eta):
    p = rng.normal(size=(M, D)).astype(np.float32)
    vq, mgq, dcost, vx = R.lddmm_rhs_ext(X, p, Y, SIG, eta, True)
    vq2, mgq2, _ = R.lddmm_rhs_self(X, p, SIG, eta, False)
    close(vq, vq2)
    close(mgq, mgq2)
    close(vx, R.v_field(Y, X, p, SIG, eta))
    close(dcost, R.mdivsum(Y, X, p, SIG, eta), tol=1e-3)


def test_mdivsum_is_minus_divergence():
    # numeric divergence of v at data points y
    p = rng.normal(size=(M, D)).astype(np.float32)
    eps = 1e-3

    def v_at(pts):
        return np.asarray(R.v_field(pts, X, p, SIG, 0.0))

    div = np.zeros(N)
    for d in range(D):
        e = np.zeros(D, dtype=np.float32)
        e[d] = eps
        div += (v_at(Y + e)[:, d] - v_at(Y - e)[:, d]) / (2 * eps)
    want = -div.sum()
    got = float(R.mdivsum(Y, X, p, SIG, 0.0))
    assert abs(got - want) < 1e-2 * max(1.0, abs(want))


def test_masked_equals_subset():
    mask = (rng.uniform(size=N) > 0.3).astype(np.float32)
    idx = np.nonzero(mask)[0]
    p = rng.normal(size=(M, D)).astype(np.float32)

    close(R.kbase(X, Y, SIG, mask), R.kbase(X, Y[idx], SIG))
    close(R.kred(X, Y, B, SIG, mask), R.kred(X, Y[idx], B[idx], SIG))
    close(R.grad_kred(X, Y, SIG, mask), R.grad_kred(X, Y[idx], SIG))
    close(R.lapk_red(X, Y, SIG, mask), R.lapk_red(X, Y[idx], SIG))
    close(
        R.mdivsum(Y, X, p, SIG, 0.3, mask_x=mask),
        R.mdivsum(Y[idx], X, p, SIG, 0.3),
        tol=1e-3,
    )
    # hamiltonian with masked support == hamiltonian on subset
    maskq = (rng.uniform(size=M) > 0.3).astype(np.float32)
    qidx = np.nonzero(maskq)[0]
    close(
        R.hamiltonian(X, p * maskq[:, None], SIG, 0.3, maskq),
        R.hamiltonian(X[qidx], p[qidx], SIG, 0.3),
        tol=1e-3,
    )


def test_min_sqdist_and_coverage():
    d2 = R.min_sqdist(X, Y)
    want = ((X[:, None, :] - Y[None, :, :]) ** 2).sum(-1).min(1)
    close(d2, want)
    cov = R.check_coverage(X, Y, SIG, 2.0)
    close(cov.astype(np.float32), (want > (2.0 * SIG) ** 2).astype(np.float32))


def test_second_min_sqdist():
    got = R.second_min_sqdist(X)
    dd = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(dd, np.inf)
    close(got, dd.min(1))
