"""Unit tests for the stable LDR algebra against f64 goldens and analytic
free-fermion results.  The extreme-conditioning cases (singular-value spread
~1e28) are exactly the regime the whole framework's correctness hangs on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

import golden
from dqmc_tpu.ops import (
    identity_ldr,
    inv_invldr_plus_ldr,
    inv_one_plus_ldr,
    inv_one_plus_ldr_mul_ldr,
    ldr_matrix,
    ldr_mul_ldr,
    ldr_mul_mat,
    mat_mul_ldr,
    to_ldr,
)


def random_K(rng, n=16, w=4.0):
    """Random symmetric 'kinetic' matrix with eigenvalues in [-w, w]."""
    A = rng.standard_normal((n, n))
    V, _ = np.linalg.qr(A)
    eps = rng.uniform(-w, w, size=n)
    return (V * eps[None, :]) @ V.T


def b_matrices(rng, K, beta, nt):
    """B_l = diag(exp(g*eta_l)) @ expm(-dtau*K) with random HS-like diags."""
    dtau = beta / nt
    expK = scipy.linalg.expm(-dtau * K)
    g = np.sqrt(0.5 * 4.0 * dtau)
    etas = rng.choice(
        [-np.sqrt(2 * (3 + np.sqrt(6))), -np.sqrt(2 * (3 - np.sqrt(6))),
         np.sqrt(2 * (3 - np.sqrt(6))), np.sqrt(2 * (3 + np.sqrt(6)))],
        size=(nt, K.shape[0]))
    return [np.exp(g * e)[:, None] * expK for e in etas]


def test_to_ldr_reconstructs(rng):
    M = rng.standard_normal((12, 12)) * np.exp(rng.uniform(-8, 8, size=12))[:, None]
    F = to_ldr(jnp.asarray(M))
    np.testing.assert_allclose(np.asarray(ldr_matrix(F)), M, rtol=1e-12, atol=1e-9)
    assert np.all(np.asarray(F.d) >= 0)
    # L orthogonal
    L = np.asarray(F.L)
    np.testing.assert_allclose(L.T @ L, np.eye(12), atol=1e-12)


def test_products_reconstruct(rng):
    n = 10
    A = rng.standard_normal((n, n))
    B = rng.standard_normal((n, n))
    C = rng.standard_normal((n, n))
    FA, FB = to_ldr(jnp.asarray(A)), to_ldr(jnp.asarray(B))
    np.testing.assert_allclose(
        np.asarray(ldr_matrix(ldr_mul_mat(FA, jnp.asarray(C)))), A @ C,
        rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(ldr_matrix(mat_mul_ldr(jnp.asarray(C), FA))), C @ A,
        rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(ldr_matrix(ldr_mul_ldr(FA, FB))), A @ B,
        rtol=1e-10, atol=1e-10)


def test_identity_padding_neutral(rng):
    n = 8
    A = rng.standard_normal((n, n))
    FA = to_ldr(jnp.asarray(A))
    I = identity_ldr(n)
    np.testing.assert_allclose(np.asarray(ldr_matrix(ldr_mul_ldr(I, FA))), A,
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ldr_matrix(ldr_mul_ldr(FA, I))), A,
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ldr_matrix(ldr_mul_mat(I, jnp.asarray(A)))),
                               A, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ldr_matrix(mat_mul_ldr(jnp.asarray(A), I))),
                               A, rtol=1e-12, atol=1e-12)


def test_inv_one_plus_ldr_wellconditioned(rng):
    n = 12
    A = rng.standard_normal((n, n))
    F = to_ldr(jnp.asarray(A))
    G, logdet = inv_one_plus_ldr(F)
    expected = np.linalg.inv(np.eye(n) + A)
    np.testing.assert_allclose(np.asarray(G), expected, rtol=1e-10, atol=1e-10)
    sign, expected_logdet = np.linalg.slogdet(np.eye(n) + A)
    np.testing.assert_allclose(float(logdet), expected_logdet, rtol=1e-10)


@pytest.mark.parametrize("beta", [2.0, 8.0, 16.0])
def test_free_fermion_extreme_conditioning(rng, beta):
    """U=0: G must match the eigendecomposition oracle even when the naive
    product e^{-beta K} has singular-value spread ~e^{2 beta w} ~ 1e28."""
    n, nt = 16, int(beta * 10)
    K = random_K(rng, n=n, w=4.0)
    dtau = beta / nt
    expK = jnp.asarray(scipy.linalg.expm(-dtau * K))

    # build B(beta, 0) as an LDR product with restabilization every 5 slices
    F = identity_ldr(n)
    for chunk_start in range(0, nt, 5):
        Bprod = jnp.eye(n, dtype=jnp.float64)
        for _ in range(min(5, nt - chunk_start)):
            Bprod = expK @ Bprod
        F = mat_mul_ldr(Bprod, F)

    G, logdet = inv_one_plus_ldr(F)
    G_exact = golden.free_fermion_gtt(K, beta)
    np.testing.assert_allclose(np.asarray(G), G_exact, atol=1e-11)
    np.testing.assert_allclose(float(logdet), golden.free_fermion_logdet(K, beta),
                               rtol=1e-11)


@pytest.mark.parametrize("tau_frac", [0.25, 0.5, 0.75])
def test_free_fermion_pair_inverses(rng, tau_frac):
    """G(tau,tau) via [I+F1 F2]^{-1} and G(tau,0) via [F1^{-1}+F2]^{-1}."""
    n, beta, nt = 16, 8.0, 80
    K = random_K(rng, n=n, w=4.0)
    dtau = beta / nt
    expK = jnp.asarray(scipy.linalg.expm(-dtau * K))
    l_tau = int(nt * tau_frac)

    def build(n_slices):
        F = identity_ldr(n)
        for chunk_start in range(0, n_slices, 5):
            Bprod = jnp.eye(n, dtype=jnp.float64)
            for _ in range(min(5, n_slices - chunk_start)):
                Bprod = expK @ Bprod
            F = mat_mul_ldr(Bprod, F)
        return F

    F1 = build(l_tau)          # B(tau, 0)
    F2 = build(nt - l_tau)     # B(beta, tau)  (same expK, so just fewer slices)

    Gtt, logdet = inv_one_plus_ldr_mul_ldr(F1, F2)
    Gtt_exact = golden.free_fermion_gtt(K, beta)  # commuting B's: independent of tau
    np.testing.assert_allclose(np.asarray(Gtt), Gtt_exact, atol=1e-11)
    np.testing.assert_allclose(float(logdet), golden.free_fermion_logdet(K, beta),
                               rtol=1e-11)

    Gt0 = inv_invldr_plus_ldr(F1, F2)
    Gt0_exact = golden.free_fermion_gt0(K, beta, l_tau * dtau)
    np.testing.assert_allclose(np.asarray(Gt0), Gt0_exact, atol=1e-11)


def test_vs_golden_pivoted_qr_interacting(rng):
    """Interacting-like chain (random HS diagonals): presorted-QR JAX result
    must agree with the true-pivoted-QR scipy golden to f64 tolerance."""
    n, beta, nt, n_stab = 16, 6.0, 60, 5
    K = random_K(rng, n=n, w=3.0)
    Bs = b_matrices(rng, K, beta, nt)

    F_jax = identity_ldr(n)
    F_gold = golden.to_ldr(np.eye(n))
    for start in range(0, nt, n_stab):
        Bprod = np.eye(n)
        for l in range(start, min(start + n_stab, nt)):
            Bprod = Bs[l] @ Bprod
        F_jax = mat_mul_ldr(jnp.asarray(Bprod), F_jax)
        F_gold = golden.mat_mul_ldr(Bprod, F_gold)

    G_jax, ld_jax = inv_one_plus_ldr(F_jax)
    G_gold, ld_gold = golden.inv_one_plus_ldr(F_gold)
    np.testing.assert_allclose(np.asarray(G_jax), G_gold, atol=1e-10)
    np.testing.assert_allclose(float(ld_jax), ld_gold, rtol=1e-9)

    # The d-ladders themselves may differ between presort-QR and greedy
    # pivoting (different pivot order => different intermediate scales), but
    # sum(log d) = log|det F| is an exact invariant, and the extreme scales
    # must track each other for the stabilization to be equivalent.
    log_d_jax = np.sort(np.log(np.asarray(F_jax.d)))
    log_d_gold = np.sort(np.log(F_gold.d))
    np.testing.assert_allclose(log_d_jax.sum(), log_d_gold.sum(), rtol=1e-10)
    assert abs(log_d_jax[-1] - log_d_gold[-1]) < 5.0
    assert abs(log_d_jax[0] - log_d_gold[0]) < 5.0


def test_vmap_batching(rng):
    n, b = 8, 5
    Ms = rng.standard_normal((b, n, n))
    Fs = jax.vmap(to_ldr)(jnp.asarray(Ms))
    Gs, lds = jax.vmap(inv_one_plus_ldr)(Fs)
    for i in range(b):
        G1, ld1 = inv_one_plus_ldr(to_ldr(jnp.asarray(Ms[i])))
        np.testing.assert_allclose(np.asarray(Gs[i]), np.asarray(G1), atol=1e-12)
        np.testing.assert_allclose(float(lds[i]), float(ld1), rtol=1e-12)


def test_jit_compiles():
    n = 8
    M = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)))
    f = jax.jit(lambda m: inv_one_plus_ldr(to_ldr(m)))
    G, ld = f(M)
    G2, ld2 = inv_one_plus_ldr(to_ldr(M))
    np.testing.assert_allclose(np.asarray(G), np.asarray(G2), atol=1e-12)


def test_inv_triplet_dag_matches_separate(rng):
    """One-factorization triplet == the three separate dag inverses.

    Builds a realistic propagator pair: F1 = B(tau,0) in normal form,
    F2t = LDR of B(beta,tau)^T (the engine's transpose-suffix convention),
    from random HS-diagonal B chains at beta=8."""
    from dqmc_tpu.ops.linalg import (inv_invldr_plus_ldr_dag,
                                     inv_one_plus_ldr_dag, inv_triplet_dag)

    n, beta, nt, l_tau = 16, 8.0, 80, 30
    K = random_K(rng, n=n)
    Bs = b_matrices(rng, K, beta, nt)

    F1 = identity_ldr(n)
    for B in Bs[:l_tau]:                       # B(tau,0) normal form
        F1 = mat_mul_ldr(jnp.asarray(B), F1)
    F2t = identity_ldr(n)
    for B in Bs[l_tau:][::-1]:                 # B(beta,tau)^T = prod B_l^T
        F2t = mat_mul_ldr(jnp.asarray(B).T, F2t)

    Gtt_s, ld_s = inv_one_plus_ldr_dag(F1, F2t)
    Gt0_s = inv_invldr_plus_ldr_dag(F1, F2t)
    G0t_s = -jnp.swapaxes(inv_invldr_plus_ldr_dag(F2t, F1), -1, -2)

    Gtt, Gt0, G0t, ld = inv_triplet_dag(F1, F2t)
    np.testing.assert_allclose(np.asarray(Gtt), np.asarray(Gtt_s), atol=1e-12)
    np.testing.assert_allclose(np.asarray(Gt0), np.asarray(Gt0_s), atol=1e-12)
    np.testing.assert_allclose(np.asarray(G0t), np.asarray(G0t_s), atol=1e-12)
    np.testing.assert_allclose(float(ld), float(ld_s), rtol=1e-12)
