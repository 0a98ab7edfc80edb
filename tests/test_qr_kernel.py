"""Pallas blocked-CGS2 QR kernel: factorization quality, batching rules,
and real-chain accuracy at f32 (the mode the TPU engine runs in)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqmc_tpu.ops.qr_kernel import _cgs2_qr_impl, cgs2_qr


def _graded(rng, B, n, spread=12.0, dtype=np.float32):
    base = rng.standard_normal((B, n, n))
    grade = np.exp(rng.uniform(-spread / 2, spread / 2, (B, n)))
    M = base * grade[:, None, :]
    s = np.abs(M).max(axis=1)
    return jnp.asarray((M / s[:, None, :]).astype(dtype))


def test_cgs2_factorization_quality(rng):
    A = _graded(rng, 4, 64)
    Q, R = _cgs2_qr_impl(A, interpret=True)
    Q, R = np.asarray(Q, np.float64), np.asarray(R, np.float64)
    n = 64
    orth = np.abs(Q.swapaxes(-1, -2) @ Q - np.eye(n)).max()
    recon = np.abs(Q @ R - np.asarray(A, np.float64)).max()
    # orthogonality degrades mildly with cond (measured 3.7e-5 at cond
    # ~5e3); reconstruction is columnwise backward stable
    assert orth < 2e-4, orth
    assert recon < 5e-6, recon
    # R strictly upper triangular with non-negative diagonal
    assert np.abs(np.tril(R, -1)).max() == 0.0
    assert (np.diagonal(R, axis1=-2, axis2=-1) >= 0).all()


def test_cgs2_d_ladder_matches_householder(rng):
    """|diag R| (the d-ladder, the heart of the LDR stabilization) must
    match f64 Householder to columnwise relative accuracy."""
    A = _graded(rng, 2, 64, spread=16.0)
    _, R = _cgs2_qr_impl(A, interpret=True)
    _, R64 = jnp.linalg.qr(np.asarray(A, np.float64))
    d = np.abs(np.diagonal(np.asarray(R, np.float64), axis1=-2, axis2=-1))
    d64 = np.abs(np.diagonal(np.asarray(R64), axis1=-2, axis2=-1))
    assert (np.abs(d - d64) / d64).max() < 1e-4


def test_cgs2_vmap_flattens(rng):
    A = _graded(rng, 6, 32)
    Q1, R1 = _cgs2_qr_impl(A, interpret=True)
    Q2, R2 = jax.vmap(cgs2_qr)(A)
    np.testing.assert_allclose(np.asarray(Q1), np.asarray(Q2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-6)
    # double vmap (replica x flavor shape) flattens too
    A4 = A.reshape(2, 3, 32, 32)
    Q3, R3 = jax.vmap(jax.vmap(cgs2_qr))(A4)
    np.testing.assert_allclose(np.asarray(Q3).reshape(6, 32, 32),
                               np.asarray(Q1), atol=1e-6)


def test_cgs2_unaligned_sizes_pad_exactly(rng):
    """Sizes not divisible by the panel width run through exact identity
    padding (e.g. ns = 144 for a 12x12 lattice)."""
    for n in (20, 144):
        A = jnp.asarray(rng.standard_normal((2, n, n)).astype(np.float32))
        Q, R = cgs2_qr(A)
        Qn, Rn = np.asarray(Q, np.float64), np.asarray(R, np.float64)
        np.testing.assert_allclose(Qn @ Rn, np.asarray(A, np.float64),
                                   atol=2e-5)
        assert np.abs(Qn.swapaxes(-1, -2) @ Qn - np.eye(n)).max() < 2e-4
        assert np.abs(np.tril(Rn, -1)).max() == 0.0


def test_cgs2_chain_accuracy_matches_householder():
    """f32 chain rebuild at beta=8 with forced CGS2 must match the f64
    truth as well as the Householder path does (within 2x)."""
    from dqmc_tpu.engine import EngineConfig
    from dqmc_tpu.engine.sweep import rebuild_stack_and_greens
    from dqmc_tpu.lattice import square_lattice
    from dqmc_tpu.models import AttractiveHubbard
    from dqmc_tpu.ops import linalg as lin

    rng = np.random.default_rng(0)
    lat = square_lattice(8, 8)
    nt, n_stab = 80, 5  # dtau = 0.1, the regime production runs live in
    fields = jnp.asarray(rng.integers(0, 4, (nt, lat.n_sites)), jnp.int32)
    cfg = EngineConfig(nt=nt, n_stab=n_stab)
    m64 = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1, beta=8.0,
                                  nt=nt, dtype=jnp.float64)
    m32 = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1, beta=8.0,
                                  nt=nt, dtype=jnp.float32)
    _, g64, _ = rebuild_stack_and_greens(m64, cfg, fields)
    errs = {}
    for mode in ("householder", "cgs2"):
        lin.set_f32_orthogonalization(mode)
        jax.clear_caches()
        try:
            _, g32, _ = rebuild_stack_and_greens(m32, cfg, fields)
        finally:
            lin.set_f32_orthogonalization("auto")
        errs[mode] = float(jnp.max(jnp.abs(
            g32[0].astype(jnp.float64) - g64[0])))
    assert np.isfinite(errs["cgs2"])
    # max-norm of amplified f32 rounding noise wobbles by a few x between
    # equally-stable factorizations; same decade + absolute cap is the
    # meaningful invariant (steady-state sweep errors were measured at
    # 0.25 vs 0.13 for cgs2 vs householder+LU on this workload; the
    # realization moved from 4.2x to 6.9x when the suite switched to
    # --xla_backend_optimization_level=0)
    assert errs["cgs2"] < 10 * errs["householder"] + 1e-4, errs
    assert errs["cgs2"] < 2e-2, errs


def test_cgs2_qr_inv_matches_solve(rng):
    """In-kernel R^{-1}: W must invert R to f32 quality and reproduce the
    triangular-solve result; identity padding and vmap flattening hold."""
    from dqmc_tpu.ops.qr_kernel import cgs2_qr_inv
    n = 64
    d = np.exp(np.linspace(3, -3, n))
    A = jnp.asarray(rng.standard_normal((3, n, n)) * d[None, None, :],
                    jnp.float32)
    Q, R, W = jax.vmap(cgs2_qr_inv)(A)
    eye = np.eye(n)
    # W R = I to cond-scaled f32 accuracy
    res = np.abs(np.asarray(W @ R, np.float64) - eye).max()
    assert res < 1e-3, res
    # the solve path X = W (Q^T Y) matches triangular_solve
    Y = jnp.asarray(rng.standard_normal((3, n, 8)), jnp.float32)
    X_w = np.asarray(W @ (jnp.swapaxes(Q, -1, -2) @ Y), np.float64)
    X_t = np.asarray(jax.lax.linalg.triangular_solve(
        R, jnp.swapaxes(Q, -1, -2) @ Y, left_side=True, lower=False),
        np.float64)
    scale = np.abs(X_t).max()
    assert np.abs(X_w - X_t).max() / scale < 1e-4
    # unaligned size goes through exact identity padding
    m = 24
    Am = jnp.asarray(rng.standard_normal((m, m)), jnp.float32)
    Qm, Rm, Wm = cgs2_qr_inv(Am)
    assert np.abs(np.asarray(Wm @ Rm, np.float64) - np.eye(m)).max() < 1e-4
