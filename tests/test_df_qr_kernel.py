"""Pallas df-CGS2 panel kernel vs the XLA df QR and an f64 oracle.

Runs the hybrid path on CPU in interpret mode, EAGERLY — jitted CPU df
graphs are corrupted by LLVM-level reassociation (ops/df_linalg.py
docstring), and eager interpret execution sidesteps it.  The TPU
compile path is exercised by the df32 engine benchmarks and by
tools/profile_phases.py --dtype df32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dqmc_tpu.ops import df_qr, df_qr_kernel
from dqmc_tpu.ops.df32 import DF


def _graded(rng, b, n, span):
    d = np.exp(np.linspace(span, -span, n))
    A64 = rng.standard_normal((b, n, n)) * d[None, None, :]
    hi = np.float32(A64)
    lo = np.float32(A64 - np.float64(hi))
    return A64, DF(jnp.asarray(hi), jnp.asarray(lo))


def _to64(x):
    return np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)


@pytest.mark.parametrize("n,span", [(32, 4.0), (64, 6.0)])
def test_hybrid_matches_oracle(n, span):
    rng = np.random.default_rng(5)
    A64, Adf = _graded(rng, 2, n, span)
    Q, R = df_qr_kernel.df_qr_hybrid(Adf)
    Q64, R64 = _to64(Q), _to64(R)
    colnorm = np.abs(A64).max(axis=-2, keepdims=True)
    back = (np.abs(Q64 @ R64 - A64).max(axis=-2, keepdims=True)
            / colnorm).max()
    assert back < 5e-13
    orth = np.abs(Q64.swapaxes(-1, -2) @ Q64 - np.eye(n)).max()
    assert orth < 5e-12
    assert np.abs(np.tril(R64, -1)).max() == 0.0


def test_hybrid_matches_xla_path():
    rng = np.random.default_rng(7)
    A64, Adf = _graded(rng, 2, 64, 6.0)
    Qh, Rh = df_qr_kernel.df_qr_hybrid(Adf)
    Qx, Rx = df_qr.df_qr(Adf)
    # same algorithm, different arithmetic schedule: agreement at the
    # df roundoff floor scaled by the column grading
    assert np.abs(_to64(Qh) - _to64(Qx)).max() < 1e-9
    scale = np.abs(_to64(Rx)).max()
    assert np.abs(_to64(Rh) - _to64(Rx)).max() / scale < 1e-12


def test_hybrid_identity_padding_falls_back():
    # n not a multiple of 32: wrapper must fall back to the XLA path
    rng = np.random.default_rng(9)
    A64, Adf = _graded(rng, 1, 24, 2.0)
    Q, R = df_qr_kernel.df_qr_hybrid(Adf)
    back = np.abs(_to64(Q) @ _to64(R) - A64).max()
    assert back < 1e-12


def test_rolled_loop_matches_unrolled():
    # the fori_loop variant (fixed-shape zero-padded projections, shared
    # panel body) must reproduce the unrolled hybrid: extra projection
    # terms are exact zeros through the digit-plane matmul
    rng = np.random.default_rng(13)
    A64, Adf = _graded(rng, 2, 64, 6.0)
    Qu, Ru = df_qr_kernel.df_qr_hybrid(Adf, loop=False)
    Ql, Rl = df_qr_kernel.df_qr_hybrid(Adf, loop=True)
    np.testing.assert_array_equal(np.asarray(Qu.hi), np.asarray(Ql.hi))
    np.testing.assert_array_equal(np.asarray(Qu.lo), np.asarray(Ql.lo))
    np.testing.assert_array_equal(np.asarray(Ru.hi), np.asarray(Rl.hi))
    np.testing.assert_array_equal(np.asarray(Ru.lo), np.asarray(Rl.lo))


def test_vmapped_call_flattens():
    rng = np.random.default_rng(11)
    A64, Adf = _graded(rng, 4, 32, 3.0)
    # vmap over the leading axis must produce the same result as the
    # flat batched call (custom_vmap flattening)
    Qf, Rf = df_qr_kernel.df_qr_hybrid(Adf)
    Qv, Rv = jax.vmap(lambda h, l: df_qr_kernel.df_qr_hybrid(DF(h, l)))(
        Adf.hi, Adf.lo)
    np.testing.assert_array_equal(np.asarray(Qf.hi), np.asarray(Qv.hi))
    np.testing.assert_array_equal(np.asarray(Rf.hi), np.asarray(Rv.hi))
