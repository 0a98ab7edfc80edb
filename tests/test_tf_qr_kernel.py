"""Pallas tf-CGS2 panel kernel vs the XLA tf QR and an f64 oracle.

Runs the hybrid path on CPU in interpret mode, EAGERLY — jitted CPU
multiword graphs are corrupted by LLVM-level reassociation
(ops/df_linalg.py docstring).  The TPU compile path is exercised by the
tf32 measured benchmarks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dqmc_tpu.ops import tf32, tf_qr_kernel
from dqmc_tpu.ops.df_qr import df_qr
from dqmc_tpu.ops.tf32 import TF


def _graded(rng, b, n, span):
    d = np.exp(np.linspace(span, -span, n))
    A64 = rng.standard_normal((b, n, n)) * d[None, None, :]
    return A64, tf32.from_f64(jnp.asarray(A64))


def _to64(x):
    return np.asarray(tf32.to_f64(x))


@pytest.mark.parametrize("n,span", [(32, 4.0), (64, 6.0)])
def test_tf_hybrid_matches_oracle(n, span):
    rng = np.random.default_rng(5)
    A64, Atf = _graded(rng, 2, n, span)
    Q, R = tf_qr_kernel.tf_qr_hybrid(Atf)
    Q64, R64 = _to64(Q), _to64(R)
    colnorm = np.abs(A64).max(axis=-2, keepdims=True)
    back = (np.abs(Q64 @ R64 - A64).max(axis=-2, keepdims=True)
            / colnorm).max()
    assert back < 1e-15, back
    orth = np.abs(Q64.swapaxes(-1, -2) @ Q64 - np.eye(n)).max()
    assert orth < 1e-14, orth
    assert np.abs(np.tril(R64, -1)).max() == 0.0


def test_tf_hybrid_matches_xla_path():
    rng = np.random.default_rng(7)
    A64, Atf = _graded(rng, 2, 64, 6.0)
    Qh, Rh = tf_qr_kernel.tf_qr_hybrid(Atf)
    Qx, Rx = df_qr(Atf, nm=tf32)
    # same algorithm, different arithmetic schedule: agreement at the
    # tf roundoff floor scaled by the column grading
    assert np.abs(_to64(Qh) - _to64(Qx)).max() < 1e-14
    scale = np.abs(_to64(Rx)).max()
    assert np.abs(_to64(Rh) - _to64(Rx)).max() / scale < 1e-17


def test_tf_hybrid_vmap_consistent():
    rng = np.random.default_rng(9)
    A64, Atf = _graded(rng, 3, 32, 3.0)
    Qf, Rf = tf_qr_kernel.tf_qr_hybrid(Atf)
    Qv, Rv = jax.vmap(lambda h, m, l: tf_qr_kernel.tf_qr_hybrid(
        TF(h, m, l)))(Atf.hi, Atf.mi, Atf.lo)
    for a, b in ((Qf, Qv), (Rf, Rv)):
        for ca, cb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))


def test_tf_hybrid_fallback_odd_n():
    rng = np.random.default_rng(11)
    A64, Atf = _graded(rng, 1, 48, 2.0)
    Q, R = tf_qr_kernel.tf_qr_hybrid(Atf)     # 48 % 32 != 0 -> XLA path
    back = np.abs(_to64(Q) @ _to64(R) - A64).max()
    assert back < 1e-12
