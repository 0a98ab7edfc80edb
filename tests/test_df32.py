"""df32 (double-float32) arithmetic vs a numpy longdouble oracle.

df32 carries ~49 significand bits; longdouble on x86 carries 64 — a valid
oracle down to 2^-60.  Target: elementwise ops accurate to ~2^-48
relative, matmul to ~2^-47 relative of the row/column magnitude product.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from dqmc_tpu.ops import df32  # noqa: E402

LD = np.longdouble
EPS_DF = 2.0 ** -44   # headroom over the ~4u^2 = 2^-46 dd bounds


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _rand_df(rng, shape, scale_pow=0.0):
    """Random df values with full 49-bit significands, scales ~2^scale_pow."""
    hi = (rng.standard_normal(shape) * 2.0 ** scale_pow).astype(np.float32)
    lo = (rng.standard_normal(shape)
          * np.spacing(np.abs(hi)) * 0.4).astype(np.float32)
    return df32.DF(jnp.asarray(hi), jnp.asarray(lo))


def _ld(x: df32.DF):
    return np.asarray(x.hi, LD) + np.asarray(x.lo, LD)


def _rel_err(got: df32.DF, want_ld):
    g = _ld(got)
    denom = np.maximum(np.abs(want_ld), LD(1e-30))
    return float(np.max(np.abs(g - want_ld) / denom))


def test_from_to_f64_roundtrip(rng):
    jax.config.update("jax_enable_x64", True)
    x = jnp.asarray(rng.standard_normal(100) * 1e3, jnp.float64)
    d = df32.from_f64(x)
    back = df32.to_f64(d)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               rtol=2.0 ** -48)


@pytest.mark.parametrize("op,ldop,bound", [
    # add/sub: a few extra ulps against the RESULT under cancellation —
    # the standard double-double bound
    ("add", lambda a, b: a + b, 2.0 ** -45),
    ("sub", lambda a, b: a - b, 2.0 ** -45),
    ("mul", lambda a, b: a * b, EPS_DF),
    ("div", lambda a, b: a / b, EPS_DF),
])
def test_elementwise_accuracy(rng, op, ldop, bound):
    a = _rand_df(rng, (4096,))
    b = _rand_df(rng, (4096,))
    got = getattr(df32, op)(a, b)
    assert _rel_err(got, ldop(_ld(a), _ld(b))) < bound


def test_add_catastrophic_cancellation(rng):
    """a + b with b = -a + tiny: the sum must equal the EXACT dd value of
    a + b (full cancellation handled by the error-free transforms); the
    deviation from `tiny` itself is b's storage error, ~2^-49 |a|."""
    a = _rand_df(rng, (1000,))
    tiny = df32.mul_pow2(_rand_df(rng, (1000,)), np.float32(2.0 ** -40))
    b = df32.add(df32.neg(a), tiny)
    got = df32.add(a, b)
    true = _ld(a) + _ld(b)
    err = np.abs(_ld(got) - true)
    assert float(np.max(err / (np.abs(true) + 2.0 ** -49
                               * np.abs(_ld(a))))) < 2.0 ** -44
    # and the recovered value is tiny up to b's storage error
    assert float(np.max(np.abs(_ld(got) - _ld(tiny))
                        / np.abs(_ld(a)))) < 2.0 ** -47


def test_mul_wide_dynamic_range(rng):
    a = _rand_df(rng, (2048,), scale_pow=25.0)
    b = _rand_df(rng, (2048,), scale_pow=-30.0)
    got = df32.mul(a, b)
    assert _rel_err(got, _ld(a) * _ld(b)) < EPS_DF


def test_sqrt_accuracy(rng):
    a = _rand_df(rng, (2048,), scale_pow=10.0)
    a = df32.DF(jnp.abs(a.hi) + np.float32(1e-3),
                jnp.where(a.hi < 0, -a.lo, a.lo))
    got = df32.sqrt(a)
    assert _rel_err(got, np.sqrt(_ld(a))) < EPS_DF


def test_sqrt_zero():
    z = df32.df(jnp.zeros(4))
    out = df32.sqrt(z)
    assert np.all(np.asarray(out.hi) == 0) and np.all(np.asarray(out.lo) == 0)


def test_digit_planes_reconstruct(rng):
    v = _rand_df(rng, (16, 64))
    planes, s = df32._digit_planes(v, axis=-1, n_planes=df32.N_PLANES)
    planes = np.asarray(planes, LD)
    recon = np.zeros((16, 64), LD)
    for i in range(df32.N_PLANES):
        recon += planes[i] * LD(2.0) ** (-7 * (i + 1))
    recon *= np.asarray(s, LD)
    err = np.abs(recon - _ld(v)) / np.abs(np.asarray(s, LD))
    assert float(err.max()) < 2.0 ** -48


def test_matmul_accuracy(rng):
    a = _rand_df(rng, (96, 96))
    b = _rand_df(rng, (96, 96))
    got = df32.matmul(a, b)
    want = _ld(a) @ _ld(b)
    # error relative to the inner-product magnitude, not the (possibly
    # cancelling) result
    mag = np.abs(_ld(a)) @ np.abs(_ld(b)) + LD(1e-30)
    err = np.abs(_ld(got) - want) / mag
    assert float(err.max()) < 2.0 ** -45


def test_matmul_graded_columns(rng):
    """Columns spanning e^-25..e^25 (the DQMC fold regime after
    equilibration the d-scales stay within f32 range): columnwise relative
    accuracy must hold because scales are per-row/column."""
    a = _rand_df(rng, (64, 64))
    colscale = np.exp(np.linspace(-25, 25, 64)).astype(np.float32)
    b = _rand_df(rng, (64, 64))
    b = df32.DF(b.hi * colscale[None, :], b.lo * colscale[None, :])
    got = df32.matmul(a, b)
    want = _ld(a) @ _ld(b)
    mag = np.abs(_ld(a)) @ np.abs(_ld(b)) + LD(1e-30)
    err = np.abs(_ld(got) - want) / mag
    assert float(err.max()) < 2.0 ** -45


def test_matmul_batched_matches_loop(rng):
    a = _rand_df(rng, (3, 32, 32))
    b = _rand_df(rng, (3, 32, 32))
    got = df32.matmul(a, b)
    for i in range(3):
        one = df32.matmul(df32.DF(a.hi[i], a.lo[i]),
                          df32.DF(b.hi[i], b.lo[i]))
        np.testing.assert_array_equal(np.asarray(got.hi[i]),
                                      np.asarray(one.hi))
        np.testing.assert_array_equal(np.asarray(got.lo[i]),
                                      np.asarray(one.lo))


def test_matmul_beats_f32_by_many_orders(rng):
    """The point of the exercise: df32 matmul error ~2^-47 vs f32's ~2^-22."""
    a = _rand_df(rng, (128, 128))
    b = _rand_df(rng, (128, 128))
    want = _ld(a) @ _ld(b)
    mag = np.abs(_ld(a)) @ np.abs(_ld(b)) + LD(1e-30)
    f32_prod = np.asarray(a.hi) @ np.asarray(b.hi)
    err_f32 = float(np.max(np.abs(np.asarray(f32_prod, LD) - want) / mag))
    err_df = float(np.max(np.abs(_ld(df32.matmul(a, b)) - want) / mag))
    assert err_df < err_f32 * 1e-5
