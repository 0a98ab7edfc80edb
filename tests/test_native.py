"""Native host-runtime tests: C++ statistics core parity vs the numpy
implementations, and the async measurement spool round-trip through the
HDF5 converter."""

import numpy as np
import pytest

from dqmc_tpu import native
from dqmc_tpu.analysis.jackknife import jackknife, jackknife_array

pytestmark = pytest.mark.skipif(native.load() is None,
                                reason="native toolchain unavailable")


def test_jackknife_real_parity(rng):
    data = rng.standard_normal((37, 5, 4))
    m_np, e_np = jackknife_array(data)
    m_c, e_c = native.jackknife_native(data)
    np.testing.assert_allclose(m_c, m_np, rtol=1e-12)
    np.testing.assert_allclose(e_c, e_np, rtol=1e-10, atol=1e-14)


def test_jackknife_scalar_parity(rng):
    data = rng.standard_normal(101)
    m_np, e_np = jackknife(data)
    m_c, e_c = jackknife(data, use_native=True)
    np.testing.assert_allclose(m_c, m_np, rtol=1e-12)
    np.testing.assert_allclose(e_c, e_np, rtol=1e-10)


def test_jackknife_complex_parity(rng):
    data = rng.standard_normal((25, 6)) + 1j * rng.standard_normal((25, 6))
    m_np, e_np = jackknife_array(data)
    m_c, e_c = native.jackknife_native(data)
    np.testing.assert_allclose(m_c, m_np, rtol=1e-12)
    # complex sqrt branch: compare squared errors (sign-insensitive)
    np.testing.assert_allclose(e_c ** 2, e_np ** 2, rtol=1e-9, atol=1e-14)


def test_rebin(rng):
    data = rng.standard_normal((12, 3))
    out = native.rebin_native(data, 4)
    want = data.reshape(3, 4, 3).mean(axis=1)
    np.testing.assert_allclose(out, want, rtol=1e-14)


def test_autocorr_time(rng):
    # white noise: tau ~ 1
    tau = native.autocorr_time_native(rng.standard_normal(4000))
    assert 0.8 < tau < 1.5
    # AR(1) with rho=0.9: tau = (1+rho)/(1-rho) = 19
    x = np.empty(40000)
    x[0] = 0.0
    eps = rng.standard_normal(40000)
    for i in range(1, len(x)):
        x[i] = 0.9 * x[i - 1] + eps[i]
    tau = native.autocorr_time_native(x)
    assert 10 < tau < 30


def test_spool_roundtrip(tmp_path, rng):
    import h5py

    from dqmc_tpu.io.spool import Spool, convert_spool_to_h5, read_spool

    path = tmp_path / "w0.spool"
    sp = Spool(path)
    eq = rng.standard_normal((4, 4, 1))
    kk = rng.standard_normal((4, 4, 1)) + 1j * rng.standard_normal((4, 4, 1))
    for b in range(3):
        sp.write("scalar/density", b, np.asarray([1.0 + b]))
        sp.write("equaltime/densityCorr", b, eq + b)
        sp.write("K/equaltime/densityCorr", b, kk + b)
    sp.flush()
    sp.close()

    records = list(read_spool(path))
    assert len(records) == 9
    name, b0, arr = records[0]
    assert name == "scalar/density" and b0 == 0 and arr[0] == 1.0

    h5_path = tmp_path / "w0.h5"
    n = convert_spool_to_h5(path, h5_path)
    assert n == 3
    with h5py.File(h5_path) as f:
        assert f["bin_1/scalar/density"][0] == 2.0
        np.testing.assert_allclose(f["bin_2/equaltime/densityCorr"][...],
                                   eq + 2)
        got_k = f["binK_0/equaltime/densityCorr"][...]
        np.testing.assert_allclose(got_k[..., 0] + 1j * got_k[..., 1], kk)


def test_spool_backpressure(tmp_path, rng):
    """Many large records must not deadlock or corrupt (bounded queue)."""
    from dqmc_tpu.io.spool import Spool, read_spool

    path = tmp_path / "big.spool"
    sp = Spool(path)
    big = rng.standard_normal((64, 64))
    for b in range(200):
        sp.write("equaltime/x", b, big)
    sp.close()
    recs = list(read_spool(path))
    assert len(recs) == 200
    np.testing.assert_allclose(recs[-1][2], big)
