"""Sign-reweighted analysis: the jackknife ratio estimator and its wiring
through the manager -> HDF5 -> analysis CLI pipeline.

Sign-prone models accumulate every observable sign-weighted (<O s> per
bin) plus the <s> series; the physical value is <O s>/<s>, jackknifed
jointly.  Sign-free runs have no "sign" dataset and must analyze exactly
as before (pinned separately by the reference-parity end-to-end test).
"""

import os

import jax.numpy as jnp
import numpy as np

from dqmc_tpu.analysis.cli import analyze
from dqmc_tpu.analysis.jackknife import jackknife_ratio_array
from dqmc_tpu.lattice import square_lattice
from dqmc_tpu.measure.manager import MeasurementManager


def test_ratio_jackknife_matches_manual_delete1():
    rng = np.random.default_rng(7)
    n = 12
    num = rng.standard_normal((n, 3, 2)) + 2.0
    den = rng.uniform(0.5, 1.0, n)

    mean, err = jackknife_ratio_array(num, den)
    np.testing.assert_allclose(mean, num.mean(axis=0) / den.mean(),
                               rtol=1e-13)
    # manual delete-1
    theta = np.stack([
        np.delete(num, i, axis=0).mean(axis=0)
        / np.delete(den, i).mean() for i in range(n)])
    var = ((theta - theta.mean(axis=0)) ** 2).sum(axis=0) * (n - 1) / n
    np.testing.assert_allclose(err, np.sqrt(var), rtol=1e-10)

    # scalar form
    m1, e1 = jackknife_ratio_array(num[:, 0, 0], den)
    np.testing.assert_allclose(m1, mean[0, 0], rtol=1e-13)
    np.testing.assert_allclose(e1, err[0, 0], rtol=1e-10)

    # when the denominator is identically 1, the ratio reduces to the
    # plain jackknife
    from dqmc_tpu.analysis.jackknife import jackknife
    ones = np.ones(n)
    m2, e2 = jackknife_ratio_array(num[:, 0, 0], ones)
    m3, e3 = jackknife(num[:, 0, 0])
    np.testing.assert_allclose(m2, m3, rtol=1e-13)
    np.testing.assert_allclose(e2, e3, rtol=1e-10)


def test_analysis_reweights_signed_bins(tmp_path):
    """manager.measure_equal(signs=...) -> h5 -> analyze must report
    <O s>/<s>, not <O s>."""
    lat = square_lattice(4, 4)
    ns = lat.n_sites
    out = str(tmp_path / "results")
    os.makedirs(out)
    lat.save_info(os.path.join(out, "info"))
    man = MeasurementManager(lat, n_walkers=1, out_dir=out)
    man.add_defaults()

    rng = np.random.default_rng(3)
    n_bins, per_bin = 4, 3
    dens_ws, signs_all = [], []
    for _ in range(n_bins):
        for _ in range(per_bin):
            G = jnp.asarray(rng.standard_normal((1, 1, ns, ns)) * 0.1
                            + 0.5 * np.eye(ns))
            s = float(rng.choice([-1.0, 1.0], p=[0.25, 0.75]))
            man.measure_equal(G, signs=jnp.asarray([s]))
            g = np.asarray(G[0, 0])
            dens_ws.append((2 * ns - 2 * np.trace(g)) / ns * s)
            signs_all.append(s)
        man.accumulate()
    man.close()

    res = analyze(results_dir=out, param_file=str(tmp_path / "none.in"),
                  out_dir=str(tmp_path), verbose=False)
    num = np.asarray(dens_ws).reshape(n_bins, per_bin).mean(axis=1)
    den = np.asarray(signs_all).reshape(n_bins, per_bin).mean(axis=1)
    want_mean, want_err = jackknife_ratio_array(num, den)
    np.testing.assert_allclose(res["density"][0], want_mean, rtol=1e-10)
    np.testing.assert_allclose(res["density"][1], want_err, rtol=1e-8)
    # <sign> itself reported un-reweighted
    np.testing.assert_allclose(res["sign"][0], den.mean(), rtol=1e-12)
