"""End-to-end pipeline tests: CLI-equivalent driver -> HDF5 -> analysis.

The strongest compatibility check runs the *reference's own* analysis
script (/root/reference/scripts/analysis.py, unmodified) against our HDF5
output and asserts its results are byte-identical to our clean-room
analysis tool's."""

import os
import subprocess
import sys

import h5py
import numpy as np
import pytest

from dqmc_tpu.analysis import analyze
from dqmc_tpu.config import Parameters
from dqmc_tpu.run import run_simulation

PARAMS = """
[Lattice]
L1 = 4
L2 = 4
[hubbard]
U = 4.0
t = 1.0
mu = 0.0
[simulation]
beta = 2.0
nt = 8
n_therms = 10
n_sweeps = 3
n_bins = 3
n_stab = 2
symmetric = false
isMeasureUnequalTime = true
seed = 11
dtype = float64
[walkers]
n_walkers = 2
"""

REF_ANALYSIS = "/root/reference/scripts/analysis.py"


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    (d / "parameters.in").write_text(PARAMS)
    cwd = os.getcwd()
    os.chdir(d)
    try:
        params = Parameters.from_string(PARAMS)
        summary = run_simulation(params, out_dir=str(d / "results"),
                                 verbose=False)
    finally:
        os.chdir(cwd)
    return d, summary


def test_run_summary(run_dir):
    d, summary = run_dir
    assert summary.n_walkers == 2
    assert 0.0 < summary.acc_rate < 1.0
    assert summary.max_precision_error < 1e-8


def test_h5_layout(run_dir):
    d, _ = run_dir
    for w in range(2):
        path = d / "results" / f"data_{w}.h5"
        assert path.exists()
        with h5py.File(path) as f:
            for b in range(3):
                assert f[f"bin_{b}/scalar/density"].shape == (1,)
                assert f[f"bin_{b}/equaltime/densityCorr"].shape == (4, 4, 1)
                assert f[f"bin_{b}/unequaltime/greenTau"].shape == (4, 4, 9)
                assert f[f"binK_{b}/equaltime/densityCorr"].shape == (4, 4, 1, 2)
                assert f[f"binK_{b}/unequaltime/currxxTau"].shape == (4, 4, 9, 2)
    info = (d / "results" / "info").read_text().splitlines()
    assert info[0] == "L1 4" and info[2] == "n_orb 1"


def test_density_near_half_filling(run_dir):
    d, _ = run_dir
    with h5py.File(d / "results" / "data_0.h5") as f:
        dens = [f[f"bin_{b}/scalar/density"][0] for b in range(3)]
    # mu=0 attractive model is exactly half filled; tiny stats => loose tol
    assert abs(np.mean(dens) - 1.0) < 0.25


def test_our_analysis_writes_all_outputs(run_dir):
    d, _ = run_dir
    out = d / "ours"
    out.mkdir(exist_ok=True)
    results = analyze(str(d / "results"), str(d / "parameters.in"),
                      out_dir=str(out), verbose=False)
    assert set(results) == {"density", "doubleOcc", "swave"}
    for f in ["scalarObservables.dat", "densityCorr/statr.dat",
              "densityCorr/statk.dat", "greenTau/statr.dat",
              "greenTau/statr0.dat", "greenTau/statk.dat",
              "doublonTau/statr.dat", "currxxTau/statk.dat"]:
        assert (out / f).exists(), f


@pytest.mark.skipif(not os.path.exists(REF_ANALYSIS),
                    reason="reference analysis script not available")
def test_reference_analysis_reads_our_output_identically(run_dir):
    d, _ = run_dir
    ours = d / "ours2"
    ref = d / "ref"
    ours.mkdir(exist_ok=True)
    ref.mkdir(exist_ok=True)
    analyze(str(d / "results"), str(d / "parameters.in"),
            out_dir=str(ours), verbose=False)
    proc = subprocess.run(
        [sys.executable, REF_ANALYSIS, "-d", str(d / "results")],
        cwd=ref, capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    assert "Analysis complete." in proc.stdout
    for f in ["scalarObservables.dat", "densityCorr/statr.dat",
              "densityCorr/statk.dat", "greenTau/statr.dat",
              "greenTau/statr0.dat", "doublonTau/statr0.dat",
              "currxxTau/statk.dat"]:
        ours_text = (ours / f).read_text()
        ref_text = (ref / f).read_text()
        assert ours_text == ref_text, f"analysis output differs: {f}"
