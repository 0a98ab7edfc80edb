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


def _auto_params(err_warn: str, n_therms: int = 12, n_stab_start: int = 3,
                 extra_sim: str = ""):
    return f"""
[Lattice]
L1 = 4
L2 = 4
[hubbard]
U = 4.0
t = 1.0
mu = 0.0
[simulation]
beta = 2.0
nt = 12
n_therms = {n_therms}
n_sweeps = 2
n_bins = 1
n_stab = auto
n_stab_start = {n_stab_start}
err_warn_threshold = {err_warn}
seed = 3
dtype = float64
{extra_sim}
[walkers]
n_walkers = 1
"""


def test_auto_n_stab_loosens_when_error_is_tiny(tmp_path):
    """f64 at beta=2 has chunk errors ~1e-12 << any sane threshold, so the
    adaptive schedule must LOOSEN the stabilization interval (the automated
    form of dqmc.cpp:390's advice, in the profitable direction)."""
    text = _auto_params(err_warn="1e-6")
    params = Parameters.from_string(text)
    summary = run_simulation(params, out_dir=str(tmp_path / "results"),
                             verbose=False)
    assert summary.n_stab > 3
    # the run stays healthy on the loosened schedule
    assert summary.max_precision_error < 1e-6


def test_auto_n_stab_tightens_under_pressure(tmp_path):
    """With an absurdly tight threshold every chunk violates it, so the
    schedule must walk down to the floor of 1."""
    text = _auto_params(err_warn="1e-18")
    params = Parameters.from_string(text)
    summary = run_simulation(params, out_dir=str(tmp_path / "results"),
                             verbose=False)
    assert summary.n_stab == 1


def test_auto_n_stab_resumes_with_adapted_value(tmp_path):
    """A checkpointed auto-n_stab run must resume with the ADAPTED value
    (the stack shape depends on it), not the start value."""
    text = _auto_params(err_warn="1e-6", extra_sim="checkpoint_every = 1")
    params = Parameters.from_string(text)
    out = str(tmp_path / "results")
    s1 = run_simulation(params, out_dir=out, verbose=False)
    assert s1.n_stab > 3
    # rerun: resumes from the completed-run checkpoint with adapted n_stab
    # (and must NOT re-thermalize: therm phase is recorded done)
    s2 = run_simulation(params, out_dir=out, verbose=False)
    assert s2.n_stab == s1.n_stab
    assert s2.therm_seconds < s1.therm_seconds / 2


def test_df32_driver_end_to_end(tmp_path):
    """dtype = df32 runs the full driver pipeline (therm, measurement,
    unequal-time, h5 output) on the hybrid parity engine, and its
    physics agrees with the f64 run at statistical-noise level."""
    base = """
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
dtype = df32
[walkers]
n_walkers = 2
"""
    params = Parameters.from_string(base)
    out = str(tmp_path / "results")
    summary = run_simulation(params, out_dir=out, verbose=False)
    assert 0.05 < summary.acc_rate < 0.95
    assert np.isfinite(summary.max_precision_error)
    with h5py.File(os.path.join(out, "data_0.h5")) as f:
        bins = sorted(k for k in f if k.startswith("bin_"))
        assert len(bins) == 3
        dens = float(np.asarray(f[bins[0]]["scalar"]["density"]).ravel()[0])
        assert 0.5 < dens < 1.5      # near half filling at mu=0
        assert "greenTau" in f[bins[0]]["unequaltime"]


def test_auto_n_stab_tightens_mid_measurement(tmp_path):
    """The measurement phase feeds the per-bin chunk error back too
    (VERDICT round-2 item 8): with no thermalization to adapt in and an
    unreachable threshold, every bin boundary must tighten n_stab by one
    and reseat the stack — without corrupting already-written bins."""
    import h5py
    text = _auto_params(err_warn="1e-18", n_therms=2, n_stab_start=4)
    text = text.replace("n_bins = 1", "n_bins = 3")
    params = Parameters.from_string(text)
    out = str(tmp_path / "results")
    summary = run_simulation(params, out_dir=out, verbose=False)
    # therm too short for adapt marks (needs >= 4); bins 0 and 1 tighten
    # (the final bin never does: nothing left to re-jit for)
    assert summary.n_stab == 2, summary.n_stab
    with h5py.File(os.path.join(out, "data_0.h5")) as f:
        for b in range(3):
            d = float(np.asarray(f[f"/bin_{b}/scalar/density"]))
            assert np.isfinite(d) and 0.0 < d < 2.0, (b, d)
