"""Every shipped example config must run end-to-end (shrunk to test size).

Guards the examples against config-schema drift: each parameters.in is
rewritten with tiny lattice/sweep counts and driven through
run_simulation + the analysis CLI in a temp directory.
"""

import os
import re

import pytest

from dqmc_tpu.config import Parameters

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")

_SHRINK = {
    "L1": "4", "L2": "4", "nt": "8", "n_therms": "2", "n_sweeps": "2",
    "n_bins": "2", "n_stab": "2", "n_walkers": "2",
    "checkpoint_every": "0",
    # df32 on CPU at example scale is minutes of compile; the df32 engine
    # has its own coverage (test_df_sweep, test_end_to_end) — examples
    # test the CONFIG surface
    "dtype": "float64",
    "betas": "2.0, 1.0",
    "beta": "2.0",
}


def _shrunk(path: str) -> str:
    text = open(path).read()
    for key, val in _SHRINK.items():
        text = re.sub(rf"(?m)^({key}\s*=\s*).*$", rf"\g<1>{val}", text)
    return text


@pytest.mark.parametrize("name", sorted(os.listdir(EXAMPLES)))
def test_example_runs(name, tmp_path, monkeypatch):
    src = os.path.join(EXAMPLES, name, "parameters.in")
    if not os.path.isfile(src):
        pytest.skip("not an example dir")
    cfg = _shrunk(src)
    (tmp_path / "parameters.in").write_text(cfg)
    monkeypatch.chdir(tmp_path)

    from dqmc_tpu.run import run_simulation
    params = Parameters.from_string(cfg)
    summary = run_simulation(params, out_dir=str(tmp_path / "results"),
                             verbose=False)
    assert summary.n_bins == 2
    assert (tmp_path / "results" / "data_0.h5").exists()

    from dqmc_tpu.analysis.cli import analyze
    res = analyze(results_dir=str(tmp_path / "results"),
                  param_file=str(tmp_path / "parameters.in"),
                  out_dir=str(tmp_path), verbose=False)
    assert "density" in res
