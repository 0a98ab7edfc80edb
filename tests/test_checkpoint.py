"""Checkpoint/resume: exact state roundtrip, interrupted-run continuation
producing the same bins as an uninterrupted run, and corruption safety."""

import os

import h5py
import jax
import numpy as np
import pytest

from dqmc_tpu.config import Parameters
from dqmc_tpu.engine import EngineConfig, init_state, sweep_pair
from dqmc_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from dqmc_tpu.lattice import square_lattice
from dqmc_tpu.models import AttractiveHubbard
from dqmc_tpu.run import run_simulation

BASE = """
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
n_therms = 5
n_sweeps = 2
n_bins = {n_bins}
n_stab = 2
symmetric = false
isMeasureUnequalTime = false
seed = 21
dtype = float64
checkpoint_every = 1
"""


def test_state_roundtrip(tmp_path):
    lat = square_lattice(4, 4)
    model = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=0.0, beta=2.0, nt=8)
    cfg = EngineConfig(nt=8, n_stab=2)
    state = sweep_pair(model, cfg, init_state(model, cfg, jax.random.PRNGKey(0)))
    path = tmp_path / "ck.npz"
    save_checkpoint(path, state, {"bin": 3})
    template = init_state(model, cfg, jax.random.PRNGKey(1))
    restored, meta = load_checkpoint(path, template)
    assert meta["bin"] == 3
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # continuing from the restored state reproduces the original chain
    s1 = sweep_pair(model, cfg, state)
    s2 = sweep_pair(model, cfg, restored)
    np.testing.assert_array_equal(np.asarray(s1.fields), np.asarray(s2.fields))


def test_shape_mismatch_rejected(tmp_path):
    lat = square_lattice(4, 4)
    model = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=0.0, beta=2.0, nt=8)
    cfg = EngineConfig(nt=8, n_stab=2)
    state = init_state(model, cfg, jax.random.PRNGKey(0))
    path = tmp_path / "ck.npz"
    save_checkpoint(path, state, {"bin": 0})
    cfg2 = EngineConfig(nt=4, n_stab=2)
    model2 = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=0.0, beta=2.0, nt=4)
    template = init_state(model2, cfg2, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="shape"):
        load_checkpoint(path, template)


def _run(tmp_path, n_bins, tag):
    d = tmp_path / tag
    d.mkdir()
    cwd = os.getcwd()
    os.chdir(d)
    try:
        params = Parameters.from_string(BASE.format(n_bins=n_bins))
        run_simulation(params, out_dir=str(d / "results"), verbose=False)
    finally:
        os.chdir(cwd)
    return d


def _bins(path):
    out = {}
    with h5py.File(path) as f:
        for k in sorted(f.keys()):
            if k.startswith("bin_"):
                out[k] = float(f[k]["scalar/density"][0])
    return out


def test_interrupted_run_resumes_identically(tmp_path):
    """Run 4 bins straight vs 2 bins + resume for the remaining 2: identical
    bin contents (checkpoint restores the exact chain)."""
    d_full = _run(tmp_path, 4, "full")
    full = _bins(d_full / "results" / "data_0.h5")
    assert len(full) == 4

    d_part = _run(tmp_path, 2, "part")
    part1 = _bins(d_part / "results" / "data_0.h5")
    assert len(part1) == 2
    assert (d_part / "results" / "checkpoint.npz").exists()

    # resume in the same directory with the full bin budget
    cwd = os.getcwd()
    os.chdir(d_part)
    try:
        params = Parameters.from_string(BASE.format(n_bins=4))
        run_simulation(params, out_dir=str(d_part / "results"), verbose=False)
    finally:
        os.chdir(cwd)
    resumed = _bins(d_part / "results" / "data_0.h5")
    assert len(resumed) == 4
    for k, v in full.items():
        np.testing.assert_allclose(resumed[k], v, rtol=1e-12, err_msg=k)


def test_format_version_mismatch_rejected(tmp_path):
    """A checkpoint from another format version (e.g. pre-exponent-
    channel LDRdf) fails with a diagnosis, not a raw KeyError."""
    import json

    import pytest

    from dqmc_tpu.io import checkpoint as ck

    state = {"a": np.arange(3.0)}
    path = tmp_path / "old.npz"
    ck.save_checkpoint(path, state, {"note": "x"})
    # forge an older version stamp
    with np.load(path) as data:
        payload = {k: data[k] for k in data.files}
    meta = json.loads(bytes(payload["__meta__"]).decode())
    meta["format_version"] = 1
    payload["__meta__"] = np.frombuffer(json.dumps(meta).encode(),
                                        dtype=np.uint8)
    np.savez(path, **payload)
    with pytest.raises(ValueError, match="format version"):
        ck.load_checkpoint(path, state)

    # and a leaf-count mismatch at the same version is diagnosed too
    ck.save_checkpoint(path, state, {})
    with pytest.raises(ValueError, match="leaves"):
        ck.load_checkpoint(path, {"a": np.arange(3.0),
                                  "b": np.arange(2.0)})
