"""Parallel-tempering tests: pairing parity vs the reference formula,
exchange correctness (actions, shared coin, state selection), exact-swap
invariants, and multi-device sharding equivalence on the faked 8-CPU mesh."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqmc_tpu.config import Parameters
from dqmc_tpu.engine import EngineConfig, init_state, sweep_pair
from dqmc_tpu.engine.sweep import rebuild_stack_and_greens
from dqmc_tpu.lattice import square_lattice
from dqmc_tpu.models import AttractiveHubbard
from dqmc_tpu.parallel import make_mesh, replica_exchange, shard_walkers, stack_models
from dqmc_tpu.parallel.tempering import partner_indices


def ref_partner_rank(rank, world_size, exchange_attempt):
    """Direct port of update.cpp:34-45 semantics for cross-checking."""
    is_even_attempt = exchange_attempt % 2 == 0
    if is_even_attempt:
        offset = 1 if rank % 2 == 0 else -1
    else:
        offset = -1 if rank % 2 == 0 else 1
    return (rank + offset + world_size) % world_size


def test_partner_indices_match_reference():
    for world in (2, 4, 6, 8):
        for attempt in range(1, 5):
            got = np.asarray(partner_indices(world, attempt))
            want = [ref_partner_rank(r, world, attempt) for r in range(world)]
            np.testing.assert_array_equal(got, want)
            # pairing is an involution
            np.testing.assert_array_equal(got[got], np.arange(world))


def _pt_setup(betas=(2.0, 1.0), L=2, nt=8, n_stab=2, U=4.0, seed=0):
    lat = square_lattice(L, L)
    models = stack_models([
        AttractiveHubbard.build(lat, U=U, t=1.0, mu=-0.1, beta=b, nt=nt)
        for b in betas])
    cfg = EngineConfig(nt=nt, n_stab=n_stab)
    states = jax.vmap(lambda m, k: init_state(m, cfg, k))(
        models, jax.random.split(jax.random.PRNGKey(seed), len(betas)))
    return models, cfg, states


def test_equal_beta_exchange_always_swaps():
    """Identical betas => dS = 0 => every attempt accepts and the fields are
    exactly swapped."""
    models, cfg, states = _pt_setup(betas=(2.0, 2.0))
    f_before = np.asarray(states.fields)
    states2, accept = replica_exchange(models, cfg, states, jnp.asarray(1),
                                       jax.random.PRNGKey(5))
    assert bool(jnp.all(accept))
    np.testing.assert_array_equal(np.asarray(states2.fields),
                                  f_before[[1, 0]])
    # G and log_det consistent with the adopted fields
    _, G_expect, ld_expect = rebuild_stack_and_greens(
        jax.tree_util.tree_map(lambda x: x[0], models), cfg,
        states2.fields[0])
    np.testing.assert_allclose(np.asarray(states2.G[0]), np.asarray(G_expect),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(states2.log_det_M[0]),
                               np.asarray(ld_expect), atol=1e-10)


def test_exchange_joint_action_math():
    """dS must equal the recomputed joint action difference, and rejection
    must preserve the original state exactly."""
    models, cfg, states = _pt_setup(betas=(4.0, 0.5), seed=3)

    action = jax.vmap(lambda m, f, ld: m.global_action(f, ld))
    S_self = np.asarray(action(models, states.fields, states.log_det_M))
    fields_sw = states.fields[jnp.asarray([1, 0])]
    _, _, ld_x = jax.vmap(lambda m, f: rebuild_stack_and_greens(m, cfg, f))(
        models, fields_sw)
    S_cross = np.asarray(action(models, fields_sw, ld_x))
    dS = S_cross.sum() - S_self.sum()

    # scan keys until we see both outcomes, verifying each against dS
    seen = set()
    for i in range(40):
        key = jax.random.PRNGKey(100 + i)
        states2, accept = replica_exchange(models, cfg, states,
                                           jnp.asarray(1), key)
        acc = bool(accept[0])
        assert bool(accept[1]) == acc  # pair shares one decision
        u = float(jax.random.uniform(key, (2,), dtype=jnp.float64)[0])
        assert acc == (u < np.exp(-dS))
        if not acc:
            np.testing.assert_array_equal(np.asarray(states2.fields),
                                          np.asarray(states.fields))
            np.testing.assert_allclose(np.asarray(states2.G),
                                       np.asarray(states.G), atol=0)
        else:
            np.testing.assert_array_equal(np.asarray(states2.fields),
                                          np.asarray(fields_sw))
        seen.add(acc)
        if len(seen) == 2:
            break
    # at least the deterministic branch must be exercised
    assert len(seen) >= 1


def test_exchange_sharded_matches_single_device():
    """Replica axis sharded over the faked 8-device CPU mesh must produce
    bit-identical results to the unsharded computation (XLA lowers the
    permutation to collective-permute)."""
    assert jax.device_count() >= 8, "conftest should fake 8 cpu devices"
    betas = (4.0, 3.5, 3.0, 2.5, 2.0, 1.5, 1.0, 0.5)
    models, cfg, states = _pt_setup(betas=betas, seed=1)

    s1, acc1 = replica_exchange(models, cfg, states, jnp.asarray(2),
                                jax.random.PRNGKey(9))

    mesh = make_mesh(8, axis="replica")
    models_sh = shard_walkers(models, mesh, "replica")
    states_sh = shard_walkers(states, mesh, "replica")
    s2, acc2 = replica_exchange(models_sh, cfg, states_sh, jnp.asarray(2),
                                jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(acc1), np.asarray(acc2))
    np.testing.assert_array_equal(np.asarray(s1.fields), np.asarray(s2.fields))
    np.testing.assert_allclose(np.asarray(s1.G), np.asarray(s2.G), atol=1e-12)


def test_pt_driver_end_to_end(tmp_path):
    cfgtext = """
[Lattice]
L1 = 2
L2 = 2
[hubbard]
U = 4.0
t = 1.0
mu = 0.0
[simulation]
beta = 2.0
nt = 8
n_therms = 4
n_sweeps = 2
n_bins = 2
n_stab = 2
symmetric = false
isMeasureUnequalTime = false
seed = 3
dtype = float64
[ParallelTempering]
enabled = true
sweep_steps = 2
betas = 2.0, 1.5, 1.0, 0.5
"""
    params = Parameters.from_string(cfgtext)
    from dqmc_tpu.run import run_simulation
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        summary = run_simulation(params, out_dir=str(tmp_path / "results"),
                                 verbose=False)
    finally:
        os.chdir(cwd)
    assert summary.n_walkers == 4
    assert summary.exchange_rate is not None
    assert 0.0 <= summary.exchange_rate <= 1.0
    assert summary.max_precision_error < 1e-8
    for r in range(4):
        assert (tmp_path / "results" / f"data_{r}.h5").exists()


def test_exchange_swaps_sign_with_configuration():
    """Regression: the Metropolis sign belongs to the configuration and
    must travel with the fields on an accepted swap (a stale sign corrupts
    every subsequent sign-weighted bin for sign-prone replicas)."""
    import dataclasses

    from dqmc_tpu.lattice import square_lattice
    from dqmc_tpu.models import RepulsiveHubbard
    from dqmc_tpu.parallel.tempering import (partner_indices,
                                             replica_exchange)
    from dqmc_tpu.parallel.walkers import stack_models

    lat = square_lattice(2, 2)
    cfg = EngineConfig(nt=4, n_stab=2)
    # equal betas => dS = 0 => every exchange accepts
    models = stack_models([
        RepulsiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.3, beta=2.0, nt=4,
                               dtype=jnp.float64) for _ in range(2)])
    states = jax.vmap(lambda m, k: init_state(m, cfg, k))(
        models, jax.random.split(jax.random.PRNGKey(2), 2))
    states = dataclasses.replace(
        states, sign=jnp.asarray([1.0, -1.0], jnp.float64))
    attempt = jnp.asarray(1)
    out, accept = replica_exchange(models, cfg, states, attempt,
                                   jax.random.PRNGKey(5))
    assert bool(jnp.all(accept))
    partner = np.asarray(partner_indices(2, 1))
    np.testing.assert_array_equal(np.asarray(out.fields),
                                  np.asarray(states.fields)[partner])
    np.testing.assert_array_equal(np.asarray(out.sign),
                                  np.asarray(states.sign)[partner])


def test_pt_driver_repulsive_end_to_end(tmp_path):
    """PT generalizes beyond the flagship model: a repulsive (2-flavor,
    det_power=1) replica ladder runs end-to-end, stays sign-free at half
    filling, and the analysis reweights by the recorded <sign> = 1."""
    cfgtext = """
[Lattice]
L1 = 2
L2 = 2
[hubbard]
model = repulsive
U = 4.0
t = 1.0
mu = 0.0
[simulation]
beta = 2.0
nt = 8
n_therms = 3
n_sweeps = 2
n_bins = 2
n_stab = 2
seed = 9
dtype = float64
[ParallelTempering]
enabled = true
sweep_steps = 2
betas = 2.0, 1.0
"""
    params = Parameters.from_string(cfgtext)
    from dqmc_tpu.run import run_simulation
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        summary = run_simulation(params, out_dir=str(tmp_path / "results"),
                                 verbose=False)
    finally:
        os.chdir(cwd)
    assert summary.n_walkers == 2
    assert summary.max_precision_error < 1e-8
    import h5py
    with h5py.File(tmp_path / "results" / "data_0.h5") as f:
        assert float(f["bin_0/scalar/sign"][()][0]) == 1.0
        assert "bin_0/scalar/density" in f


def test_f64_actions_match_f64_chain_decisions():
    """An f32 chain with f64_actions=True must make the same exchange
    decisions as an all-f64 replica set holding the same fields (the f32
    log-det bias documented in NOTES.md is thereby removed)."""
    betas = (2.0, 1.0, 3.0, 1.5)
    lat = square_lattice(2, 2)
    nt, n_stab = 8, 2
    cfg = EngineConfig(nt=nt, n_stab=n_stab)

    def setup(dtype):
        models = stack_models([
            AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1, beta=b,
                                    nt=nt, dtype=dtype) for b in betas])
        states = jax.vmap(lambda m, k: init_state(m, cfg, k))(
            models, jax.random.split(jax.random.PRNGKey(3), len(betas)))
        return models, states

    m64, s64 = setup(jnp.float64)
    m32, s32 = setup(jnp.float32)
    # identical integer fields by construction (same keys); pin it
    np.testing.assert_array_equal(np.asarray(s64.fields),
                                  np.asarray(s32.fields))

    for attempt in (1, 2, 3):
        key = jax.random.PRNGKey(100 + attempt)
        s64, acc64 = replica_exchange(m64, cfg, s64, jnp.asarray(attempt),
                                      key)
        s32, acc32 = replica_exchange(m32, cfg, s32, jnp.asarray(attempt),
                                      key, f64_actions=True)
        np.testing.assert_array_equal(np.asarray(acc64), np.asarray(acc32))
        np.testing.assert_array_equal(np.asarray(s64.fields),
                                      np.asarray(s32.fields))
        assert s32.G.dtype == jnp.float32  # chain dtype preserved


def test_pt_driver_spool_sink_matches_h5(tmp_path):
    """PT runs can use the async C++ spool sink; the converted HDF5 must be
    identical to the synchronous h5 sink's output."""
    import h5py
    from dqmc_tpu.config import Parameters
    from dqmc_tpu.run import run_simulation

    base = """
[Lattice]
L1 = 2
L2 = 2
[hubbard]
U = 4.0
t = 1.0
mu = 0.0
[simulation]
beta = 2.0
nt = 8
n_therms = 1
n_sweeps = 2
n_bins = 2
n_stab = 4
seed = 9
dtype = float64
[ParallelTempering]
enabled = true
sweep_steps = 2
betas = 1.5, 2.5
[io]
sink = %s
"""
    outs = {}
    for sink in ("h5", "spool"):
        d = tmp_path / sink
        d.mkdir()
        run_simulation(Parameters.from_string(base % sink),
                       out_dir=str(d / "results"), verbose=False)
        data = {}
        for r in range(2):
            with h5py.File(d / "results" / f"data_{r}.h5") as f:
                f.visititems(lambda n, o: data.__setitem__(
                    f"{r}/{n}", np.asarray(o[...]))
                    if isinstance(o, h5py.Dataset) else None)
        outs[sink] = data
    assert outs["h5"].keys() == outs["spool"].keys()
    for k in outs["h5"]:
        np.testing.assert_allclose(outs["h5"][k], outs["spool"][k],
                                   rtol=0, atol=1e-13, err_msg=k)


# ----------------------------------------------------------------------
# df32 parity-grade PT (replica_exchange_df)
# ----------------------------------------------------------------------

def _df_pt_setup(betas, L=2, nt=8, n_stab=2, seed=3):
    from dqmc_tpu.engine.df_sweep import df_aux_build, init_state_df
    lat = square_lattice(L, L)
    cfg = EngineConfig(nt=nt, n_stab=n_stab)
    m32 = stack_models([
        AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1, beta=b, nt=nt,
                                dtype=jnp.float32) for b in betas])
    auxs = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[df_aux_build(lat, U=4.0, t=1.0, mu=-0.1, beta=b, nt=nt)
          for b in betas])
    states = jax.vmap(lambda m, a, k: init_state_df(m, a, cfg, k))(
        m32, auxs, jax.random.split(jax.random.PRNGKey(seed), len(betas)))
    return lat, cfg, m32, auxs, states


def test_df_exchange_matches_f64_chain_decisions():
    """df32 replica exchange must make the same decisions as an all-f64
    replica set holding the same fields: the df actions (df log-det +
    exact state-count bosonic dot) agree with f64 to ~1e-8, far inside
    any decision boundary at these seeds."""
    from dqmc_tpu.parallel.tempering import replica_exchange_df
    betas = (2.0, 1.0, 3.0, 1.5)
    lat, cfg, m32, auxs, s_df = _df_pt_setup(betas)
    m64 = stack_models([
        AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1, beta=b,
                                nt=cfg.nt, dtype=jnp.float64)
        for b in betas])
    s64 = jax.vmap(lambda m, k: init_state(m, cfg, k))(
        m64, jax.random.split(jax.random.PRNGKey(3), len(betas)))
    np.testing.assert_array_equal(np.asarray(s64.fields),
                                  np.asarray(s_df.fields))

    for attempt in (1, 2, 3):
        key = jax.random.PRNGKey(200 + attempt)
        s64, acc64 = replica_exchange(m64, cfg, s64, jnp.asarray(attempt),
                                      key)
        s_df, accdf = replica_exchange_df(auxs, cfg, s_df,
                                          jnp.asarray(attempt), key)
        np.testing.assert_array_equal(np.asarray(acc64), np.asarray(accdf))
        np.testing.assert_array_equal(np.asarray(s64.fields),
                                      np.asarray(s_df.fields))
        assert s_df.G.dtype == jnp.float32


def test_df_exchange_action_accuracy():
    """The df action itself must agree with the f64 global_action on the
    same fields to ~1e-6 absolute (limited by the df log-det's refined
    f32-QR diagonal, not the bosonic part) — six orders below the f32
    chain's O(1..10) log-det bias."""
    from dqmc_tpu.engine.df_sweep import df_global_action
    from dqmc_tpu.engine.sweep import rebuild_stack_and_greens
    betas = (3.0, 1.5)
    lat, cfg, m32, auxs, s_df = _df_pt_setup(betas)
    m64 = stack_models([
        AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1, beta=b,
                                nt=cfg.nt, dtype=jnp.float64)
        for b in betas])
    _, _, ld64 = jax.vmap(
        lambda m, f: rebuild_stack_and_greens(m, cfg, f))(m64, s_df.fields)
    S64 = np.asarray(jax.vmap(lambda m, f, ld: m.global_action(f, ld))(
        m64, s_df.fields, ld64))
    Sdf = np.asarray(jax.vmap(
        lambda a, f, ld: df_global_action(a, f, ld))(
            auxs, s_df.fields, s_df.log_det_M))
    np.testing.assert_allclose(Sdf, S64, rtol=0, atol=5e-6)


def test_pt_driver_df32_end_to_end(tmp_path):
    cfgtext = """
[Lattice]
L1 = 2
L2 = 2
[hubbard]
U = 4.0
t = 1.0
mu = 0.0
[simulation]
beta = 2.0
nt = 8
n_therms = 2
n_sweeps = 2
n_bins = 2
n_stab = 2
seed = 7
dtype = df32
site_update = scan
[ParallelTempering]
enabled = true
sweep_steps = 2
betas = 2.0, 1.0
"""
    params = Parameters.from_string(cfgtext)
    from dqmc_tpu.run import run_simulation
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        summary = run_simulation(params, out_dir=str(tmp_path / "results"),
                                 verbose=False)
    finally:
        os.chdir(cwd)
    assert summary.n_walkers == 2
    assert 0.0 <= summary.exchange_rate <= 1.0
    for r in range(2):
        assert (tmp_path / "results" / f"data_{r}.h5").exists()


def test_stacked_greens_fn_matches_per_replica():
    """The replica-stacked tier rebuild (measurement_greens_fn_stacked)
    must equal the single-model tier applied per replica — the only
    arithmetic difference is the in-graph expV table (traced g), which
    is f64-exp-exact to ~1 ulp."""
    from dqmc_tpu.engine.parity import (measurement_greens_fn,
                                        measurement_greens_fn_stacked)
    from dqmc_tpu.ops import df32 as nm
    from dqmc_tpu import hsfield

    lat = square_lattice(4, 4)
    betas = [2.0, 1.5]
    nt, n_stab = 8, 2
    models64 = [AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1,
                                        beta=b, nt=nt, dtype=jnp.float64)
                for b in betas]
    stacked = stack_models(models64)
    cfg = EngineConfig(nt=nt, n_stab=n_stab)
    key = jax.random.PRNGKey(7)
    fields = jnp.stack([
        hsfield.init_fields(jax.random.fold_in(key, r), nt, lat.n_sites)
        for r in range(len(betas))])

    class _S:
        pass

    s = _S()
    s.fields = fields
    G_stacked = np.asarray(measurement_greens_fn_stacked(
        stacked, cfg, nm)(s))

    for r, m64 in enumerate(models64):
        sr = _S()
        sr.fields = fields[r][None]
        G_r = np.asarray(measurement_greens_fn(m64, cfg, nm)(sr))[0]
        assert np.abs(G_stacked[r] - G_r).max() < 1e-10, (
            r, np.abs(G_stacked[r] - G_r).max())


def test_pt_driver_measure_precision_end_to_end(tmp_path):
    """PT with measure_precision=df32 (VERDICT r4 item 2): same seed and
    engine dtype sample the identical trajectory, so the tier-measured
    bins must track the f64-engine-measured bins at tier grade — and
    must not be bit-identical (that would mean the tier isn't wired)."""
    base = """
[Lattice]
L1 = 2
L2 = 2
[hubbard]
U = 4.0
t = 1.0
mu = 0.0
[simulation]
beta = 2.0
nt = 8
n_therms = 4
n_sweeps = 2
n_bins = 2
n_stab = 2
symmetric = false
isMeasureUnequalTime = false
seed = 3
dtype = float64
%s
[ParallelTempering]
enabled = true
sweep_steps = 2
betas = 2.0, 1.5
"""
    from dqmc_tpu.run import run_simulation
    from dqmc_tpu.analysis.cli import load_bins
    cwd = os.getcwd()
    dirs = {}
    for tag, extra in (("engine", ""), ("tier", "measure_precision = df32")):
        out = tmp_path / tag
        out.mkdir()
        os.chdir(out)
        try:
            summary = run_simulation(
                Parameters.from_string(base % extra),
                out_dir=str(out / "results"), verbose=False)
        finally:
            os.chdir(cwd)
        assert summary.exchange_rate is not None
        dirs[tag] = str(out / "results")

    se, _, _, _, _ = load_bins(dirs["engine"], True)
    st, _, _, _, _ = load_bins(dirs["tier"], True)
    for name in se:
        a, b = np.asarray(se[name]), np.asarray(st[name])
        d = np.abs(a - b).max()
        # same trajectory, different measurement grade: tier-level
        # agreement (df32 ~1e-8; CPU-jit multiword corruption can cost
        # a few orders at tiny scale — still far under physics noise)
        assert d < 1e-3, (name, d)
    d_density = np.abs(np.asarray(se["density"])
                       - np.asarray(st["density"])).max()
    assert d_density > 0.0, "tier bins bit-identical to engine bins " \
                            "— measure_precision not actually wired"
