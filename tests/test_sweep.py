"""Engine integration tests: stack initialization vs f64 goldens, U=0
free-fermion exactness, Sherman–Morrison vs full recomputation, detailed
balance (local ratio == exp(-dS) from the global action), and sweep
self-consistency (stabilization error stays at f64 noise)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import golden
from dqmc_tpu import hsfield
from dqmc_tpu.engine import EngineConfig, init_state, rebuild_stack_and_greens, sweep, sweep_pair
from dqmc_tpu.lattice import square_lattice
from dqmc_tpu.models import AttractiveHubbard, build_kinetic_matrix


def setup(L=4, U=4.0, beta=2.0, nt=8, n_stab=2, mu=-0.1):
    lat = square_lattice(L, L)
    model = AttractiveHubbard.build(lat, U=U, t=1.0, mu=mu, beta=beta, nt=nt)
    cfg = EngineConfig(nt=nt, n_stab=n_stab)
    return lat, model, cfg


def test_rebuild_vs_golden(rng):
    """G(0,0) from the jitted stack rebuild must match the scipy
    pivoted-QR golden chain on the same random field configuration."""
    lat, model, cfg = setup(L=4, beta=4.0, nt=16, n_stab=4)
    ns = lat.n_sites
    fields = jnp.asarray(rng.integers(0, 4, (16, ns)), dtype=jnp.int32)

    stack, G, log_det = rebuild_stack_and_greens(model, cfg, fields)

    F = golden.to_ldr(np.eye(ns))
    for i_stack in reversed(range(cfg.n_stack)):
        Bbar = np.eye(ns)
        for loc in range(cfg.loc_l_end(i_stack) + 1):
            l = i_stack * cfg.n_stab + loc
            Bbar = np.asarray(model.B_of(fields[l])[0]) @ Bbar
        F = golden.ldr_mul_ldr(F, golden.to_ldr(Bbar)) if i_stack < cfg.n_stack - 1 \
            else golden.to_ldr(Bbar)
    G_gold, ld_gold = golden.inv_one_plus_ldr(F)
    np.testing.assert_allclose(np.asarray(G[0]), G_gold, atol=1e-11)
    np.testing.assert_allclose(float(log_det[0]), ld_gold, rtol=1e-10)


@pytest.mark.parametrize("nt,n_stab", [(8, 2), (10, 4)])  # incl. nt % n_stab != 0
def test_free_fermion_sweeps(nt, n_stab):
    """U=0: G is never modified by updates (delta=0), so after any number of
    sweeps G must equal the analytic [I + e^{-beta K}]^{-1} and the
    stabilization error must sit at f64 noise."""
    lat, model, cfg = setup(L=4, U=0.0, beta=2.0, nt=nt, n_stab=n_stab)
    K = build_kinetic_matrix(lat, t=1.0, mu=-0.1)
    state = init_state(model, cfg, jax.random.PRNGKey(0))

    G_exact = golden.free_fermion_gtt(K, 2.0)
    np.testing.assert_allclose(np.asarray(state.G[0]), G_exact, atol=1e-12)
    np.testing.assert_allclose(float(state.log_det_M[0]),
                               golden.free_fermion_logdet(K, 2.0), rtol=1e-12)

    for _ in range(3):
        state = sweep_pair(model, cfg, state)
    np.testing.assert_allclose(np.asarray(state.G[0]), G_exact, atol=1e-11)
    assert float(state.err_max) < 1e-11
    # acceptance is gammaR-driven at U=0 but must be a sane fraction
    assert 0.0 < float(state.acc_sum) / 6.0 < 1.0


def test_interacting_sweep_stability():
    lat, model, cfg = setup(L=4, U=4.0, beta=4.0, nt=40, n_stab=5)
    state = init_state(model, cfg, jax.random.PRNGKey(1))
    for _ in range(3):
        state = sweep_pair(model, cfg, state)
    # 6 sweeps happened; acceptance fraction averaged per sweep
    acc = float(state.acc_sum) / 6.0
    assert 0.05 < acc < 0.95
    assert float(state.err_max) < 1e-9
    assert float(state.err_count) == 6 * cfg.n_stack
    # fields actually moved
    state0 = init_state(model, cfg, jax.random.PRNGKey(1))
    assert int((state.fields != state0.fields).sum()) > 0


def test_sherman_morrison_vs_recompute(rng):
    """An accepted flip's rank-1 G update must equal G recomputed from
    scratch with the flipped field (model.cpp:124-138 semantics)."""
    lat, model, cfg = setup(L=4, beta=2.0, nt=8, n_stab=2)
    ns = lat.n_sites
    fields = jnp.asarray(rng.integers(0, 4, (8, ns)), dtype=jnp.int32)
    _, G00, _ = rebuild_stack_and_greens(model, cfg, fields)

    # propagate to G(1) with pre-update fields
    B, invB = model.B_mats(fields[0])
    G1 = B @ G00 @ invB

    i = 5
    old = int(fields[0, i])
    new = (old + 1) % 4
    gammaR, bosonR, delta = model.update_factors(jnp.asarray(old), jnp.asarray(new))
    r = 1.0 + (1.0 - G1[0, i, i]) * delta[0]
    prefac = delta[0] / r
    e_i = jnp.zeros(ns, dtype=G1.dtype).at[i].set(1.0)
    G1_sm = G1[0] + prefac * jnp.outer(G1[0][:, i], G1[0][i, :] - e_i)

    fields_new = fields.at[0, i].set(new)
    _, G00_new, _ = rebuild_stack_and_greens(model, cfg, fields_new)
    B_new, invB_new = model.B_mats(fields_new[0])
    G1_scratch = (B_new @ G00_new @ invB_new)[0]
    np.testing.assert_allclose(np.asarray(G1_sm), np.asarray(G1_scratch),
                               atol=1e-10)


def test_detailed_balance_ratio(rng):
    """|R| from the local-update formula must equal exp(-(S_new - S_old))
    with S the global action recomputed from scratch — the exactness
    property the Markov chain's correctness rests on."""
    lat, model, cfg = setup(L=4, U=4.0, beta=2.0, nt=8, n_stab=2)
    ns = lat.n_sites
    fields = jnp.asarray(rng.integers(0, 4, (8, ns)), dtype=jnp.int32)
    _, G00, log_det = rebuild_stack_and_greens(model, cfg, fields)
    B, invB = model.B_mats(fields[0])
    G1 = B @ G00 @ invB

    for i, shift in [(0, 1), (7, 2), (11, 3)]:
        old = int(fields[0, i])
        new = (old + shift) % 4
        gammaR, bosonR, delta = model.update_factors(jnp.asarray(old),
                                                     jnp.asarray(new))
        r_flv = 1.0 + (1.0 - G1[:, i, i]) * delta
        R = float(gammaR * bosonR * jnp.prod(r_flv) ** model.det_power)

        S_old = float(model.global_action(fields, log_det))
        fields_new = fields.at[0, i].set(new)
        _, _, log_det_new = rebuild_stack_and_greens(model, cfg, fields_new)
        S_new = float(model.global_action(fields_new, log_det_new))
        np.testing.assert_allclose(abs(R), np.exp(-(S_new - S_old)), rtol=1e-8)


def test_forward_backward_roundtrip_consistency():
    """After forward+backward with update=False, G returns to G(0,0) of the
    unchanged fields."""
    lat, model, cfg = setup(L=4, U=4.0, beta=2.0, nt=8, n_stab=2)
    state = init_state(model, cfg, jax.random.PRNGKey(2))
    G0 = np.asarray(state.G)
    state = sweep(model, cfg, state, forward=True, update=False)
    state = sweep(model, cfg, state, forward=False, update=False)
    np.testing.assert_allclose(np.asarray(state.G), G0, atol=1e-10)
    assert float(state.err_max) < 1e-9


def test_vmap_walkers():
    """The whole sweep must vmap over a walker axis."""
    lat, model, cfg = setup(L=4, U=4.0, beta=2.0, nt=8, n_stab=2)
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    states = jax.vmap(lambda k: init_state(model, cfg, k))(keys)
    step = jax.jit(jax.vmap(lambda s: sweep_pair(model, cfg, s)))
    states = step(states)
    assert states.G.shape == (4, 1, 16, 16)
    assert float(jnp.max(states.err_max)) < 1e-9
    # walkers decorrelated
    assert int((states.fields[0] != states.fields[1]).sum()) > 0
