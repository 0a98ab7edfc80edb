"""Fused propagate+update block kernel vs a pure-JAX oracle.

The oracle composes the engine's own model ops (apply_B_*,
local_update_core) with the fused sweep's key schedule, so any mismatch is
the kernel's fault, not the chain's.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dqmc_tpu.engine import EngineConfig, init_state
from dqmc_tpu.engine.fused import (fused_block, supports_fused, sweep_fused,
                                   sweep_pair_fused)
from dqmc_tpu.engine.sweep import (draw_slice_randoms, identity_slot,
                                   identity_stack, local_update_core,
                                   slot_get, slot_set, sweep)
from dqmc_tpu.lattice import square_lattice
from dqmc_tpu.models import AttractiveHubbard
from dqmc_tpu.models.kinetic import (apply_B_left, apply_B_right,
                                     apply_invB_left, apply_invB_right)


def _setup(W=2, L=4, beta=4.0, nt=12, n_stab=3, dtype=jnp.float64, seed=0):
    lat = square_lattice(L, L)
    model = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1, beta=beta,
                                    nt=nt, dtype=dtype)
    cfg = EngineConfig(nt=nt, n_stab=n_stab)
    keys = jax.random.split(jax.random.PRNGKey(seed), W)
    states = jax.vmap(lambda k: init_state(model, cfg, k))(keys)
    return model, cfg, states


def _block_oracle(model, order, props, us, G, fields_blk, forward):
    """Pure-JAX per-walker composition of one block (same stream layout as
    fused_block)."""
    W, n_slices, ns = fields_blk.shape

    def one_walker(G, fields_blk, props_w, us_w):
        nfl = G.shape[0]
        Bbar = jnp.tile(jnp.eye(ns, dtype=G.dtype), (nfl, 1, 1))
        acc = jnp.zeros((), G.dtype)
        sgn = jnp.ones((), G.dtype)
        sl = range(n_slices) if forward else range(n_slices - 1, -1, -1)
        for l in sl:
            f_l = fields_blk[l]
            if forward:
                G = apply_invB_right(model, f_l,
                                     apply_B_left(model, f_l, G))
            # the fused path indexes proposals by SITE; local_update_core
            # consumes them per VISIT — translate through the order
            G, f_l, a, s_l = local_update_core(model, G, f_l, order[l],
                                               props_w[l][order[l]], us_w[l])
            sgn = sgn * s_l
            fields_blk = fields_blk.at[l].set(f_l)
            if forward:
                Bbar = apply_B_left(model, f_l, Bbar)
            else:
                G = apply_B_right(model, f_l,
                                  apply_invB_left(model, f_l, G))
                Bbar = apply_B_right(model, f_l, Bbar)
            acc = acc + a
        return G, fields_blk, Bbar, acc / n_slices, sgn

    return jax.vmap(one_walker)(G, fields_blk, props, us)


def _streams(model, keys0, n_slices, ns, dtype, W, seed=5):
    ks = jax.random.split(jax.random.PRNGKey(seed), W * n_slices)
    ks = ks.reshape(W, n_slices, -1)
    order = jax.vmap(
        lambda k: draw_slice_randoms(k, ns, dtype)[0])(ks[0])
    props = jax.vmap(jax.vmap(
        lambda k: draw_slice_randoms(k, ns, dtype)[1]))(ks)
    us = jax.vmap(jax.vmap(
        lambda k: draw_slice_randoms(k, ns, dtype)[2]))(ks)
    return order, props, us


def test_fused_block_matches_oracle_forward():
    model, cfg, states = _setup()
    W, ns = 2, model.n_sites
    n_slices = cfg.n_stab
    order, props, us = _streams(model, None, n_slices, ns, model.dtype, W)
    fields_blk = states.fields[:, :n_slices]

    Gk, fk, bk, ak, _sk = fused_block(model, order, props, us, states.G,
                                 fields_blk, n_slices=n_slices,
                                 forward=True, interpret=True)
    Go, fo, bo, ao, _so = _block_oracle(model, order, props, us, states.G,
                                   fields_blk, True)
    np.testing.assert_array_equal(np.asarray(fk), np.asarray(fo))
    # kernel maintains G via its own dual matmul chain (not a transpose of
    # the oracle's order) => fp-reordering noise, amplified by propagation
    np.testing.assert_allclose(np.asarray(Gk), np.asarray(Go), atol=1e-9)
    np.testing.assert_allclose(np.asarray(bk), np.asarray(bo), atol=1e-11)
    np.testing.assert_allclose(np.asarray(ak), np.asarray(ao), atol=1e-12)


def test_fused_block_submatrix_matches_oracle():
    """The fused kernel's submatrix update scheme realizes the exact same
    chain as the oracle (and hence as the delayed scheme) in both sweep
    directions and at several block ranks."""
    for forward, seed in ((True, 3), (False, 4)):
        model, cfg, states = _setup(seed=seed)
        W, ns = 2, model.n_sites
        n_slices = cfg.n_stab
        order, props, us = _streams(model, None, n_slices, ns, model.dtype,
                                    W, seed=seed + 10)
        fields_blk = states.fields[:, :n_slices]
        Go, fo, bo, ao, _so = _block_oracle(model, order, props, us, states.G,
                                       fields_blk, forward)
        for k in (4, 8):
            Gk, fk, bk, ak, _sk = fused_block(model, order, props, us, states.G,
                                         fields_blk, n_slices=n_slices,
                                         k_delay=k, forward=forward,
                                         interpret=True, update="submatrix")
            np.testing.assert_array_equal(np.asarray(fk), np.asarray(fo))
            # composite Woodbury flush vs sequential rank-1: fp reordering
            # amplified by near-singular accepted moves (delta/r_flv)
            np.testing.assert_allclose(np.asarray(Gk), np.asarray(Go),
                                       atol=3e-8)
            np.testing.assert_allclose(np.asarray(bk), np.asarray(bo),
                                       atol=1e-11)
            np.testing.assert_allclose(np.asarray(ak), np.asarray(ao),
                                       atol=1e-12)


def test_sweep_fused_submatrix_matches_delayed_chain():
    """Full fused sweeps with the submatrix scheme follow the delayed
    scheme's chain exactly (fields/sign/acceptance; G to stabilized
    tolerance)."""
    model, cfg, states = _setup(nt=12, n_stab=3)
    cfg_sub = dataclasses.replace(cfg, fused_update="submatrix",
                                  submatrix_rank=8)
    s1 = sweep_pair_fused(model, cfg, states, interpret=True)
    s2 = sweep_pair_fused(model, cfg_sub, states, interpret=True)
    np.testing.assert_array_equal(np.asarray(s1.fields),
                                  np.asarray(s2.fields))
    np.testing.assert_allclose(np.asarray(s1.G), np.asarray(s2.G),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(s1.acc_sum),
                               np.asarray(s2.acc_sum), atol=1e-12)


def test_fused_block_matches_oracle_backward():
    model, cfg, states = _setup(seed=1)
    W, ns = 2, model.n_sites
    n_slices = cfg.n_stab
    order, props, us = _streams(model, None, n_slices, ns, model.dtype, W,
                                seed=9)
    fields_blk = states.fields[:, -n_slices:]

    Gk, fk, bk, ak, _sk = fused_block(model, order, props, us, states.G,
                                 fields_blk, n_slices=n_slices,
                                 forward=False, interpret=True)
    Go, fo, bo, ao, _so = _block_oracle(model, order, props, us, states.G,
                                   fields_blk, False)
    np.testing.assert_array_equal(np.asarray(fk), np.asarray(fo))
    # naive B^-1 G B propagation amplifies fp-reordering noise by ~cond(B)^2
    # per slice (measured: 7e-13 after 1 slice, x~250 per further slice);
    # the drift is identical in kind to the engine's own naive propagation
    # and is reset by stabilization — the meaningful invariants here are the
    # integer decisions (exact) and the block product (exact association)
    np.testing.assert_allclose(np.asarray(Gk), np.asarray(Go), atol=2e-6)
    np.testing.assert_allclose(np.asarray(bk), np.asarray(bo), atol=1e-10)


def _sweep_fused_oracle(model, cfg, states, forward):
    """Reimplementation of sweep_fused's chain with engine ops (no pallas):
    same key schedule, shared per-slice orders, per-walker streams,
    identical stabilization."""
    from dqmc_tpu.engine.fused import _stabilize_one

    W = states.G.shape[0]
    ns, dtype = model.n_sites, model.dtype
    n_stab, n_stack = cfg.n_stab, cfg.n_stack
    keys = jax.vmap(lambda k: jax.random.split(k, cfg.nt + 1))(states.key)
    new_key = keys[:, cfg.nt]
    slice_keys = keys[:, :cfg.nt]
    orders = jax.vmap(
        lambda k: draw_slice_randoms(k, ns, dtype)[0])(slice_keys[0])
    props = jax.vmap(jax.vmap(
        lambda k: draw_slice_randoms(k, ns, dtype)[1]))(slice_keys)
    us = jax.vmap(jax.vmap(
        lambda k: draw_slice_randoms(k, ns, dtype)[2]))(slice_keys)

    fields, G = states.fields, states.G
    log_det, acc = states.log_det_M, states.acc_sum
    # chain factor carried across blocks, opposite half-chain read from the
    # input stack, new slots collected — mirrors sweep_fused's streaming
    # stack (engine/sweep.py stack_from_slots)
    F_prev = jax.vmap(lambda _: identity_slot(model.n_flavor, ns, dtype))(
        jnp.arange(W))
    new_slots = {}
    blocks = range(n_stack) if forward else range(n_stack - 1, -1, -1)
    for i_stack in blocks:
        l0 = i_stack * n_stab
        fb = fields[:, l0:l0 + n_stab]          # python slice clamps the
        n_blk = fb.shape[1]                     # ragged tail block
        G, fb, bbar, acc_b, _s = _block_oracle(
            model, orders[l0:l0 + n_stab],
            props[:, l0:l0 + n_stab], us[:, l0:l0 + n_stab], G, fb, forward)
        fields = fields.at[:, l0:l0 + n_stab].set(fb)
        other = jax.vmap(lambda st: slot_get(
            st, i_stack + (2 if forward else 0)))(states.stack)
        G, F_prev, log_det, err = jax.vmap(
            lambda g, f, o, b: _stabilize_one(g, f, o, b, forward))(
                G, F_prev, other, bbar)
        new_slots[i_stack + 1] = F_prev
        acc = acc + acc_b * (n_blk / cfg.nt)
    # assemble: identity padding + the written slots (1..n_stack all written)
    stack = jax.vmap(
        lambda _: identity_stack(model.n_flavor, cfg.n_slots, ns, dtype))(
        jnp.arange(W))
    for slot, F in new_slots.items():
        stack = jax.vmap(lambda st, f: slot_set(st, slot, f))(stack, F)
    return dataclasses.replace(states, fields=fields, G=G, stack=stack,
                               log_det_M=log_det, key=new_key, acc_sum=acc)


def test_sweep_fused_matches_oracle():
    model, cfg, states = _setup(seed=2)
    got = sweep_fused(model, cfg, states, forward=True, interpret=True)
    want = _sweep_fused_oracle(model, cfg, states, True)
    np.testing.assert_array_equal(np.asarray(got.fields),
                                  np.asarray(want.fields))
    np.testing.assert_allclose(np.asarray(got.G), np.asarray(want.G),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(got.log_det_M),
                               np.asarray(want.log_det_M), rtol=1e-12)

    got_b = sweep_fused(model, cfg, got, forward=False, interpret=True)
    want_b = _sweep_fused_oracle(model, cfg, want, False)
    np.testing.assert_array_equal(np.asarray(got_b.fields),
                                  np.asarray(want_b.fields))
    np.testing.assert_allclose(np.asarray(got_b.G), np.asarray(want_b.G),
                               atol=1e-11)


def test_sweep_pair_fused_stays_stable():
    """Several fused sweep-pairs keep the self-check error at f64 noise and
    a sane acceptance rate."""
    model, cfg, states = _setup(W=2, L=4, beta=4.0, nt=20, n_stab=5, seed=3)
    for _ in range(3):
        states = sweep_pair_fused(model, cfg, states, interpret=True)
    assert np.isfinite(np.asarray(states.G)).all()
    # naive-propagation drift at dtau=0.2, n_stab=5 sits at ~1e-6 on the
    # unfused rank-1 path; the fused kernel measures ~4e-8 here
    assert float(jnp.max(states.err_max)) < 1e-6
    acc = float(jnp.mean(states.acc_sum)) / 6.0
    assert 0.2 < acc < 0.9


def test_supports_fused_gating():
    model, cfg, _ = _setup()
    assert supports_fused(model, cfg)
    # ragged nt % n_stab != 0 handled by a separately-compiled tail block
    assert supports_fused(model, EngineConfig(nt=13, n_stab=5))


def test_sweep_fused_ragged_matches_oracle():
    """nt % n_stab != 0: the short tail block (dqmc.cpp:14-18) must realize
    the identical chain in both sweep directions."""
    model, cfg, states = _setup(nt=13, n_stab=5, seed=4)
    got = sweep_fused(model, cfg, states, forward=True, interpret=True)
    want = _sweep_fused_oracle(model, cfg, states, True)
    np.testing.assert_array_equal(np.asarray(got.fields),
                                  np.asarray(want.fields))
    np.testing.assert_allclose(np.asarray(got.G), np.asarray(want.G),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(got.acc_sum),
                               np.asarray(want.acc_sum), rtol=1e-12)

    got_b = sweep_fused(model, cfg, got, forward=False, interpret=True)
    want_b = _sweep_fused_oracle(model, cfg, want, False)
    np.testing.assert_array_equal(np.asarray(got_b.fields),
                                  np.asarray(want_b.fields))
    np.testing.assert_allclose(np.asarray(got_b.G), np.asarray(want_b.G),
                               atol=1e-11)


def _setup_repulsive(W=2, L=4, beta=3.0, nt=12, n_stab=3,
                     dtype=jnp.float64, seed=0, mu=0.0):
    from dqmc_tpu.models import RepulsiveHubbard
    lat = square_lattice(L, L)
    model = RepulsiveHubbard.build(lat, U=4.0, t=1.0, mu=mu, beta=beta,
                                   nt=nt, dtype=dtype)
    cfg = EngineConfig(nt=nt, n_stab=n_stab)
    keys = jax.random.split(jax.random.PRNGKey(seed), W)
    states = jax.vmap(lambda k: init_state(model, cfg, k))(keys)
    return model, cfg, states


def test_fused_block_2flavor_matches_oracle():
    """The 2-flavor fused kernel (both flavor chains resident, decisions
    coupled through R = gb * r_up * r_dn, per-walker sign tracking) must
    reproduce the flavor-generic sequential oracle exactly — fields,
    both flavors' G/Bbar, acceptance, AND the Metropolis sign (exercised
    away from half filling, where R goes negative)."""
    for forward, mu in ((True, 0.0), (False, 0.0), (True, -0.8)):
        model, cfg, states = _setup_repulsive(mu=mu, seed=3 if mu else 0)
        W, ns = 2, model.n_sites
        n_slices = cfg.n_stab
        order, props, us = _streams(model, None, n_slices, ns, model.dtype,
                                    W, seed=7)
        fields_blk = states.fields[:, :n_slices]
        Gk, fk, bk, ak, sk = fused_block(model, order, props, us, states.G,
                                         fields_blk, n_slices=n_slices,
                                         forward=forward, interpret=True)
        Go, fo, bo, ao, so = _block_oracle(model, order, props, us,
                                           states.G, fields_blk, forward)
        np.testing.assert_array_equal(np.asarray(fk), np.asarray(fo))
        np.testing.assert_allclose(np.asarray(Gk), np.asarray(Go),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(bk), np.asarray(bo),
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(ak), np.asarray(ao),
                                   atol=1e-12)
        np.testing.assert_array_equal(np.asarray(sk), np.asarray(so))


def test_sweep_fused_2flavor_stays_stable():
    """Full 2-flavor fused sweep pairs: stabilization error stays at f64
    noise, acceptance is sane, and the doped run's sign is tracked."""
    model, cfg, states = _setup_repulsive(nt=12, n_stab=3, mu=-0.6, seed=2)
    s = states
    for _ in range(3):
        s = sweep_pair_fused(model, cfg, s, interpret=True)
    assert float(jnp.max(s.err_max)) < 1e-8
    acc = float(jnp.mean(s.acc_sum)) / (2 * 3)
    assert 0.1 < acc < 0.95
    assert set(np.unique(np.asarray(s.sign))) <= {-1.0, 1.0}


def test_supports_fused_2flavor_gating():
    import dataclasses as dc
    model, cfg, _ = _setup_repulsive()
    assert supports_fused(model, cfg)
    assert not supports_fused(
        model, dc.replace(cfg, fused_update="submatrix"))


def test_sweep_fused_unaligned_ns_matches_oracle():
    """ns = 36 (the reference's canonical 6x6 lattice) is not
    sublane-aligned: the wraps' row-scale broadcast goes through the
    canon_ev offset-0 scratch roundtrip (engine/fused.py — Mosaic cannot
    relayout lane-offset (W, 36) slices to (W, 36, 1)).  The roundtrip
    must be EXACT: the fused chain still matches the pure-JAX oracle to
    f64 noise."""
    model, cfg, states = _setup(L=6, nt=12, n_stab=3, seed=4)
    got = sweep_fused(model, cfg, states, forward=True, interpret=True)
    want = _sweep_fused_oracle(model, cfg, states, True)
    np.testing.assert_array_equal(np.asarray(got.fields),
                                  np.asarray(want.fields))
    np.testing.assert_allclose(np.asarray(got.G), np.asarray(want.G),
                               atol=1e-11)
