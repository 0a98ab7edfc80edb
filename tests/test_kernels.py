"""Pallas kernel equivalence tests (interpret mode on CPU): every site-update
implementation must realize the exact same Markov chain."""

import jax
import jax.numpy as jnp
import numpy as np

from dqmc_tpu.engine.sweep import (
    draw_slice_randoms,
    local_update_core,
    local_update_slice,
    local_update_slice_delayed,
)
from dqmc_tpu.lattice import square_lattice
from dqmc_tpu.models import AttractiveHubbard
from dqmc_tpu.ops.kernels import (
    metropolis_slice_update,
    metropolis_slice_update_batched,
    pallas_site_update,
)


def setup(ns=16):
    lat = square_lattice(4, 4)
    m = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1, beta=4.0, nt=16,
                                dtype=jnp.float64)
    rng = np.random.default_rng(5)
    G = jnp.asarray(rng.standard_normal((1, ns, ns)) * 0.2 + 0.5 * np.eye(ns))
    fl = jnp.asarray(rng.integers(0, 4, ns), jnp.int32)
    return m, G, fl


def test_single_walker_kernel_matches_scan():
    m, G, fl = setup()
    for seed in range(3):
        key = jax.random.PRNGKey(seed)
        G1, f1, a1, s1 = local_update_slice(m, key, G, fl)
        G2, f2, a2 = metropolis_slice_update(m, key, G, fl, interpret=True)
        assert bool((f1 == f2).all())
        np.testing.assert_allclose(np.asarray(G1), np.asarray(G2), atol=1e-13)
        np.testing.assert_allclose(float(a1), float(a2))
        assert float(s1) == 1.0  # attractive model is sign-free


def test_delayed_matches_scan_bitwise():
    m, G, fl = setup()
    key = jax.random.PRNGKey(9)
    G1, f1, a1, s1 = local_update_slice(m, key, G, fl)
    for k in (4, 5, 16):
        G2, f2, a2, s2 = local_update_slice_delayed(m, key, G, fl, k)
        assert bool((f1 == f2).all())
        np.testing.assert_allclose(np.asarray(G1), np.asarray(G2), atol=1e-12)
        assert float(s1) == float(s2)


def test_submatrix_matches_scan_bitwise():
    """The submatrix (bordered-Woodbury) scheme realizes the exact chain of
    the rank-1 scan: same decisions, same sign, G to f64 rounding."""
    from dqmc_tpu.engine.sweep import local_update_slice_submatrix

    m, G, fl = setup()
    key = jax.random.PRNGKey(9)
    G1, f1, a1, s1 = local_update_slice(m, key, G, fl)
    for k in (4, 5, 16):
        G2, f2, a2, s2 = local_update_slice_submatrix(m, key, G, fl, k)
        assert bool((f1 == f2).all())
        np.testing.assert_allclose(np.asarray(G1), np.asarray(G2), atol=1e-11)
        np.testing.assert_allclose(float(a1), float(a2))
        assert float(s1) == float(s2)


def test_submatrix_two_flavor_sign_flips():
    """Submatrix scheme on the doped repulsive model: per-flavor bordered
    inverses, negative-ratio sign bookkeeping identical to the scan."""
    from dqmc_tpu.engine.sweep import local_update_slice_submatrix
    from dqmc_tpu.models import RepulsiveHubbard

    lat = square_lattice(4, 4)
    ns = 16
    m = RepulsiveHubbard.build(lat, U=6.0, t=1.0, mu=-0.8, beta=4.0, nt=16,
                               dtype=jnp.float64)
    rng = np.random.default_rng(21)
    G = jnp.asarray(rng.standard_normal((2, ns, ns)) * 0.3 + 0.5 * np.eye(ns))
    fl = jnp.asarray(rng.integers(0, 4, ns), jnp.int32)
    saw_flip = False
    for seed in range(4):
        key = jax.random.PRNGKey(seed)
        G1, f1, a1, s1 = local_update_slice(m, key, G, fl)
        G2, f2, a2, s2 = local_update_slice_submatrix(m, key, G, fl, 8)
        assert bool((f1 == f2).all())
        np.testing.assert_allclose(np.asarray(G1), np.asarray(G2), atol=1e-10)
        assert float(s1) == float(s2)
        saw_flip = saw_flip or float(s1) < 0
    assert saw_flip, "test inputs produced no sign flip to verify"


def test_submatrix_sweep_matches_scan_sweep():
    """Full sweep_pair with submatrix_rank: same chain as the scan engine."""
    from dqmc_tpu.engine import EngineConfig, init_state, sweep_pair

    lat = square_lattice(4, 4)
    m = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1, beta=2.0, nt=8,
                                dtype=jnp.float64)
    cfg_scan = EngineConfig(nt=8, n_stab=2)
    cfg_sub = EngineConfig(nt=8, n_stab=2, submatrix_rank=8)
    s0 = init_state(m, cfg_scan, jax.random.PRNGKey(43))
    s1 = sweep_pair(m, cfg_scan, s0)
    s2 = sweep_pair(m, cfg_sub, s0)
    assert bool((s1.fields == s2.fields).all())
    assert float(s1.sign) == float(s2.sign)
    np.testing.assert_allclose(np.asarray(s1.G), np.asarray(s2.G), atol=1e-10)
    np.testing.assert_allclose(float(s1.acc_sum), float(s2.acc_sum))


def test_submatrix_pallas_kernel_matches_core():
    """The batched submatrix Pallas kernel (interpret mode) realizes the
    same chain as the rank-1 core for every walker and block rank."""
    from dqmc_tpu.ops.kernels import metropolis_slice_update_submatrix

    m, _, _ = setup()
    ns, W = 16, 4
    rng = np.random.default_rng(6)
    G = jnp.asarray(rng.standard_normal((W, 1, ns, ns)) * 0.2
                    + 0.5 * np.eye(ns))
    fl = jnp.asarray(rng.integers(0, 4, (W, ns)), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(11), W)
    order, _, _ = draw_slice_randoms(keys[0], ns, jnp.float64)
    for k_sub in (4, 8, 16):
        G2, f2, a2 = metropolis_slice_update_submatrix(
            m, keys, G, fl, k_sub=k_sub, interpret=True)
        for w in range(W):
            _, props, us = draw_slice_randoms(keys[w], ns, jnp.float64)
            Gw, fw, aw, _ = local_update_core(m, G[w], fl[w], order,
                                              props, us)
            assert bool((fw == f2[w]).all()), (k_sub, w)
            np.testing.assert_allclose(np.asarray(Gw), np.asarray(G2[w]),
                                       atol=1e-11)
            np.testing.assert_allclose(float(aw), float(a2[w]))


def test_submatrix_pallas_vmap_and_engine_dispatch():
    """vmap(pallas_site_update_submatrix(k)) flattens to the batched kernel
    and the use_pallas+submatrix_rank engine path realizes the scan
    engine's exact chain."""
    from dqmc_tpu.engine import EngineConfig, init_state, sweep_pair
    from dqmc_tpu.ops.kernels import pallas_site_update_submatrix

    m, _, _ = setup()
    ns, W = 16, 4
    rng = np.random.default_rng(8)
    G = jnp.asarray(rng.standard_normal((W, 1, ns, ns)) * 0.2
                    + 0.5 * np.eye(ns))
    fl = jnp.asarray(rng.integers(0, 4, (W, ns)), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(13), W)
    fn = pallas_site_update_submatrix(8)
    G1, f1, a1 = jax.vmap(lambda k, g, f: fn(m, k, g, f))(keys, G, fl)
    order, _, _ = draw_slice_randoms(keys[0], ns, jnp.float64)
    for w in range(W):
        _, props, us = draw_slice_randoms(keys[w], ns, jnp.float64)
        Gw, fw, aw, _ = local_update_core(m, G[w], fl[w], order, props, us)
        assert bool((fw == f1[w]).all())
        np.testing.assert_allclose(np.asarray(Gw), np.asarray(G1[w]),
                                   atol=1e-11)

    lat = square_lattice(4, 4)
    m2 = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1, beta=2.0, nt=8,
                                 dtype=jnp.float64)
    cfg_scan = EngineConfig(nt=8, n_stab=2)
    cfg_ps = EngineConfig(nt=8, n_stab=2, use_pallas=True, submatrix_rank=8)
    s0 = init_state(m2, cfg_scan, jax.random.PRNGKey(47))
    s1 = sweep_pair(m2, cfg_scan, s0)
    s2 = sweep_pair(m2, cfg_ps, s0)
    assert bool((s1.fields == s2.fields).all())
    np.testing.assert_allclose(np.asarray(s1.G), np.asarray(s2.G),
                               atol=1e-10)


def test_batched_kernel_matches_shared_order_core():
    m, G1w, _ = setup()
    ns, W = 16, 4
    rng = np.random.default_rng(6)
    G = jnp.asarray(rng.standard_normal((W, 1, ns, ns)) * 0.2
                    + 0.5 * np.eye(ns))
    fl = jnp.asarray(rng.integers(0, 4, (W, ns)), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(11), W)

    G2, f2, a2 = metropolis_slice_update_batched(m, keys, G, fl, k_delay=8,
                                                 interpret=True)
    order, _, _ = draw_slice_randoms(keys[0], ns, jnp.float64)
    for w in range(W):
        _, props, us = draw_slice_randoms(keys[w], ns, jnp.float64)
        Gw, fw, aw, _ = local_update_core(m, G[w], fl[w], order, props, us)
        assert bool((fw == f2[w]).all()), f"walker {w}"
        np.testing.assert_allclose(np.asarray(Gw), np.asarray(G2[w]),
                                   atol=1e-12)
        np.testing.assert_allclose(float(aw), float(a2[w]))


def test_custom_vmap_dispatches_to_batched():
    """vmap(pallas_site_update) must produce the batched kernel's results."""
    m, _, _ = setup()
    ns, W = 16, 4
    rng = np.random.default_rng(8)
    G = jnp.asarray(rng.standard_normal((W, 1, ns, ns)) * 0.2
                    + 0.5 * np.eye(ns))
    fl = jnp.asarray(rng.integers(0, 4, (W, ns)), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(13), W)

    G1, f1, a1 = jax.vmap(
        lambda k, g, f: pallas_site_update(m, k, g, f))(keys, G, fl)
    G2, f2, a2 = metropolis_slice_update_batched(m, keys, G, fl,
                                                 interpret=True)
    assert bool((f1 == f2).all())
    np.testing.assert_allclose(np.asarray(G1), np.asarray(G2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))


def test_two_flavor_kernel_matches_scan():
    """The 2-flavor (repulsive) batched kernel must realize the exact
    Markov chain of local_update_core — including sign flips on accepted
    negative-ratio moves."""
    from dqmc_tpu.models import RepulsiveHubbard
    from dqmc_tpu.ops.kernels import _metropolis_batched_2f_impl

    lat = square_lattice(4, 4)
    ns, W = 16, 3
    m = RepulsiveHubbard.build(lat, U=6.0, t=1.0, mu=-0.8, beta=4.0, nt=16,
                               dtype=jnp.float64)
    rng = np.random.default_rng(21)
    G = jnp.asarray(rng.standard_normal((W, 2, ns, ns)) * 0.3
                    + 0.5 * np.eye(ns))
    fl = jnp.asarray(rng.integers(0, 4, (W, ns)), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(29), W)

    g_vec = jnp.broadcast_to(m.g, (W,))
    a_vec = jnp.broadcast_to(m.alpha, (W,))
    G2, f2, a2, s2 = _metropolis_batched_2f_impl(g_vec, a_vec, keys, G, fl,
                                                 k_delay=8, interpret=True)
    order, _, _ = draw_slice_randoms(keys[0], ns, jnp.float64)
    saw_flip = False
    for w in range(W):
        _, props, us = draw_slice_randoms(keys[w], ns, jnp.float64)
        Gw, fw, aw, sw = local_update_core(m, G[w], fl[w], order, props, us)
        assert bool((fw == f2[w]).all()), f"walker {w}"
        np.testing.assert_allclose(np.asarray(Gw), np.asarray(G2[w]),
                                   atol=1e-11)
        np.testing.assert_allclose(float(aw), float(a2[w]))
        assert float(sw) == float(s2[w])
        saw_flip = saw_flip or float(sw) < 0
    # the doped U=6 fake-G setup should exercise the sign path; if this
    # ever goes quiet, reseed so the test keeps covering sign flips
    assert saw_flip, "test inputs produced no sign flip to verify"


def test_two_flavor_multiblock_matches_scan(monkeypatch):
    """Regression: with the walker axis split into MULTIPLE kernel blocks
    (forced WB = W//2), every walker must still realize its own stream —
    a transpose slip in the per-block stream reshapes scrambled walkers
    across blocks and only single-block tests passed."""
    from dqmc_tpu.models import RepulsiveHubbard
    from dqmc_tpu.ops import kernels as K

    monkeypatch.setattr(K, "_pick_block",
                        lambda W, ns, k, itemsize=4, budget=0: W // 2)
    lat = square_lattice(4, 4)
    ns, W = 16, 4
    m = RepulsiveHubbard.build(lat, U=6.0, t=1.0, mu=-0.8, beta=4.0, nt=16,
                               dtype=jnp.float64)
    rng = np.random.default_rng(51)
    G = jnp.asarray(rng.standard_normal((W, 2, ns, ns)) * 0.3
                    + 0.5 * np.eye(ns))
    fl = jnp.asarray(rng.integers(0, 4, (W, ns)), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(53), W)

    g_vec = jnp.broadcast_to(m.g, (W,))
    a_vec = jnp.broadcast_to(m.alpha, (W,))
    G2, f2, a2, s2 = K._metropolis_batched_2f_impl(
        g_vec, a_vec, keys, G, fl, k_delay=8, interpret=True)
    order, _, _ = draw_slice_randoms(keys[0], ns, jnp.float64)
    for w in range(W):
        _, props, us = draw_slice_randoms(keys[w], ns, jnp.float64)
        Gw, fw, aw, sw = local_update_core(m, G[w], fl[w], order, props, us)
        assert bool((fw == f2[w]).all()), f"walker {w}"
        np.testing.assert_allclose(np.asarray(Gw), np.asarray(G2[w]),
                                   atol=1e-11)
        assert float(sw) == float(s2[w])


def test_one_flavor_multiblock_matches_scan(monkeypatch):
    """Same multi-block regression for the 1-flavor batched kernel."""
    from dqmc_tpu.ops import kernels as K

    monkeypatch.setattr(K, "_pick_block",
                        lambda W, ns, k, itemsize=4, budget=0: W // 2)
    m, _, _ = setup()
    ns, W = 16, 4
    rng = np.random.default_rng(55)
    G = jnp.asarray(rng.standard_normal((W, 1, ns, ns)) * 0.2
                    + 0.5 * np.eye(ns))
    fl = jnp.asarray(rng.integers(0, 4, (W, ns)), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(57), W)
    G2, f2, a2 = K.metropolis_slice_update_batched(m, keys, G, fl,
                                                   k_delay=8, interpret=True)
    order, _, _ = draw_slice_randoms(keys[0], ns, jnp.float64)
    for w in range(W):
        _, props, us = draw_slice_randoms(keys[w], ns, jnp.float64)
        Gw, fw, aw, _ = local_update_core(m, G[w], fl[w], order, props, us)
        assert bool((fw == f2[w]).all()), f"walker {w}"
        np.testing.assert_allclose(np.asarray(Gw), np.asarray(G2[w]),
                                   atol=1e-12)


def test_two_flavor_custom_vmap_dispatch():
    """vmap(pallas_site_update_2f) flattens to the batched 2f kernel and
    matches the unvmapped per-walker calls."""
    from dqmc_tpu.models import RepulsiveHubbard
    from dqmc_tpu.ops.kernels import pallas_site_update_2f

    lat = square_lattice(4, 4)
    ns, W = 16, 2
    m = RepulsiveHubbard.build(lat, U=4.0, t=1.0, mu=0.0, beta=4.0, nt=16,
                               dtype=jnp.float64)
    rng = np.random.default_rng(31)
    G = jnp.asarray(rng.standard_normal((W, 2, ns, ns)) * 0.2
                    + 0.5 * np.eye(ns))
    fl = jnp.asarray(rng.integers(0, 4, (W, ns)), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(37), W)

    G1, f1, a1, s1 = jax.vmap(
        lambda k, g, f: pallas_site_update_2f(m, k, g, f))(keys, G, fl)
    order, _, _ = draw_slice_randoms(keys[0], ns, jnp.float64)
    for w in range(W):
        _, props, us = draw_slice_randoms(keys[w], ns, jnp.float64)
        Gw, fw, aw, sw = local_update_core(m, G[w], fl[w], order, props, us)
        assert bool((fw == f1[w]).all())
        np.testing.assert_allclose(np.asarray(Gw), np.asarray(G1[w]),
                                   atol=1e-11)
        assert float(sw) == float(s1[w])


def test_two_flavor_pallas_sweep_matches_scan_sweep():
    """Full sweep_pair on the repulsive model: the use_pallas engine path
    (2-flavor kernel, interpret mode on CPU) must match the scan path's
    chain — same fields, sign, and Green's function."""
    from dqmc_tpu.engine import EngineConfig, init_state, sweep_pair
    from dqmc_tpu.models import RepulsiveHubbard

    lat = square_lattice(4, 4)
    m = RepulsiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.5, beta=2.0, nt=8,
                               dtype=jnp.float64)
    cfg_scan = EngineConfig(nt=8, n_stab=2)
    cfg_pal = EngineConfig(nt=8, n_stab=2, use_pallas=True)
    s0 = init_state(m, cfg_scan, jax.random.PRNGKey(41))
    s1 = sweep_pair(m, cfg_scan, s0)
    s2 = sweep_pair(m, cfg_pal, s0)
    assert bool((s1.fields == s2.fields).all())
    assert float(s1.sign) == float(s2.sign)
    np.testing.assert_allclose(np.asarray(s1.G), np.asarray(s2.G),
                               atol=1e-11)
    np.testing.assert_allclose(float(s1.acc_sum), float(s2.acc_sum))


def test_custom_vmap_model_batched_runs_one_kernel():
    """vmap over (model, state) — the replica-axis case — dispatches to the
    flat batched kernel with per-replica coupling scalars (shared
    state-independent visit order from keys[0], per-replica
    proposals/uniforms), matching the sequential oracle per replica."""
    lat = square_lattice(4, 4)
    ns, R = 16, 2
    models = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1, beta=b, nt=16,
                                  dtype=jnp.float64) for b in (2.0, 4.0)])
    rng = np.random.default_rng(3)
    G = jnp.asarray(rng.standard_normal((R, 1, ns, ns)) * 0.2
                    + 0.5 * np.eye(ns))
    fl = jnp.asarray(rng.integers(0, 4, (R, ns)), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(17), R)

    G1, f1, a1 = jax.vmap(pallas_site_update)(models, keys, G, fl)
    order, _, _ = draw_slice_randoms(keys[0], ns, jnp.float64)
    for r in range(R):
        mr = jax.tree_util.tree_map(lambda x: x[r], models)
        _, props, us = draw_slice_randoms(keys[r], ns, jnp.float64)
        Gr, fr, ar, _ = local_update_core(mr, G[r], fl[r], order, props, us)
        assert bool((fr == f1[r]).all())
        np.testing.assert_allclose(np.asarray(Gr), np.asarray(G1[r]),
                                   atol=1e-12)
        np.testing.assert_allclose(float(ar), float(a1[r]))


def test_double_vmap_replica_by_walker_flattens():
    """vmap(vmap(...)) — replicas outside, walkers inside — must flatten to
    one (R*W) batch and match the per-(replica,walker) oracle."""
    lat = square_lattice(4, 4)
    ns, R, W = 16, 2, 3
    models = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1, beta=b, nt=16,
                                  dtype=jnp.float64) for b in (2.0, 4.0)])
    rng = np.random.default_rng(4)
    G = jnp.asarray(rng.standard_normal((R, W, 1, ns, ns)) * 0.2
                    + 0.5 * np.eye(ns))
    fl = jnp.asarray(rng.integers(0, 4, (R, W, ns)), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(23), R * W).reshape(R, W, -1)

    G1, f1, a1 = jax.vmap(lambda m, k, g, f: jax.vmap(
        lambda kk, gg, ff: pallas_site_update(m, kk, gg, ff))(k, g, f))(
            models, keys, G, fl)
    # the flat batch draws its shared order from the FIRST flattened key
    order, _, _ = draw_slice_randoms(keys[0, 0], ns, jnp.float64)
    for r in range(R):
        mr = jax.tree_util.tree_map(lambda x: x[r], models)
        for w in range(W):
            _, props, us = draw_slice_randoms(keys[r, w], ns, jnp.float64)
            Gr, fr, ar, _ = local_update_core(mr, G[r, w], fl[r, w], order,
                                              props, us)
            assert bool((fr == f1[r, w]).all()), (r, w)
            np.testing.assert_allclose(np.asarray(Gr), np.asarray(G1[r, w]),
                                       atol=1e-12)
