"""Checkerboard kinetic decomposition tests (the reference's open TODO,
README.md:40): operator correctness vs brute-force group exponentials,
exact inverses, full-engine consistency, and Trotter-level agreement with
the dense model."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from dqmc_tpu.engine import EngineConfig, init_state, sweep_pair
from dqmc_tpu.engine.sweep import rebuild_stack_and_greens
from dqmc_tpu.lattice import square_lattice
from dqmc_tpu.models import AttractiveHubbard, build_kinetic_matrix
from dqmc_tpu.models.kinetic import (
    apply_B_left,
    apply_B_right,
    apply_invB_left,
    apply_invB_right,
    build_checkerboard,
    _kin_left,
)


def make(L=4, beta=2.0, nt=8, U=4.0, mu=-0.1, cb=True):
    lat = square_lattice(L, L)
    m = AttractiveHubbard.build(lat, U=U, t=1.0, mu=mu, beta=beta, nt=nt,
                                checkerboard=cb)
    return lat, m


def brute_cb_matrix(lat, t, mu, dtau):
    """Dense matrix of the checkerboard operator: e^{dtau mu} prod_g e^{-dtau K_g}."""
    perms, masks, ch, sh = build_checkerboard(lat, t, dtau)
    ns = lat.n_sites
    M = np.exp(dtau * mu) * np.eye(ns)
    for g in range(4):
        Kg = np.zeros((ns, ns))
        for i in range(ns):
            j = perms[g][i]
            if masks[g][i] and j > i:
                Kg[i, j] = Kg[j, i] = -t
        M = M @ scipy.linalg.expm(-dtau * Kg)
    return M


def test_operator_matches_brute_force(rng):
    lat, m = make()
    dtau = 2.0 / 8
    want = brute_cb_matrix(lat, 1.0, -0.1, dtau)
    got = np.asarray(_kin_left(m, jnp.eye(16, dtype=jnp.float64)[None],
                               inv=False)[0])
    np.testing.assert_allclose(got, want, atol=1e-13)
    # inverse is the exact operator inverse
    gotinv = np.asarray(_kin_left(m, jnp.eye(16, dtype=jnp.float64)[None],
                                  inv=True)[0])
    np.testing.assert_allclose(gotinv @ got, np.eye(16), atol=1e-13)


def test_B_products_consistency(rng):
    lat, m = make()
    fields_l = jnp.asarray(rng.integers(0, 4, 16), jnp.int32)
    X = jnp.asarray(rng.standard_normal((1, 16, 16)))
    # dense matrix of B via left-apply on the identity
    B = np.asarray(apply_B_left(m, fields_l, jnp.eye(16)[None])[0])
    np.testing.assert_allclose(np.asarray(apply_B_right(m, fields_l, X)[0]),
                               np.asarray(X[0]) @ B, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(apply_invB_left(m, fields_l,
                                   apply_B_left(m, fields_l, X))[0]),
        np.asarray(X[0]), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(apply_invB_right(m, fields_l,
                                    apply_B_right(m, fields_l, X))[0]),
        np.asarray(X[0]), atol=1e-12)


def test_trotter_scaling_free_fermions():
    """At U=0 the checkerboard G(0,0) differs from the exact
    [I + e^{-beta K}]^{-1} only by the BCH splitting error of the plain
    product formula — first order in dtau overall (O(dtau^2) per slice x
    nt slices), the same order as the asymmetric Trotter splitting the
    whole scheme already carries.

    Note: L=4 is degenerate — on 4-site periodic rings the even/odd bond
    groups commute exactly (wrap-around bonds cancel the commutators) and
    the decomposition is exact; L=6 exposes the real Trotter error.
    """
    import golden

    lat = square_lattice(6, 6)
    K = build_kinetic_matrix(lat, t=1.0, mu=-0.1)
    G_exact = golden.free_fermion_gtt(K, 2.0)
    errs = {}
    for nt in (8, 32):
        m = AttractiveHubbard.build(lat, U=0.0, t=1.0, mu=-0.1, beta=2.0,
                                    nt=nt, checkerboard=True)
        cfg = EngineConfig(nt=nt, n_stab=4)
        fields = jnp.zeros((nt, 36), jnp.int32)
        _, G, _ = rebuild_stack_and_greens(m, cfg, fields)
        errs[nt] = np.abs(np.asarray(G[0]) - G_exact).max()
    assert errs[8] > 1e-8            # real (non-commuting) splitting error
    assert errs[32] < errs[8] / 3    # ~dtau scaling (4x expected)
    # and the degenerate L=4 case is exact
    lat4 = square_lattice(4, 4)
    m4 = AttractiveHubbard.build(lat4, U=0.0, t=1.0, mu=-0.1, beta=2.0,
                                 nt=8, checkerboard=True)
    _, G4, _ = rebuild_stack_and_greens(
        m4, EngineConfig(nt=8, n_stab=4), jnp.zeros((8, 16), jnp.int32))
    K4 = build_kinetic_matrix(lat4, t=1.0, mu=-0.1)
    np.testing.assert_allclose(np.asarray(G4[0]),
                               golden.free_fermion_gtt(K4, 2.0), atol=1e-11)


def test_full_sweep_checkerboard():
    lat, m = make(beta=2.0, nt=16)
    cfg = EngineConfig(nt=16, n_stab=4)
    state = init_state(m, cfg, jax.random.PRNGKey(0))
    for _ in range(3):
        state = sweep_pair(m, cfg, state)
    assert float(state.err_max) < 1e-9
    assert 0.05 < float(state.acc_sum) / 6.0 < 0.95
