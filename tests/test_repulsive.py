"""Repulsive Hubbard (2-flavor) model tests: the multi-flavor engine path.

At half filling the repulsive model is sign-free (particle-hole symmetry),
so the Metropolis sign must stay +1 and physics can be validated against
exact diagonalization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqmc_tpu.engine import EngineConfig, init_state, sweep_pair, half_warp
from dqmc_tpu.engine.sweep import rebuild_stack_and_greens
from dqmc_tpu.lattice import square_lattice
from dqmc_tpu.measure import make_context, observables as obs
from dqmc_tpu.models.repulsive_hubbard import RepulsiveHubbard

from test_ed import _ed_operators, ed_observables
from dqmc_tpu.models.attractive_hubbard import build_kinetic_matrix


def ed_spin_corrs(L, U_arg, t, mu, beta):
    """Exact <S^z_0 S^z_j> and <S^x_0 S^x_j> for all sites j of an LxL
    Hubbard model with H = K - U_arg (n_u - 1/2)(n_d - 1/2) (the same
    convention as test_ed.ed_observables; pass U_arg = -U for the
    repulsive model)."""
    lat = square_lattice(L, L)
    N = lat.n_sites
    dim, c_dag_c = _ed_operators(2 * N)
    K = build_kinetic_matrix(lat, t=t, mu=mu)
    H = np.zeros((dim, dim))
    for spin in (0, 1):
        off = spin * N
        for i in range(N):
            for j in range(N):
                if K[i, j] != 0.0:
                    H += K[i, j] * c_dag_c(i + off, j + off)
    n_ops = [c_dag_c(m, m) for m in range(2 * N)]
    eye = np.eye(dim)
    for i in range(N):
        H -= U_arg * ((n_ops[i] - 0.5 * eye) @ (n_ops[i + N] - 0.5 * eye))
    w, V = np.linalg.eigh(H)
    w -= w.min()
    boltz = np.exp(-beta * w)
    Z = boltz.sum()

    def expect(op):
        return float(np.einsum("as,ab,bs,s->", V, op, V, boltz) / Z)

    sz = [0.5 * (n_ops[i] - n_ops[i + N]) for i in range(N)]
    sp = [c_dag_c(i, i + N) for i in range(N)]        # S+_i = c+_iu c_id
    zz = np.array([expect(sz[0] @ sz[j]) for j in range(N)])
    xx = np.array([0.25 * (expect(sp[0] @ sp[j].T.conj())
                           + expect(sp[0].T.conj() @ sp[j]))
                   for j in range(N)])
    return zz, xx


def test_structure():
    lat = square_lattice(4, 4)
    m = RepulsiveHubbard.build(lat, U=4.0, t=1.0, mu=0.0, beta=2.0, nt=8)
    assert m.n_flavor == 2 and m.det_power == 1
    fields_l = jnp.asarray(np.arange(16) % 4, jnp.int32)
    B, invB = m.B_mats(fields_l)
    assert B.shape == (2, 16, 16)
    # up and down couplings are inverse diagonal scalings of each other
    v = np.asarray(m.expV_diag(fields_l))
    np.testing.assert_allclose(v[0] * v[1], 1.0, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(B[0] @ invB[0]), np.eye(16),
                               atol=1e-12)


def test_detailed_balance_two_flavors(rng):
    lat = square_lattice(4, 4)
    m = RepulsiveHubbard.build(lat, U=4.0, t=1.0, mu=0.0, beta=2.0, nt=8)
    cfg = EngineConfig(nt=8, n_stab=2)
    fields = jnp.asarray(rng.integers(0, 4, (8, 16)), jnp.int32)
    _, G00, log_det = rebuild_stack_and_greens(m, cfg, fields)
    B, invB = m.B_mats(fields[0])
    G1 = B @ G00 @ invB

    for i, shift in [(2, 1), (9, 3)]:
        old = int(fields[0, i])
        new = (old + shift) % 4
        gammaR, bosonR, delta = m.update_factors(jnp.asarray(old),
                                                 jnp.asarray(new))
        r_flv = 1.0 + (1.0 - G1[:, i, i]) * delta
        R = float(gammaR * bosonR * jnp.prod(r_flv) ** m.det_power)
        S_old = float(m.global_action(fields, log_det))
        fields_new = fields.at[0, i].set(new)
        _, _, log_det_new = rebuild_stack_and_greens(m, cfg, fields_new)
        S_new = float(m.global_action(fields_new, log_det_new))
        np.testing.assert_allclose(abs(R), np.exp(-(S_new - S_old)),
                                   rtol=1e-8)


def test_sweep_runs_and_sign_free_at_half_filling():
    lat = square_lattice(4, 4)
    m = RepulsiveHubbard.build(lat, U=4.0, t=1.0, mu=0.0, beta=2.0, nt=16)
    cfg = EngineConfig(nt=16, n_stab=4)
    state = init_state(m, cfg, jax.random.PRNGKey(0))
    for _ in range(3):
        state = sweep_pair(m, cfg, state)
    assert float(state.err_max) < 1e-9
    assert 0.05 < float(state.acc_sum) / 6.0 < 0.95
    assert float(state.sign) == 1.0  # PH-symmetric: no sign problem


@pytest.mark.slow
def test_repulsive_vs_exact_diagonalization():
    """2x2 repulsive model at half filling vs dense ED."""
    L, U, t, mu, beta, nt = 2, 4.0, 1.0, 0.0, 2.0, 40
    exact = ed_observables(L, -U, t, mu, beta)   # ed uses -U_arg*(...)(...)

    lat = square_lattice(L, L)
    m = RepulsiveHubbard.build(lat, U=U, t=t, mu=mu, beta=beta, nt=nt)
    cfg = EngineConfig(nt=nt, n_stab=5)
    ctx = make_context(lat)

    n_walkers, n_therm, n_meas = 8, 200, 600
    keys = jax.random.split(jax.random.PRNGKey(321), n_walkers)
    states = jax.vmap(lambda k: init_state(m, cfg, k))(keys)
    step = jax.jit(jax.vmap(lambda s: sweep_pair(m, cfg, s)))

    @jax.jit
    def measure(states):
        G = jax.vmap(lambda g: half_warp(m, g))(states.G)
        return {
            "density": jax.vmap(lambda g: obs.density(g, ctx))(G),
            "doubleOcc": jax.vmap(lambda g: obs.double_occupancy(g, ctx))(G),
            # site-pair rows (0, :) of the spin correlation matrices
            "spinZZ": jax.vmap(lambda g: obs.spin_zz_corr(g, ctx)[0])(G),
            "spinXX": jax.vmap(lambda g: obs.spin_xx_corr(g, ctx)[0])(G),
        }

    for _ in range(n_therm):
        states = step(states)
    sums = None
    for _ in range(n_meas):
        states = step(states)
        mres = measure(states)
        sums = mres if sums is None else {k: sums[k] + mres[k] for k in mres}
    assert bool(jnp.all(states.sign == 1.0))

    for name in ("density", "doubleOcc"):
        vals = np.asarray(sums[name]) / n_meas
        mean, sem = vals.mean(), vals.std(ddof=1) / np.sqrt(n_walkers)
        ex = exact[name]
        tol = 5 * sem + 0.06 * abs(ex) + 0.01
        assert abs(mean - ex) < tol, (
            f"{name}: DQMC {mean:.4f} +- {sem:.4f} vs ED {ex:.4f}")

    # spin correlations <S^a_0 S^a_j> vs ED — validates the opt-in
    # spinZZCorr/spinXXCorr observables on real 2-flavor chains (the
    # z-channel HS decoupling restores SU(2) only statistically, so zz
    # and xx converge to the same exact answer from different estimators)
    zz_ex, xx_ex = ed_spin_corrs(L, -U, t, mu, beta)
    for name, ex_vec in (("spinZZ", zz_ex), ("spinXX", xx_ex)):
        vals = np.asarray(sums[name]) / n_meas            # (W, ns)
        mean = vals.mean(axis=0)
        sem = vals.std(axis=0, ddof=1) / np.sqrt(n_walkers)
        for j in range(len(ex_vec)):
            tol = 5 * sem[j] + 0.06 * abs(ex_vec[j]) + 0.01
            assert abs(mean[j] - ex_vec[j]) < tol, (
                f"{name}[0,{j}]: DQMC {mean[j]:.4f} +- {sem[j]:.4f} "
                f"vs ED {ex_vec[j]:.4f}")
