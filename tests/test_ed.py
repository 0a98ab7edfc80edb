"""End-to-end physics validation against exact diagonalization.

A 2x2 attractive-Hubbard model (Hilbert dimension 4^4 = 256) is solved
exactly; the DQMC estimates of density, double occupancy and s-wave pairing
must agree within combined statistical + Trotter tolerances.  This is the
strongest correctness statement available: it exercises the full pipeline —
HS transform, propagation, stabilization, Metropolis updates, measurement —
against an independent method.
"""

import dataclasses
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dqmc_tpu.engine import EngineConfig, init_state, sweep_pair, half_warp
from dqmc_tpu.lattice import square_lattice
from dqmc_tpu.measure import make_context, observables as obs
from dqmc_tpu.models import AttractiveHubbard, build_kinetic_matrix

# ----------------------------------------------------------------------
# dense exact diagonalization (Jordan-Wigner ordering: mode m = site + s*N)
# ----------------------------------------------------------------------


def _ed_operators(n_modes):
    dim = 1 << n_modes
    states = np.arange(dim)

    def c_dag_c(m, n):
        """Matrix elements of c_m^dag c_n in the occupation basis."""
        mat = np.zeros((dim, dim))
        for s in states:
            if not (s >> n) & 1:
                continue
            s1 = s ^ (1 << n)
            sign_n = (-1) ** bin(s & ((1 << n) - 1)).count("1")
            if (s1 >> m) & 1:
                continue
            s2 = s1 ^ (1 << m)
            sign_m = (-1) ** bin(s1 & ((1 << m) - 1)).count("1")
            mat[s2, s] += sign_m * sign_n
        return mat

    return dim, c_dag_c


def ed_observables(L, U, t, mu, beta):
    lat = square_lattice(L, L)
    N = lat.n_sites
    n_modes = 2 * N
    dim, c_dag_c = _ed_operators(n_modes)

    H = np.zeros((dim, dim))
    K = build_kinetic_matrix(lat, t=t, mu=mu)
    for spin in (0, 1):
        off = spin * N
        for i in range(N):
            for j in range(N):
                if K[i, j] != 0.0:
                    H += K[i, j] * c_dag_c(i + off, j + off)
    # The GHQ decoupling (field.h:36-43, model.cpp:27-28,62-72,99-107)
    # implements the particle-hole-symmetric interaction
    #   -U (n_up - 1/2)(n_dn - 1/2)
    # (half filling at mu = 0), not the bare -U n_up n_dn of the README.
    n_ops = [c_dag_c(m, m) for m in range(n_modes)]
    eye = np.eye(dim)
    for i in range(N):
        H -= U * ((n_ops[i] - 0.5 * eye) @ (n_ops[i + N] - 0.5 * eye))

    w, V = np.linalg.eigh(H)
    w -= w.min()
    boltz = np.exp(-beta * w)
    Z = boltz.sum()

    def expect(op):
        return float(np.einsum("as,ab,bs,s->", V, op, V, boltz) / Z)

    density = sum(expect(n_ops[m]) for m in range(n_modes)) / N
    docc = sum(expect(n_ops[i] @ n_ops[i + N]) for i in range(N)) / N
    swave = 0.0
    for i in range(N):
        for j in range(N):
            # <c_iu^dag c_id^dag c_jd c_ju>
            op = (c_dag_c(i, j) @ c_dag_c(i + N, j + N)
                  - (np.eye(dim) if i == j else 0) * 0.0)
            # build directly: Delta_i^dag Delta_j
            swave += expect(c_dag_c(i, j) @ c_dag_c(i + N, j + N))
    swave /= N
    return {"density": density, "doubleOcc": docc, "swave": swave}


@pytest.mark.slow
def test_dqmc_vs_exact_diagonalization():
    L, U, t, mu, beta, nt = 2, 4.0, 1.0, -0.5, 2.0, 40
    exact = ed_observables(L, U, t, mu, beta)

    lat = square_lattice(L, L)
    model = AttractiveHubbard.build(lat, U=U, t=t, mu=mu, beta=beta, nt=nt)
    cfg = EngineConfig(nt=nt, n_stab=5)
    ctx = make_context(lat)

    n_walkers, n_therm, n_meas = 8, 200, 600
    keys = jax.random.split(jax.random.PRNGKey(123), n_walkers)
    states = jax.vmap(lambda k: init_state(model, cfg, k))(keys)
    step = jax.jit(jax.vmap(lambda s: sweep_pair(model, cfg, s)))

    @jax.jit
    def measure(states):
        G = jax.vmap(lambda g: half_warp(model, g))(states.G)
        return {
            "density": jax.vmap(lambda g: obs.density(g, ctx))(G),
            "doubleOcc": jax.vmap(lambda g: obs.double_occupancy(g, ctx))(G),
            "swave": jax.vmap(lambda g: obs.swave_pairing(g, ctx))(G),
        }

    for _ in range(n_therm):
        states = step(states)
    sums = None
    for _ in range(n_meas):
        states = step(states)
        m = measure(states)
        sums = m if sums is None else {k: sums[k] + m[k] for k in m}

    for name, ex in exact.items():
        vals = np.asarray(sums[name]) / n_meas        # per-walker means
        mean = vals.mean()
        sem = vals.std(ddof=1) / np.sqrt(n_walkers)
        # combined statistical (5 sigma) + Trotter O(dtau^2) tolerance
        tol = 5 * sem + 0.06 * abs(ex) + 0.01
        assert abs(mean - ex) < tol, (
            f"{name}: DQMC {mean:.4f} +- {sem:.4f} vs ED {ex:.4f}")


@pytest.mark.slow
def test_ed_sanity_free_fermions():
    """U=0 cross-check of the ED machinery itself against the exact
    free-fermion density."""
    L, t, mu, beta = 2, 1.0, -0.5, 2.0
    exact = ed_observables(L, 0.0, t, mu, beta)
    lat = square_lattice(L, L)
    K = build_kinetic_matrix(lat, t=t, mu=mu)
    eps = np.linalg.eigvalsh(K)
    dens_ff = 2 * np.mean(1.0 / (1.0 + np.exp(beta * eps)))
    np.testing.assert_allclose(exact["density"], dens_ff, rtol=1e-10)
