"""Triangular and honeycomb lattice support (beyond reference capability —
the reference hardcodes the 1-orbital square lattice, main.cpp:85-88).

Validation strategy: at U=0 the simulation's equal-time Green's function
must equal the exact free-fermion result (I + e^{-beta K})^{-1} for the
geometry's kinetic matrix; the kinetic matrix itself is pinned against
hand-counted coordination numbers and the honeycomb's Dirac spectrum.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dqmc_tpu.config import Parameters
from dqmc_tpu.engine import EngineConfig, init_state, sweep_pair
from dqmc_tpu.lattice import (honeycomb_lattice, make_lattice, nn_bonds,
                              triangular_lattice)
from dqmc_tpu.models import AttractiveHubbard, build_kinetic_matrix
from dqmc_tpu.run import run_simulation


def test_kinetic_matrix_coordination():
    tri = triangular_lattice(4, 4)
    K = build_kinetic_matrix(tri, t=1.0, mu=0.3, bonds=nn_bonds("triangular"))
    off = K - np.diag(np.diag(K))
    # every triangular site has 6 nearest neighbours
    assert ((off != 0).sum(axis=1) == 6).all()
    assert np.allclose(np.diag(K), -0.3)
    assert np.allclose(K, K.T)

    hc = honeycomb_lattice(4, 4)
    K = build_kinetic_matrix(hc, t=1.0, mu=0.0, bonds=nn_bonds("honeycomb"))
    off = K - np.diag(np.diag(K))
    # every honeycomb site has 3 nearest neighbours, all on the other
    # sublattice (bipartite: no A-A or B-B entries)
    assert ((off != 0).sum(axis=1) == 3).all()
    ns = hc.n_sites
    orb = np.arange(ns) % 2
    ii, jj = np.nonzero(off)
    assert (orb[ii] != orb[jj]).all()


def test_honeycomb_dirac_spectrum():
    """The honeycomb kinetic matrix must reproduce graphene's band
    structure: eigenvalues +-|f(k)| with zero modes at the K points when
    the grid contains them (L multiple of 3)."""
    hc = honeycomb_lattice(6, 6)
    K = build_kinetic_matrix(hc, t=1.0, mu=0.0, bonds=nn_bonds("honeycomb"))
    w = np.linalg.eigvalsh(K)
    # particle-hole symmetric spectrum in [-3, 3] with 4 zero modes
    # (2 Dirac points x 2 sublattice-symmetric states)
    assert abs(w.min() + 3.0) < 1e-12 and abs(w.max() - 3.0) < 1e-12
    np.testing.assert_allclose(np.sort(w), np.sort(-w)[::-1] * -1, atol=1e-12)
    assert (np.abs(w) < 1e-10).sum() == 4


def _free_fermion_check(geometry, L, beta, nt):
    lat = make_lattice(geometry, L, L)
    bonds = nn_bonds(geometry)
    model = AttractiveHubbard.build(lat, U=0.0, t=1.0, mu=-0.2, beta=beta,
                                    nt=nt, dtype=jnp.float64, bonds=bonds)
    cfg = EngineConfig(nt=nt, n_stab=4)
    state = init_state(model, cfg, jax.random.PRNGKey(0))
    K = build_kinetic_matrix(lat, t=1.0, mu=-0.2, bonds=bonds)
    w, V = np.linalg.eigh(K)
    Gex = V @ np.diag(1.0 / (1.0 + np.exp(-beta * w))) @ V.T
    np.testing.assert_allclose(np.asarray(state.G[0]), Gex, atol=1e-10)
    # a full sweep keeps the free chain on the exact G (U=0: all moves
    # change nothing physical, stabilization must hold it)
    state = sweep_pair(model, cfg, state)
    np.testing.assert_allclose(np.asarray(state.G[0]), Gex, atol=1e-9)


def test_triangular_free_fermion():
    _free_fermion_check("triangular", 4, 3.0, 12)


def test_honeycomb_free_fermion():
    _free_fermion_check("honeycomb", 3, 3.0, 12)


def test_square_tp_free_fermion():
    """[hubbard] tp (next-nearest hopping, 4-tuple amplitude bonds): the
    U=0 chain must hold the exact frustrated-band Green's function, and
    the config key must flow through from_params."""
    from dqmc_tpu.config import Parameters
    from dqmc_tpu.lattice import bonds_with_tp

    L, beta, nt, tp = 4, 3.0, 12, -0.35
    lat = make_lattice("square", L, L)
    bonds = bonds_with_tp("square", tp)
    assert ((1, 1), 0, 0, tp) in bonds
    model = AttractiveHubbard.build(lat, U=0.0, t=1.0, mu=-0.2, beta=beta,
                                    nt=nt, dtype=jnp.float64, bonds=bonds)
    cfg = EngineConfig(nt=nt, n_stab=4)
    state = init_state(model, cfg, jax.random.PRNGKey(0))
    K = build_kinetic_matrix(lat, t=1.0, mu=-0.2, bonds=bonds)
    # every site couples to 4 NN + 4 NNN
    assert (np.count_nonzero(K) == L * L * 9)
    w, V = np.linalg.eigh(K)
    Gex = V @ np.diag(1.0 / (1.0 + np.exp(-beta * w))) @ V.T
    np.testing.assert_allclose(np.asarray(state.G[0]), Gex, atol=1e-10)
    state = sweep_pair(model, cfg, state)
    np.testing.assert_allclose(np.asarray(state.G[0]), Gex, atol=1e-9)

    # from_params wiring: tp key changes expK
    base = """
[Lattice]
L1 = 4
L2 = 4
[hubbard]
U = 0.0
t = 1.0
mu = -0.2
tp = -0.35
[simulation]
beta = 3.0
nt = 12
"""
    m2 = AttractiveHubbard.from_params(Parameters.from_string(base), lat)
    np.testing.assert_allclose(np.asarray(m2.expK), np.asarray(model.expK),
                               atol=1e-14)


def test_honeycomb_driver_end_to_end(tmp_path):
    """Full interacting honeycomb run through the driver: half filling at
    mu=0 (particle-hole symmetric attractive model on a bipartite lattice),
    output consumable by the analysis pipeline."""
    import h5py
    params = Parameters.from_string("""
[Lattice]
L1 = 3
L2 = 3
geometry = honeycomb
[hubbard]
U = 4.0
t = 1.0
mu = 0.0
[simulation]
beta = 3.0
nt = 12
n_therms = 8
n_sweeps = 4
n_bins = 3
n_stab = 4
seed = 4
dtype = float64
""")
    summary = run_simulation(params, out_dir=str(tmp_path / "results"),
                             verbose=False)
    assert summary.max_precision_error < 1e-8
    with h5py.File(tmp_path / "results" / "data_0.h5") as f:
        dens = [float(f[f"bin_{b}/scalar/density"][0]) for b in range(3)]
        # equal-time arrays carry the n_orb^2 = 4 orbital-pair slot axis
        assert f["bin_0/equaltime/densityCorr"].shape == (3, 3, 4)
    assert abs(np.mean(dens) - 1.0) < 0.2
    info = (tmp_path / "results" / "info").read_text().splitlines()
    assert "n_orb 2" in info


def test_checkerboard_rejects_non_square():
    hc = honeycomb_lattice(4, 4)
    try:
        AttractiveHubbard.build(hc, U=4.0, t=1.0, mu=0.0, beta=2.0, nt=8,
                                checkerboard=True,
                                bonds=nn_bonds("honeycomb"))
        assert False, "expected ValueError"
    except ValueError:
        pass
