"""Exact-diagonalization validation of the sign-reweighting pipeline and
of interacting non-square geometries.

Two cases the round-1 pyramid did not cover (VERDICT round 1, item 8):

1. A DOPED repulsive model (U>0, mu != 0): particle-hole symmetry is
   broken, the Metropolis sign genuinely fluctuates, and every observable
   must flow sign-weighted through the driver -> HDF5 -> analysis
   (jackknife_ratio_array reweighting by <sign>) and still land on the
   exact-diagonalization values.  This is the strongest end-to-end
   statement about the sign machinery: a wrong sign convention anywhere
   (update ratio, accumulation, analysis ratio) shifts the reweighted
   observables away from ED by O(1-<s>), far outside the tolerance.
2. An interacting attractive model on a honeycomb cell (n_orb = 2): the
   multi-orbital kinetic builder, propagation, and measurement pipeline
   against dense ED on the identical kinetic matrix.

The ED machinery (Jordan-Wigner ordering, GHQ interaction convention
-U_arg (n_up - 1/2)(n_dn - 1/2)) is shared with tests/test_ed.py and is
itself pinned against free fermions there.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from dqmc_tpu.config import Parameters  # noqa: E402
from dqmc_tpu.engine import (  # noqa: E402
    EngineConfig,
    half_warp,
    init_state,
    sweep_pair,
)
from dqmc_tpu.lattice import honeycomb_lattice  # noqa: E402
from dqmc_tpu.measure import make_context  # noqa: E402
from dqmc_tpu.measure import observables as obs  # noqa: E402
from dqmc_tpu.models import AttractiveHubbard, build_kinetic_matrix  # noqa: E402
from dqmc_tpu.run import run_simulation  # noqa: E402

from test_ed import _ed_operators  # noqa: E402


def ed_observables_K(K, U_arg, beta):
    """Dense ED of H = sum_ij K_ij c^dag_i c_j (per spin)
    - U_arg * sum_i (n_iu - 1/2)(n_id - 1/2) for an arbitrary kinetic
    matrix (generalizes test_ed.ed_observables beyond the square
    lattice).  Returns density and double occupancy per site."""
    N = K.shape[0]
    n_modes = 2 * N
    dim, c_dag_c = _ed_operators(n_modes)
    H = np.zeros((dim, dim))
    for spin in (0, 1):
        off = spin * N
        for i in range(N):
            for j in range(N):
                if K[i, j] != 0.0:
                    H += K[i, j] * c_dag_c(i + off, j + off)
    n_ops = [c_dag_c(m, m) for m in range(n_modes)]
    eye = np.eye(dim)
    for i in range(N):
        H -= U_arg * ((n_ops[i] - 0.5 * eye) @ (n_ops[i + N] - 0.5 * eye))
    w, V = np.linalg.eigh(H)
    w -= w.min()
    boltz = np.exp(-beta * w)
    Z = boltz.sum()

    def expect(op):
        return float(np.einsum("as,ab,bs,s->", V, op, V, boltz) / Z)

    density = sum(expect(n_ops[m]) for m in range(n_modes)) / N
    docc = sum(expect(n_ops[i] @ n_ops[i + N]) for i in range(N)) / N
    return {"density": density, "doubleOcc": docc}


@pytest.mark.slow
def test_doped_repulsive_sign_reweighting_end_to_end(tmp_path):
    """Doped 2x2 repulsive Hubbard: sign-weighted bins through the driver,
    HDF5, and the analysis jackknife-ratio reweighting, against ED."""
    import h5py

    # mu = -1.5, beta = 3 rather than the original -0.6/2.0: the milder
    # workload's negative-sign probability is a per-trajectory lottery
    # (a jax upgrade flipped it to all-positive for every seed tried —
    # round-4), while this one reads <sign> ~ 0.97 robustly
    L, U, t, mu, beta, nt = 2, 4.0, 1.0, -1.5, 3.0, 30
    from dqmc_tpu.lattice import square_lattice
    K = build_kinetic_matrix(square_lattice(L, L), t=t, mu=mu)
    exact = ed_observables_K(K, -U, beta)     # repulsive: U_arg = -U

    params = Parameters.from_string(f"""
[Lattice]
L1 = {L}
L2 = {L}
[hubbard]
model = repulsive
U = {U}
t = {t}
mu = {mu}
[simulation]
beta = {beta}
nt = {nt}
n_therms = 120
n_sweeps = 30
n_bins = 12
n_stab = 4
seed = 11
dtype = float64
[walkers]
n_walkers = 4
""")
    out = str(tmp_path / "results")
    run_simulation(params, out_dir=out, verbose=False)

    # the run must be genuinely sign-prone: a recorded <sign> < 1
    with h5py.File(tmp_path / "results" / "data_0.h5") as f:
        signs = np.array([float(f[f"bin_{b}/scalar/sign"][0])
                          for b in range(12)])
    assert signs.mean() < 0.9999, "doped run unexpectedly sign-free"
    assert signs.mean() > 0.2, "sign collapsed; tolerances meaningless"

    from dqmc_tpu.analysis.cli import main as analysis_main
    import os
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        analysis_main(["-d", "results"])
    finally:
        os.chdir(cwd)

    stats = {}
    for line in (tmp_path / "scalarObservables.dat").read_text().splitlines():
        if line.startswith("#") or not line.strip():
            continue
        name, mean, err = line.split()
        stats[name] = (float(mean), float(err))

    for name in ("density", "doubleOcc"):
        mean, err = stats[name]
        ex = exact[name]
        # 5 sigma statistical + O(dtau^2) Trotter envelope
        tol = 5 * err + 0.06 * abs(ex) + 0.02
        assert abs(mean - ex) < tol, (
            f"{name}: reweighted {mean:.4f} +- {err:.4f} vs ED {ex:.4f} "
            f"(<sign> = {signs.mean():.3f})")


@pytest.mark.slow
def test_honeycomb_ed_attractive():
    """Interacting attractive Hubbard on a 2x1 honeycomb cell (4 sites,
    n_orb = 2) vs dense ED on the identical kinetic matrix."""
    U, t, mu, beta, nt = 4.0, 1.0, -0.3, 2.0, 20
    lat = honeycomb_lattice(2, 1)
    assert lat.n_sites == 4
    K = build_kinetic_matrix(lat, t=t, mu=mu)
    exact = ed_observables_K(K, U, beta)      # attractive: U_arg = +U

    model = AttractiveHubbard.build(lat, U=U, t=t, mu=mu, beta=beta, nt=nt)
    cfg = EngineConfig(nt=nt, n_stab=4)
    ctx = make_context(lat)

    n_walkers, n_therm, n_meas = 8, 200, 600
    keys = jax.random.split(jax.random.PRNGKey(7), n_walkers)
    states = jax.vmap(lambda k: init_state(model, cfg, k))(keys)
    step = jax.jit(jax.vmap(lambda s: sweep_pair(model, cfg, s)))

    @jax.jit
    def measure(states):
        G = jax.vmap(lambda g: half_warp(model, g))(states.G)
        return {
            "density": jax.vmap(lambda g: obs.density(g, ctx))(G),
            "doubleOcc": jax.vmap(lambda g: obs.double_occupancy(g, ctx))(G),
        }

    for _ in range(n_therm):
        states = step(states)
    sums = None
    for _ in range(n_meas):
        states = step(states)
        m = measure(states)
        sums = m if sums is None else {k: sums[k] + m[k] for k in m}

    for name, ex in exact.items():
        vals = np.asarray(sums[name]) / n_meas
        mean, sem = vals.mean(), vals.std(ddof=1) / np.sqrt(n_walkers)
        tol = 5 * sem + 0.06 * abs(ex) + 0.01
        assert abs(mean - ex) < tol, (
            f"{name}: DQMC {mean:.4f} +- {sem:.4f} vs ED {ex:.4f}")
