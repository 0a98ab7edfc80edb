"""North-star trajectory parity: max|dG| < 1e-10 on a fixed field config.

BASELINE.md's parity target is max|dG| < 1e-10 against the reference
binary's Green's functions on a fixed field configuration.  The reference
cannot be compiled in this environment (no Armadillo/MPI/HDF5 dev headers
and zero network egress — see NOTES.md), so the oracle here is strictly
STRONGER than the binary: an arbitrary-precision (mpmath, 60 significant
digits) evaluation of the exact linear algebra the reference implements,

    G(tau,tau) = [I + B(tau,0) B(beta,tau)]^-1          (stablelinalg.cpp:94)
    Gt0(tau)   = [B(tau,0)^-1 + B(beta,tau)]^-1         (stablelinalg.cpp:160)
    G0t(tau)   = -[B(beta,tau)^-1 + B(tau,0)]^-1
    log|det M| = log|det(I + B(beta,0))|                (stablelinalg.cpp:118)

fed with the engine's own f64 B-matrix ingredients (bit-exact expK and
expV), so any deviation is purely the engine's stabilized-propagation
error.  The reference binary itself computes these in f64 with ~1e-12
noise; exact arithmetic has none.
"""

import jax
import jax.numpy as jnp
import mpmath as mp
import numpy as np
import pytest

from dqmc_tpu.engine import EngineConfig, init_state
from dqmc_tpu.engine.sweep import rebuild_stack_and_greens, sweep
from dqmc_tpu.engine.uneqtime import sweep_unequal_time
from dqmc_tpu.lattice import square_lattice
from dqmc_tpu.models import AttractiveHubbard


def _mpm(a: np.ndarray) -> mp.matrix:
    """f64 array -> exact mpmath matrix (binary-exact embedding)."""
    m = mp.matrix(a.shape[0], a.shape[1])
    for i in range(a.shape[0]):
        for j in range(a.shape[1]):
            m[i, j] = mp.mpf(float(a[i, j]))
    return m


def _np(m: mp.matrix) -> np.ndarray:
    return np.array(m.tolist(), dtype=np.float64)


@pytest.fixture(scope="module")
def trajectory():
    mp.mp.dps = 60
    L, beta, nt, n_stab = 4, 4.0, 40, 5
    lat = square_lattice(L, L)
    model = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1, beta=beta,
                                    nt=nt, dtype=jnp.float64)
    cfg = EngineConfig(nt=nt, n_stab=n_stab)
    ns = lat.n_sites

    rng = np.random.default_rng(7)
    fields = jnp.asarray(rng.integers(0, 4, (nt, ns)), dtype=jnp.int32)

    # the engine's own B ingredients, embedded exactly
    expK = _mpm(np.asarray(model.expK, np.float64))
    Bs = []
    for l in range(nt):
        ev = np.asarray(model.expV_diag(fields[l]), np.float64)[0]
        Bs.append(mp.diag([mp.mpf(float(v)) for v in ev]) * expK)

    # exact prefix/suffix products and Green's functions at block boundaries
    taus = sorted({0, n_stab, 2 * n_stab, nt // 2, nt - n_stab, nt})
    eye = mp.eye(ns)
    prefix = {0: eye}
    acc = eye
    for l in range(nt):
        acc = Bs[l] * acc
        if (l + 1) in taus:
            prefix[l + 1] = acc
    Bfull = acc
    exact = {}
    for tau in taus:
        Bt0 = prefix[tau]
        Bbt = Bfull * Bt0**-1
        Gtt = (eye + Bt0 * Bbt)**-1
        Gt0 = (Bt0**-1 + Bbt)**-1
        G0t = -(Bbt**-1 + Bt0)**-1
        exact[tau] = tuple(map(_np, (Gtt, Gt0, G0t)))
    log_det_exact = float(mp.log(abs(mp.det(eye + Bfull))))

    # engine trajectory on the same fields (updates off)
    stack, G, log_det = rebuild_stack_and_greens(model, cfg, fields)
    state = init_state(model, cfg, jax.random.PRNGKey(0))
    state = state.__class__(
        fields=fields, G=G, stack=stack, log_det_M=log_det, key=state.key,
        acc_sum=state.acc_sum, sign=state.sign, err_max=state.err_max,
        err_sum=state.err_sum, err_count=state.err_count)
    ys, err = sweep_unequal_time(model, cfg, state)
    return taus, exact, log_det_exact, state, ys, float(err), model, cfg


def test_equal_time_green_parity(trajectory):
    taus, exact, _, state, ys, _, _, _ = trajectory
    worst = 0.0
    for tau in taus:
        dG = np.abs(np.asarray(ys.Gtt[tau, 0], np.float64) - exact[tau][0]).max()
        worst = max(worst, dG)
    assert worst < 1e-10, f"max|dGtt| = {worst:.3e}"


def test_unequal_time_green_parity(trajectory):
    taus, exact, _, _, ys, _, _, _ = trajectory
    worst = 0.0
    for tau in taus:
        dG = np.abs(np.asarray(ys.Gt0[tau, 0], np.float64) - exact[tau][1]).max()
        dG = max(dG, np.abs(np.asarray(ys.G0t[tau, 0], np.float64)
                            - exact[tau][2]).max())
        worst = max(worst, dG)
    assert worst < 1e-10, f"max|dGt0/G0t| = {worst:.3e}"


def test_log_det_parity(trajectory):
    _, _, log_det_exact, state, _, _, _, _ = trajectory
    # spin-symmetric model: log_det_M is per flavor
    assert abs(float(state.log_det_M[0]) - log_det_exact) < 1e-8


def test_forward_backward_roundtrip_parity(trajectory):
    """A no-update forward+backward sweep pair must return G(0,0) to the
    exact value (the trajectory visits every slice and restabilizes)."""
    taus, exact, _, state, _, _, model, cfg = trajectory
    s = sweep(model, cfg, state, forward=True, update=False)
    s = sweep(model, cfg, s, forward=False, update=False)
    dG = np.abs(np.asarray(s.G[0], np.float64) - exact[0][0]).max()
    assert dG < 1e-10, f"roundtrip max|dG| = {dG:.3e}"
    assert float(s.err_max) < 1e-10


def test_self_check_error_is_tight(trajectory):
    err = trajectory[5]
    assert err < 1e-10
