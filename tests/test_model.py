import jax.numpy as jnp
import numpy as np
import scipy.linalg

from dqmc_tpu import hsfield
from dqmc_tpu.lattice import square_lattice
from dqmc_tpu.models import AttractiveHubbard, build_kinetic_matrix


def make_model(L=4, U=4.0, t=1.0, mu=-0.1, beta=2.0, nt=8):
    lat = square_lattice(L, L)
    return lat, AttractiveHubbard.build(lat, U=U, t=t, mu=mu, beta=beta, nt=nt)


def test_kinetic_matrix_structure():
    lat = square_lattice(4, 4)
    K = build_kinetic_matrix(lat, t=1.0, mu=-0.1)
    assert K.shape == (16, 16)
    np.testing.assert_allclose(np.diag(K), 0.1 * np.ones(16))  # -mu = +0.1
    np.testing.assert_allclose(K, K.T)
    # each site couples to 4 neighbors with -t
    offdiag = K - np.diag(np.diag(K))
    assert np.all(np.sort(np.sum(offdiag != 0, axis=1)) == 4)
    assert set(np.unique(offdiag)) == {0.0, -1.0}


def test_expm_matrices():
    lat, m = make_model(beta=2.0, nt=8)
    K = build_kinetic_matrix(lat, t=1.0, mu=-0.1)
    dtau = 2.0 / 8
    np.testing.assert_allclose(np.asarray(m.expK), scipy.linalg.expm(-dtau * K),
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(m.expK @ m.invexpK), np.eye(16),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.expK_half @ m.expK_half),
                               np.asarray(m.expK), atol=1e-12)
    np.testing.assert_allclose(float(m.g), np.sqrt(0.5 * 4.0 * dtau))


def test_expV_and_B():
    lat, m = make_model()
    fields_l = jnp.asarray(np.arange(16) % 4, dtype=jnp.int32)
    v = np.asarray(m.expV_diag(fields_l))
    assert v.shape == (1, 16)
    g = float(m.g)
    np.testing.assert_allclose(v[0], np.exp(g * hsfield.ETA[np.arange(16) % 4]))
    B, invB = m.B_mats(fields_l)
    np.testing.assert_allclose(np.asarray(B[0]),
                               v[0][:, None] * np.asarray(m.expK), atol=1e-14)
    np.testing.assert_allclose(np.asarray(B[0] @ invB[0]), np.eye(16), atol=1e-12)


def test_update_factors_consistency():
    """delta must equal 1/bosonR - 1 for the attractive model (alpha=-1,
    model.cpp:99-107), and B' = (I + delta e_i e_i^T) B."""
    lat, m = make_model()
    old, new = jnp.asarray(0), jnp.asarray(3)
    gammaR, bosonR, delta = m.update_factors(old, new)
    np.testing.assert_allclose(float(delta[0]), 1.0 / float(bosonR) - 1.0,
                               rtol=1e-14)
    np.testing.assert_allclose(
        float(gammaR), hsfield.GAMMA[3] / hsfield.GAMMA[0], rtol=1e-14)

    fields_l = jnp.zeros(16, dtype=jnp.int32)
    B_old = np.asarray(m.B_of(fields_l)[0])
    B_new = np.asarray(m.B_of(fields_l.at[5].set(3))[0])
    expected = B_old.copy()
    expected[5, :] *= 1.0 + float(delta[0])
    np.testing.assert_allclose(B_new, expected, rtol=1e-12)


def test_det_ratio_against_dense_determinant():
    """det ratio [1+(1-G_ii)delta]^2 must equal det(M')/det(M) squared where
    M = I + B(beta,0) and the flip scales row i of one B factor."""
    rng = np.random.default_rng(7)
    lat, m = make_model(L=2, beta=1.0, nt=4)
    ns = 4
    fields = jnp.asarray(rng.integers(0, 4, size=(4, ns)), dtype=jnp.int32)
    Bs = [np.asarray(m.B_of(fields[l])[0]) for l in range(4)]
    Bprod = np.eye(ns)
    for B in Bs:
        Bprod = B @ Bprod
    M = np.eye(ns) + Bprod
    G00 = np.linalg.inv(M)
    # G(1) = B_0 G(0,0) B_0^{-1}
    G1 = Bs[0] @ G00 @ np.linalg.inv(Bs[0])

    i = 2
    old = int(fields[0, i])
    new = (old + 2) % 4
    gammaR, bosonR, delta = m.update_factors(jnp.asarray(old), jnp.asarray(new))
    detR_formula = (1.0 + (1.0 - G1[i, i]) * float(delta[0])) ** 2

    B0_new = np.asarray(m.B_of(fields[0].at[i].set(new))[0])
    Bprod_new = np.eye(ns)
    for B in [B0_new] + Bs[1:]:
        Bprod_new = B @ Bprod_new
    detR_dense = (np.linalg.det(np.eye(ns) + Bprod_new) / np.linalg.det(M)) ** 2
    np.testing.assert_allclose(detR_formula, detR_dense, rtol=1e-9)


def test_global_action_value():
    lat, m = make_model()
    fields = jnp.asarray(np.random.default_rng(3).integers(0, 4, (8, 16)),
                         dtype=jnp.int32)
    log_det_M = jnp.asarray([1.7])
    S = float(m.global_action(fields, log_det_M))
    fs = np.asarray(fields)
    expected = (-2.0 * 1.7
                - float(m.alpha) * float(m.g) * hsfield.ETA[fs].sum()
                - np.log(hsfield.GAMMA[fs]).sum())
    np.testing.assert_allclose(S, expected, rtol=1e-12)
