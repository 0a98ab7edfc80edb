"""Measurement-layer tests: observables vs direct-loop evaluation, the
vectorized transforms vs brute-force loops implementing the reference's
index conventions, and the unequal-time sweep vs free-fermion analytics."""

import jax
import jax.numpy as jnp
import numpy as np

import golden
from dqmc_tpu.engine import EngineConfig, init_state, sweep_pair
from dqmc_tpu.engine.uneqtime import sweep_unequal_time
from dqmc_tpu.lattice import square_lattice
from dqmc_tpu.measure import make_context, observables as obs
from dqmc_tpu.measure.transforms import r_to_k, site_to_r
from dqmc_tpu.models import AttractiveHubbard, build_kinetic_matrix


def brute_site_to_r(chi, L1, L2, n_orb):
    """Direct-loop port of transform::chi_site_to_chi_r semantics
    (measurementh5.h:20-66) for even L."""
    if chi.ndim == 2:
        chi = chi[:, :, None]
    n_tau = chi.shape[2]
    n_cells = L1 * L2
    out = np.zeros((L1, L2, n_orb * n_orb * n_tau))
    for tau in range(n_tau):
        for i in range(chi.shape[0]):
            for j in range(chi.shape[1]):
                a, b = i % n_orb, j % n_orb
                ci, cj = i // n_orb, j // n_orb
                cxi, cyi = ci % L1, ci // L1
                cxj, cyj = cj % L1, cj // L1
                dx = cxj - cxi
                if dx > L1 // 2: dx -= L1
                if dx <= -L1 // 2: dx += L1
                dy = cyj - cyi
                if dy > L2 // 2: dy -= L2
                if dy <= -L2 // 2: dy += L2
                out[dx + L1 // 2 - 1, dy + L2 // 2 - 1,
                    (a * n_orb + b) * n_tau + tau] += chi[i, j, tau] / n_cells
    return out


def brute_r_to_k(chi_r, lat):
    """Direct-loop port of transform::chi_r_to_chi_k (measurementh5.h:78-116)."""
    L1, L2 = lat.L1, lat.L2
    S = chi_r.shape[2]
    out = np.zeros((L1, L2, S), dtype=complex)
    ks = lat.k_points
    for kidx in range(len(ks)):
        k = ks[kidx]
        kx_idx, ky_idx = kidx // L2, kidx % L2
        for s in range(S):
            for x in range(L1):
                for y in range(L2):
                    dx = (x - (L1 / 2 - 1)) * lat.a1[0] + (y - (L2 / 2 - 1)) * lat.a2[0]
                    dy = (x - (L1 / 2 - 1)) * lat.a1[1] + (y - (L2 / 2 - 1)) * lat.a2[1]
                    phase = k[0] * dx + k[1] * dy
                    out[kx_idx, ky_idx, s] += chi_r[x, y, s] * np.exp(-1j * phase)
    return out


def test_site_to_r_matches_brute(rng):
    lat = square_lattice(4, 4)
    ctx = make_context(lat)
    chi = rng.standard_normal((16, 16))
    got = np.asarray(site_to_r(jnp.asarray(chi), ctx))
    want = brute_site_to_r(chi, 4, 4, 1)
    np.testing.assert_allclose(got, want.reshape(4, 4, 1), atol=1e-12)

    chi3 = rng.standard_normal((16, 16, 3))
    got3 = np.asarray(site_to_r(jnp.asarray(chi3), ctx))
    want3 = brute_site_to_r(chi3, 4, 4, 1)
    np.testing.assert_allclose(got3, want3, atol=1e-12)


def test_site_to_r_pair_matmul_matches_einsum(rng):
    """Both site->r formulations (one-hot pair matmul vs separable shift
    einsums) must agree exactly, including multi-orbital lattices and the
    leading-batch entry point used by the fused uneq measurement."""
    import dataclasses
    from dqmc_tpu.lattice import honeycomb_lattice
    from dqmc_tpu.measure.transforms import site_to_r_batched

    for lat in (square_lattice(4, 6), honeycomb_lattice(3, 3)):
        ctx = make_context(lat)
        assert ctx.pair_cols is not None
        ctx_no_pair = dataclasses.replace(ctx, pair_cols=None)
        ns = lat.n_sites
        chi = rng.standard_normal((ns, ns, 2))
        got = np.asarray(site_to_r(jnp.asarray(chi), ctx))
        want = np.asarray(site_to_r(jnp.asarray(chi), ctx_no_pair))
        np.testing.assert_allclose(got, want, atol=1e-12)
        # leading-batch entry: (B, ns, ns) -> (B, L1, L2, no^2)
        chis = jnp.asarray(rng.standard_normal((3, ns, ns)))
        red = np.asarray(site_to_r_batched(chis, ctx))
        for b in range(3):
            one = np.asarray(site_to_r(chis[b], ctx_no_pair))
            np.testing.assert_allclose(
                red[b], one.reshape(red[b].shape), atol=1e-12)


def test_r_to_k_matches_brute(rng):
    lat = square_lattice(4, 4)
    ctx = make_context(lat)
    chi_r = rng.standard_normal((4, 4, 2))
    got = np.asarray(r_to_k(jnp.asarray(chi_r), ctx))
    want = brute_r_to_k(chi_r, lat)
    np.testing.assert_allclose(got, want, atol=1e-12)


def _fake_G(rng, ns, nfl=1):
    return jnp.asarray(rng.standard_normal((nfl, ns, ns)) * 0.3
                       + 0.5 * np.eye(ns)[None])


def test_scalar_observables_vs_loops(rng):
    lat = square_lattice(4, 4)
    ctx = make_context(lat)
    G = _fake_G(rng, 16)
    g = np.asarray(G[0])
    gc = np.eye(16) - g

    np.testing.assert_allclose(float(obs.density(G, ctx)),
                               2 * np.mean(np.diag(gc)), rtol=1e-12)
    np.testing.assert_allclose(float(obs.double_occupancy(G, ctx)),
                               np.mean(np.diag(gc) ** 2), rtol=1e-12)
    np.testing.assert_allclose(float(obs.swave_pairing(G, ctx)),
                               np.sum(gc * gc) / 16, rtol=1e-12)


def test_density_corr_vs_loops(rng):
    lat = square_lattice(4, 4)
    ctx = make_context(lat)
    G = _fake_G(rng, 16)
    g = np.asarray(G[0])
    n = 2 * (1 - np.diag(g))
    n_avg = n.mean()
    want = np.empty((16, 16))
    for i in range(16):
        for j in range(16):
            want[i, j] = (n[i] * n[j]
                          + 2.0 * (1.0 - g[j, i]) * g[i, j]   # reference's term
                          - n_avg ** 2)
    np.testing.assert_allclose(np.asarray(obs.density_corr(G, ctx)), want,
                               atol=1e-12)


def test_spin_corr_vs_loops(rng):
    """spinZZ/spinXX against direct Wick loops with INDEPENDENT up/down
    Green's functions, plus the SU(2) identity zz == xx at Gu == Gd."""
    lat = square_lattice(4, 4)
    ctx = make_context(lat)
    gu = np.asarray(_fake_G(rng, 16)[0])
    gd = np.asarray(_fake_G(rng, 16)[0])
    G2 = jnp.stack([jnp.asarray(gu), jnp.asarray(gd)])

    eye = np.eye(16)
    nu, nd = 1 - np.diag(gu), 1 - np.diag(gd)
    zz = np.empty((16, 16))
    xx = np.empty((16, 16))
    for i in range(16):
        for j in range(16):
            d = eye[i, j]
            nn_uu = nu[i] * nu[j] + (d - gu[j, i]) * gu[i, j]
            nn_dd = nd[i] * nd[j] + (d - gd[j, i]) * gd[i, j]
            zz[i, j] = 0.25 * (nn_uu + nn_dd - nu[i] * nd[j] - nd[i] * nu[j])
            xx[i, j] = 0.25 * ((d - gu[j, i]) * gd[i, j]
                               + (d - gd[j, i]) * gu[i, j])
    np.testing.assert_allclose(np.asarray(obs.spin_zz_corr(G2, ctx)), zz,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(obs.spin_xx_corr(G2, ctx)), xx,
                               atol=1e-12)

    G1 = _fake_G(rng, 16)      # spin-symmetric single stored flavor
    np.testing.assert_allclose(np.asarray(obs.spin_zz_corr(G1, ctx)),
                               np.asarray(obs.spin_xx_corr(G1, ctx)),
                               atol=1e-12)


def test_currxx_vs_loops(rng):
    lat = square_lattice(4, 4)
    ctx = make_context(lat)
    ns = 16
    Gtt = _fake_G(rng, ns)
    Gt0 = _fake_G(rng, ns)
    G0t = _fake_G(rng, ns)
    G00 = _fake_G(rng, ns)
    got = np.asarray(obs.currxx_tau(Gtt, Gt0, G0t, G00, ctx))

    gtt, gt0, g0t, g00 = (np.asarray(x[0]) for x in (Gtt, Gt0, G0t, G00))
    nbr = np.asarray(ctx.nbr_x)
    want = np.empty((ns, ns))
    for i in range(ns):
        ix = nbr[i]
        dc1_i = 2 * gtt[ix, i]
        dc2_i = 2 * gtt[i, ix]
        for j in range(ns):
            jx = nbr[j]
            dc1_j = 2 * g00[jx, j]
            dc2_j = 2 * g00[j, jx]
            c1 = 2 * g0t[jx, i] * gt0[ix, j]
            c2 = 2 * g0t[j, i] * gt0[ix, jx]
            c3 = 2 * g0t[jx, ix] * gt0[i, j]
            c4 = 2 * g0t[j, ix] * gt0[i, jx]
            t1 = dc1_i * dc1_j - c1
            t2 = dc1_i * dc2_j - c2
            t3 = dc2_i * dc1_j - c3
            t4 = dc2_i * dc2_j - c4
            want[i, j] = -(t1 - t2 - t3 + t4)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_spinzz_tau_reduces_to_equal_time(rng):
    """At tau = 0 (Gtt = G00 = G, Gt0 = G, G0t = G - I) the time-displaced
    spin correlator must equal spin_zz_corr exactly — for independent
    up/down G (repulsive layout) and the spin-symmetric case."""
    lat = square_lattice(4, 4)
    ctx = make_context(lat)
    ns = 16
    for nfl in (1, 2):
        G = jnp.asarray(rng.standard_normal((nfl, ns, ns)) * 0.2
                        + 0.5 * np.eye(ns))
        eye = jnp.eye(ns, dtype=G.dtype)
        got = obs.spinzz_tau(G, G, G - eye, G, ctx)
        want = obs.spin_zz_corr(G, ctx)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-12)


def test_spinzz_tau_free_fermion():
    """U=0 check: <Sz_i(tau) Sz_j> from the DQMC triplet must match the
    analytic free-fermion Wick expression built from the exact
    single-particle propagators."""
    lat = square_lattice(4, 4)
    ctx = make_context(lat)
    beta, nt, ns = 4.0, 16, 16
    model = AttractiveHubbard.build(lat, U=0.0, t=1.0, mu=-0.1, beta=beta,
                                    nt=nt)
    cfg = EngineConfig(nt=nt, n_stab=4)
    K = build_kinetic_matrix(lat, t=1.0, mu=-0.1)

    state = init_state(model, cfg, jax.random.PRNGKey(0))
    state = sweep_pair(model, cfg, state)
    ys, err = sweep_unequal_time(model, cfg, state)
    assert float(err) < 1e-11
    dtau = beta / nt
    for l in (0, 5, 12):
        got = np.asarray(obs.spinzz_tau(ys.Gtt[l], ys.Gt0[l], ys.G0t[l],
                                        ys.Gtt[0], ctx))
        gtt = golden.free_fermion_gtt(K, beta)          # spin-symmetric
        gt0 = golden.free_fermion_gt0(K, beta, l * dtau)
        g0t = np.asarray(ys.G0t[l, 0])
        # m(tau) = m(0) = 0 for equal spins; exchange term only
        want = 0.25 * (-2.0 * g0t.T * gt0)
        np.testing.assert_allclose(got, want, atol=1e-9)
        # sanity: the spin-symmetric m-product vanishes
        assert abs(np.asarray(ys.Gtt[l, 0] - ys.Gtt[l, -1]).max()) < 1e-12


def test_density_tau_reduces_to_textbook_equal_time(rng):
    """At tau = 0 the time-displaced charge correlator equals the TEXTBOOK
    densityCorr (delta_ij - G(j,i), not the reference's 1-G quirk)."""
    lat = square_lattice(4, 4)
    ctx = make_context(lat)
    ns = 16
    G = _fake_G(rng, ns)
    eye = jnp.eye(ns, dtype=G.dtype)
    got = np.asarray(obs.density_tau(G, G, G - eye, G, ctx))
    g = np.asarray(G[0])
    n = 2 * (1 - np.diag(g))
    want = np.empty((ns, ns))
    d = np.eye(ns)
    for i in range(ns):
        for j in range(ns):
            want[i, j] = (n[i] * n[j]
                          + 2.0 * (d[i, j] - g[j, i]) * g[i, j]
                          - n.mean() ** 2)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_density_tau_free_fermion():
    """U=0: <n_i(tau) n_j> from the DQMC triplet matches the analytic Wick
    expression from the exact free propagators."""
    lat = square_lattice(4, 4)
    ctx = make_context(lat)
    beta, nt, ns = 4.0, 16, 16
    model = AttractiveHubbard.build(lat, U=0.0, t=1.0, mu=-0.1, beta=beta,
                                    nt=nt)
    cfg = EngineConfig(nt=nt, n_stab=4)
    K = build_kinetic_matrix(lat, t=1.0, mu=-0.1)

    state = init_state(model, cfg, jax.random.PRNGKey(0))
    state = sweep_pair(model, cfg, state)
    ys, err = sweep_unequal_time(model, cfg, state)
    dtau = beta / nt
    gtt = golden.free_fermion_gtt(K, beta)
    n_vec = 2 * (1 - np.diag(gtt))
    for l in (4, 10):
        got = np.asarray(obs.density_tau(ys.Gtt[l], ys.Gt0[l], ys.G0t[l],
                                         ys.Gtt[0], ctx))
        gt0 = golden.free_fermion_gt0(K, beta, l * dtau)
        g0t = np.asarray(ys.G0t[l, 0])
        want = (n_vec[:, None] * n_vec[None, :] - 2.0 * g0t.T * gt0
                - n_vec.mean() ** 2)
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_unequal_time_free_fermion():
    """U=0: Gt0(tau) must match the analytic free propagator at every tau."""
    lat = square_lattice(4, 4)
    beta, nt = 4.0, 16
    model = AttractiveHubbard.build(lat, U=0.0, t=1.0, mu=-0.1, beta=beta, nt=nt)
    cfg = EngineConfig(nt=nt, n_stab=4)
    K = build_kinetic_matrix(lat, t=1.0, mu=-0.1)

    state = init_state(model, cfg, jax.random.PRNGKey(0))
    state = sweep_pair(model, cfg, state)  # stack in post-backward layout
    ys, err = sweep_unequal_time(model, cfg, state)
    assert float(err) < 1e-11
    dtau = beta / nt
    for l in [0, 3, 8, 15, 16]:
        want = golden.free_fermion_gt0(K, beta, l * dtau)
        np.testing.assert_allclose(np.asarray(ys.Gt0[l, 0]), want, atol=1e-10)
        np.testing.assert_allclose(np.asarray(ys.Gtt[l, 0]),
                                   golden.free_fermion_gtt(K, beta), atol=1e-10)
    # G0t(tau) = -[B(beta,tau)^{-1} + B(tau,0)]^{-1} = -(G(0,0) e^{+tau K} ... )
    # check boundary identities instead: G0t(0) = G - I, G0t(beta) = -G
    np.testing.assert_allclose(np.asarray(ys.G0t[0, 0]),
                               np.asarray(ys.Gtt[0, 0]) - np.eye(16), atol=1e-10)
    np.testing.assert_allclose(np.asarray(ys.G0t[nt, 0]),
                               -np.asarray(ys.Gtt[nt, 0]), atol=1e-10)
    np.testing.assert_allclose(np.asarray(ys.Gt0[nt, 0]),
                               np.eye(16) - np.asarray(ys.Gtt[nt, 0]), atol=1e-10)


def test_unequal_time_interacting_stability():
    lat = square_lattice(4, 4)
    model = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1, beta=4.0, nt=40)
    cfg = EngineConfig(nt=40, n_stab=5)
    state = init_state(model, cfg, jax.random.PRNGKey(1))
    for _ in range(2):
        state = sweep_pair(model, cfg, state)
    ys, err = sweep_unequal_time(model, cfg, state)
    assert float(err) < 1e-8
    assert ys.Gt0.shape == (41, 1, 16, 16)


def test_unequal_time_half_warp_parity():
    """warp=True inside the fused measurement scan must equal applying the
    half-warp to the densely reconstructed TauGreens afterwards — the
    reference warps Gtt AND Gt0/G0t per tau when symmetric (dqmc.cpp:300-312).
    """
    from dqmc_tpu.engine import half_warp

    lat = square_lattice(4, 4)
    model = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1, beta=4.0,
                                    nt=20)
    cfg = EngineConfig(nt=20, n_stab=4)
    ctx = make_context(lat, jnp.float64)
    state = init_state(model, cfg, jax.random.PRNGKey(2))
    state = sweep_pair(model, cfg, state)

    def measure(Gtt, Gt0, G0t, G00):
        return {"greenTau": site_to_r(obs.green_tau(Gtt, Gt0, G0t, G00, ctx),
                                      ctx),
                "currxxTau": site_to_r(obs.currxx_tau(Gtt, Gt0, G0t, G00, ctx),
                                       ctx)}

    # fused path with in-scan warping
    ys_w, _ = sweep_unequal_time(model, cfg, state, measure_fn=measure,
                                 warp=True)
    # oracle: dense TauGreens, warped post-hoc, measured per tau
    ys_raw, _ = sweep_unequal_time(model, cfg, state)
    G00w = half_warp(model, state.G)
    for l in range(cfg.nt + 1):
        want = measure(half_warp(model, ys_raw.Gtt[l]),
                       half_warp(model, ys_raw.Gt0[l]),
                       half_warp(model, ys_raw.G0t[l]), G00w)
        for k in ys_w:
            np.testing.assert_allclose(np.asarray(ys_w[k][l]),
                                       np.asarray(want[k]), atol=1e-12,
                                       err_msg=f"{k} tau={l}")
    # warping must not change the equal-time boundary identity trace
    # (tr G is invariant under the similarity transform)
    np.testing.assert_allclose(
        np.trace(np.asarray(half_warp(model, ys_raw.Gtt[0])[0])),
        np.trace(np.asarray(ys_raw.Gtt[0][0])), atol=1e-10)


def test_iter_unequal_time_chunks_match_full():
    """The chunked tau-streaming iterator must concatenate exactly to the
    one-shot TauGreens stack (interacting chain, ragged chunk size)."""
    from dqmc_tpu.engine.uneqtime import iter_unequal_time

    lat = square_lattice(4, 4)
    beta, nt = 4.0, 14
    model = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1, beta=beta,
                                    nt=nt)
    cfg = EngineConfig(nt=nt, n_stab=7)
    state = init_state(model, cfg, jax.random.PRNGKey(2))
    state = sweep_pair(model, cfg, state)

    full, _ = sweep_unequal_time(model, cfg, state, warp=True)
    chunks = list(iter_unequal_time(model, cfg, state, tau_chunk=5,
                                    warp=True))
    assert [s for s, _ in chunks] == [0, 5, 10]
    got = {
        f: np.concatenate([np.asarray(getattr(ys, f)) for _, ys in chunks])
        for f in ("Gtt", "Gt0", "G0t")
    }
    for f in ("Gtt", "Gt0", "G0t"):
        assert got[f].shape[0] == nt + 1
        np.testing.assert_array_equal(got[f], np.asarray(getattr(full, f)))


def test_spinxx_tau_reduces_to_equal_time(rng):
    """At tau = 0 the transverse time-displaced correlator equals
    spin_xx_corr exactly, for both flavor layouts; for spin-symmetric G
    it also equals the spinzz exchange (SU(2) without the m-product)."""
    lat = square_lattice(4, 4)
    ctx = make_context(lat)
    ns = 16
    for nfl in (1, 2):
        G = jnp.asarray(np.random.default_rng(nfl).standard_normal(
            (nfl, ns, ns)) * 0.2 + 0.5 * np.eye(ns))
        eye = jnp.eye(ns, dtype=G.dtype)
        got = obs.spinxx_tau(G, G, G - eye, G, ctx)
        want = obs.spin_xx_corr(G, ctx)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-12)
