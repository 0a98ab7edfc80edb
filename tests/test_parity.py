"""Engine-level df32 parity probe vs the f64 engine rebuild."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from dqmc_tpu.engine import EngineConfig  # noqa: E402
from dqmc_tpu.engine.parity import parity_rebuild_greens  # noqa: E402
from dqmc_tpu.engine.sweep import rebuild_stack_and_greens  # noqa: E402
from dqmc_tpu.lattice import square_lattice  # noqa: E402
from dqmc_tpu.models import AttractiveHubbard  # noqa: E402
from dqmc_tpu.ops import df32  # noqa: E402

jax.config.update("jax_enable_x64", True)


def test_parity_rebuild_matches_f64_engine():
    """G(0,0) from the df32 parity rebuild must match the f64 engine's
    rebuild on the same fields at the df accuracy tier (~1e-8 at beta=8;
    see tests/test_df_linalg.py's module docstring for the tier and for
    why an earlier round's 1e-10 xfail compared against a numerically
    void dense-f64 oracle)."""
    lat = square_lattice(4, 4)
    nt, n_stab, beta = 40, 5, 8.0
    m64 = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1, beta=beta,
                                  nt=nt, dtype=jnp.float64)
    cfg = EngineConfig(nt=nt, n_stab=n_stab)
    rng = np.random.default_rng(11)
    fields = jnp.asarray(rng.integers(0, 4, (nt, lat.n_sites)), jnp.int32)

    _, G64, logdet64 = rebuild_stack_and_greens(m64, cfg, fields)
    Gdf, logdet_df = parity_rebuild_greens(m64, cfg, fields)

    err = float(jnp.max(jnp.abs(df32.to_f64(Gdf) - G64[0])))
    assert err < 1e-7, err
    assert abs(float(logdet_df) - float(logdet64[0])) < 1e-5


def test_tf_parity_rebuild_beats_1e10_vs_gold():
    """North star at the ENGINE level (BASELINE.md parity row): the tf32
    rebuild of G(0,0) from a fixed field configuration lands under 1e-10
    vs a 60-digit mpmath gold built from the engine's own f64 B
    ingredients — at beta=8, where the f64 stabilized chain itself
    carries ~e-10 error (tests/test_tf_linalg.py module doc)."""
    import mpmath
    from mpmath import mp
    from dqmc_tpu import hsfield
    from dqmc_tpu.ops import tf32

    lat = square_lattice(4, 4)
    nt, n_stab, beta = 40, 5, 8.0
    m64 = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1, beta=beta,
                                  nt=nt, dtype=jnp.float64)
    cfg = EngineConfig(nt=nt, n_stab=n_stab)
    rng = np.random.default_rng(11)
    ns = lat.n_sites
    fields = jnp.asarray(rng.integers(0, 4, (nt, ns)), jnp.int32)

    Gtf, _ = parity_rebuild_greens(m64, cfg, fields, nm=tf32)

    g = float(np.asarray(m64.g, np.float64))
    eta = np.asarray(hsfield.ETA, np.float64)
    expv = np.exp(g * eta)
    expK = np.asarray(m64.expK, np.float64)
    f_np = np.asarray(fields)
    with mp.workdps(60):
        eK = mp.matrix([[mp.mpf(expK[i, j]) for j in range(ns)]
                        for i in range(ns)])
        P = mp.eye(ns)
        for l in range(nt):
            ev = mp.diag([mp.mpf(expv[f_np[l, i]]) for i in range(ns)])
            P = (ev * eK) * P
        Gm = mp.inverse(mp.eye(ns) + P)
        gold = np.array([[float(Gm[i, j]) for j in range(ns)]
                         for i in range(ns)], np.float64)

    err = np.abs(np.asarray(tf32.to_f64(Gtf)) - gold).max()
    assert err < 1e-10, f"tf engine rebuild vs gold: {err:.3e}"

    # the production measurement path (scan-over-stacks, batched) must
    # land at the same tier (runs eagerly here: CPU jit would expose the
    # XLA:CPU multiword hazard and muddy the 1e-10 claim)
    from dqmc_tpu.engine.parity import measurement_greens_fn

    class _S:
        pass

    s = _S()
    s.fields = fields[None]
    G_scan = measurement_greens_fn(m64, cfg, tf32)(s)
    err_scan = np.abs(np.asarray(G_scan)[0, 0] - gold).max()
    assert err_scan < 1e-10, f"scan-path rebuild vs gold: {err_scan:.3e}"


def test_parity_rejects_f32_model():
    lat = square_lattice(4, 4)
    m32 = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=0.0, beta=2.0,
                                  nt=8, dtype=jnp.float32)
    cfg = EngineConfig(nt=8, n_stab=2)
    fields = jnp.zeros((8, 16), jnp.int32)
    with pytest.raises(ValueError):
        parity_rebuild_greens(m32, cfg, fields)
