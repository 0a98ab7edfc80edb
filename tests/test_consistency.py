"""jit-vs-eager consistency — the functional-purity analogue of the
race-detector/sanitizer row in SURVEY.md section 5: the reference is
single-threaded-per-rank and needs none; here the equivalent hazard is a
compiled program diverging from the traced semantics, so we pin one full
Monte-Carlo sweep-pair compiled against the same sweep-pair evaluated
op-by-op (jax.disable_jit)."""

import jax
import jax.numpy as jnp
import numpy as np

from dqmc_tpu.engine import EngineConfig, init_state, sweep_pair
from dqmc_tpu.lattice import square_lattice
from dqmc_tpu.models import AttractiveHubbard


def test_sweep_pair_jit_matches_eager():
    lat = square_lattice(4, 4)
    model = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1, beta=4.0,
                                    nt=16, dtype=jnp.float64)
    cfg = EngineConfig(nt=16, n_stab=4)
    state0 = init_state(model, cfg, jax.random.PRNGKey(21))

    jitted = jax.jit(lambda s: sweep_pair(model, cfg, s))(state0)
    with jax.disable_jit():
        eager = sweep_pair(model, cfg, state0)

    np.testing.assert_array_equal(np.asarray(jitted.fields),
                                  np.asarray(eager.fields))
    np.testing.assert_allclose(np.asarray(jitted.G), np.asarray(eager.G),
                               atol=1e-11)
    np.testing.assert_allclose(float(jitted.acc_sum), float(eager.acc_sum))
    np.testing.assert_allclose(np.asarray(jitted.log_det_M),
                               np.asarray(eager.log_det_M), rtol=1e-12)


def test_measurements_jit_matches_eager():
    from dqmc_tpu.measure import make_context, observables as obs

    lat = square_lattice(4, 4)
    ctx = make_context(lat, jnp.float64)
    rng = np.random.default_rng(5)
    G = jnp.asarray(rng.standard_normal((1, 16, 16)) * 0.2 + 0.5 * np.eye(16))
    fns = {**obs.SCALAR_OBSERVABLES, **obs.EQUAL_TIME_OBSERVABLES}
    for name, fn in fns.items():
        jv = jax.jit(lambda g: fn(g, ctx))(G)
        with jax.disable_jit():
            ev = fn(G, ctx)
        np.testing.assert_allclose(np.asarray(jv), np.asarray(ev),
                                   atol=1e-13, err_msg=name)
