"""Where does the measured-iteration wall time go? (headline shapes)"""
import time, tempfile, sys
import jax
jax.config.update("jax_default_matmul_precision", "highest")
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dqmc_tpu import compile_cache
compile_cache.enable()
import jax.numpy as jnp
from dqmc_tpu.engine import EngineConfig, init_state, reset_error_stats
from dqmc_tpu.engine.fused import sweep_pair_fused
from dqmc_tpu.engine.uneqtime import sweep_unequal_time
from dqmc_tpu.lattice import square_lattice
from dqmc_tpu.measure.manager import MeasurementManager
from dqmc_tpu.models import AttractiveHubbard

L, BETA, NT, NSTAB, U, MU, W = 16, 8.0, 160, 5, 4.0, 0.0, 16
lat = square_lattice(L, L)
model = AttractiveHubbard.build(lat, U=U, t=1.0, mu=MU, beta=BETA, nt=NT,
                                dtype=jnp.float32)
cfg = EngineConfig(nt=NT, n_stab=NSTAB, use_pallas=True)
manager = MeasurementManager(lat, n_walkers=W, measure_unequal=True,
                             dtype=jnp.float32,
                             out_dir=tempfile.mkdtemp(prefix="dqmc_pm_"))
manager.add_defaults()
uneq_fn = manager.uneq_measure_fn

keys = jax.random.split(jax.random.PRNGKey(0), W)
states = jax.jit(jax.vmap(lambda k: init_state(model, cfg, k)))(keys)
jax.block_until_ready(states.G)
sweep = jax.jit(lambda s: sweep_pair_fused(model, cfg, s))
uneq_step = jax.jit(jax.vmap(
    lambda s: sweep_unequal_time(model, cfg, s, measure_fn=uneq_fn)))

# warm everything
states = sweep(states)
ys, err_u = uneq_step(states)
manager.measure_unequal_result(ys)
manager.measure_equal(states.G)
jax.block_until_ready(err_u)

def timeit(name, fn, n=4):
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s} {dt*1e3:8.1f} ms", flush=True)
    return dt

# component timings (blocking each)
st = [states]
def do_sweep():
    st[0] = sweep(st[0]); return st[0].G
timeit("sweep pair (blocked)", do_sweep)
res = [None]
def do_uneq():
    ys, e = uneq_step(st[0]); res[0] = ys; return e
timeit("uneq+measure_fn (blocked)", do_uneq)
def do_mu():
    manager.measure_unequal_result(res[0])
    return list(manager._acc_uneq.values())[0]
timeit("measure_unequal_result (blocked)", do_mu)
def do_me():
    manager.measure_equal(st[0].G)
    return list(manager._acc_scalar.values())[0]
timeit("measure_equal (blocked)", do_me)

# full pipelined iteration (bench.py one_iter)
def one_iter():
    st[0] = sweep(st[0])
    ys, e = uneq_step(st[0])
    manager.measure_unequal_result(ys)
    manager.measure_equal(st[0].G)
    return e
timeit("one_iter (pipelined, end-block)", one_iter, n=6)
