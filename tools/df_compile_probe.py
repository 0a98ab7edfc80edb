"""Measure the df32 engine's COLD compile time with/without the rolled
df QR loop (DQMC_DF_QR_LOOP), plus chunk throughput and bit-identity.

VERDICT round-2 item 4: the ~11-min df32 cold compile has a candidate
fix (the rolled fori_loop panel body, ops/df_qr_kernel._df_qr_hybrid_loop,
commit 47ec163) that was never measured on device.  This probe runs the
headline-shape df32 sweep chunk twice in subprocesses — each with a
FRESH compile-cache dir so both compiles are genuinely cold — and
compares wall-clock compile time, steady throughput, and the bitwise
equality of the resulting state.

Usage:  python tools/df_compile_probe.py [--walkers 16] [--inner 2]
Prints one JSON line: {"unrolled": {...}, "rolled": {...},
                       "bit_identical": bool}
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
import numpy as np
import jax
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
from dqmc_tpu.engine import EngineConfig, init_state, reset_error_stats
from dqmc_tpu.engine.df_sweep import (df_aux_build, df_sweep_pair,
                                      init_state_df)
from dqmc_tpu.lattice import square_lattice
from dqmc_tpu.models import AttractiveHubbard

W, INNER = %d, %d
L, BETA, NT, NSTAB, U, MU = 16, 8.0, 160, 5, 4.0, 0.0
lat = square_lattice(L, L)
model = AttractiveHubbard.build(lat, U=U, t=1.0, mu=MU, beta=BETA, nt=NT,
                                dtype=jnp.float32)
aux = df_aux_build(lat, U=U, t=1.0, mu=MU, beta=BETA, nt=NT)
cfg = EngineConfig(nt=NT, n_stab=NSTAB, use_pallas=True)
keys = jax.random.split(jax.random.PRNGKey(0), W)
t0 = time.perf_counter()
states = jax.jit(jax.vmap(lambda k: init_state_df(model, aux, cfg, k)))(keys)
jax.block_until_ready(states.G)
t_init = time.perf_counter() - t0

@jax.jit
def chunk(states):
    def body(s, _):
        return jax.vmap(lambda w: df_sweep_pair(model, aux, cfg, w))(s), None
    states, _ = jax.lax.scan(body, states, None, length=INNER)
    return states

t0 = time.perf_counter()
states = chunk(states)
jax.block_until_ready(states.G)
t_compile = time.perf_counter() - t0
t0 = time.perf_counter()
reps = 3
for _ in range(reps):
    states = chunk(states)
jax.block_until_ready(states.G)
dt = time.perf_counter() - t0
print(json.dumps({
    "init_s": round(t_init, 1),
    "chunk_compile_s": round(t_compile, 1),
    "sweeps_per_s": round(W * INNER * reps / dt, 3),
    "G_digest": [float(np.float32(x)) for x in
                 np.asarray(states.G).reshape(-1)[:8]],
    "G_sum": float(np.float64(np.abs(np.asarray(states.G)).sum())),
    "fields_digest": int(np.asarray(states.fields).astype(np.int64).sum()),
}))
"""


def run_child(loop: bool, walkers: int, inner: int):
    env = dict(os.environ)
    env["DQMC_DF_QR_LOOP"] = "1" if loop else "0"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # fresh compile cache -> genuinely cold compile
    cache = tempfile.mkdtemp(prefix="dfprobe_cache_")
    env["JAX_COMPILATION_CACHE_DIR"] = cache
    out = subprocess.run([sys.executable, "-c", _CHILD % (walkers, inner)],
                         env=env, capture_output=True, text=True,
                         timeout=3400, cwd=REPO)
    if out.returncode != 0:
        return {"error": out.stderr[-1500:]}
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--walkers", type=int, default=16)
    p.add_argument("--inner", type=int, default=2)
    args = p.parse_args()
    res_u = run_child(False, args.walkers, args.inner)
    res_r = run_child(True, args.walkers, args.inner)
    bit = ("error" not in res_u and "error" not in res_r
           and res_u["fields_digest"] == res_r["fields_digest"]
           and res_u["G_digest"] == res_r["G_digest"])
    print(json.dumps({"unrolled": res_u, "rolled": res_r,
                      "bit_identical": bit}))


if __name__ == "__main__":
    main()
