#!/bin/bash
# Post-outage / post-change TPU validation sequence.  Runs every check that
# needs the real chip, in dependency order, logging to $OUT (default
# /tmp/tpu_checklist).  Each step is individually time-bounded; the script
# continues past failures so one broken step doesn't hide the rest.
#
# Usage: bash tools/tpu_checklist.sh [quick|full]
#   quick: smoke + 2f-kernel Mosaic lowering + measured-path profile
#   full : quick + all bench presets + df32 parity number
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${OUT:-/tmp/tpu_checklist}"
MODE="${1:-quick}"
mkdir -p "$OUT"
cd "$REPO"

step() {  # step <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "=== $name (timeout ${t}s) ==="
  if timeout "$t" "$@" > "$OUT/$name.log" 2>&1; then
    echo "    OK  ($(tail -c 200 "$OUT/$name.log" | tr '\n' ' ' | tail -c 120))"
  else
    echo "    FAIL rc=$? — see $OUT/$name.log"
  fi
}

# 0. chip reachable at all
step smoke 300 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
x = jnp.ones((256, 256)); print(float((x @ x).sum()))"

# 1. Mosaic lowering of the NEW 2-flavor site kernel (only interpret-mode
#    tested so far) — tiny repulsive sweep on the chip
step repulsive_2f_kernel 1200 python -c "
import jax, jax.numpy as jnp
from dqmc_tpu import compile_cache; compile_cache.enable()
from dqmc_tpu.engine import EngineConfig, init_state, sweep_pair
from dqmc_tpu.lattice import square_lattice
from dqmc_tpu.models import RepulsiveHubbard
lat = square_lattice(4, 4)
m = RepulsiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.3, beta=2.0, nt=8,
                           dtype=jnp.float32)
cfg = EngineConfig(nt=8, n_stab=2, use_pallas=True)
states = jax.jit(jax.vmap(lambda k: init_state(m, cfg, k)))(
    jax.random.split(jax.random.PRNGKey(0), 4))
step = jax.jit(jax.vmap(lambda s: sweep_pair(m, cfg, s)))
states = step(states); jax.block_until_ready(states.G)
import numpy as np
assert np.isfinite(np.asarray(states.G)).all()
print('2f kernel lowered + ran; acc =', float(states.acc_sum.mean()) / 2)"

# 1b. chain equivalence on hardware: 1f/2f kernel-vs-scan decisions plus
#     the delayed-vs-submatrix field-trajectory bit-assert (round-3
#     verdict item 7)
step equivalence 3000 python tools/tpu_2f_equivalence.py

# 1c. f64-tier measurement transform path (accelerator-only branch)
step measure_transform 900 python tools/tpu_measure_transform_check.py

# 2. measured-path device-time split (block-scan + pair-matmul reduction)
step uneq_profile 2400 python -u tools/profile_phases.py --uneq

# 3. measured-iteration throughput
step bench_measured 2400 python bench.py --measured --skip-baseline

# 4. headline (includes df32 parity companion subprocess)
step bench_headline 3600 python bench.py

if [ "$MODE" = full ]; then
  step bench_small 1800 python bench.py --config small --skip-baseline
  step bench_doped 1800 python bench.py --config doped --skip-baseline
  step bench_measured_tf32 3000 python bench.py --measured \
      --measure-precision tf32 --skip-baseline
  step bench_repulsive 1800 python bench.py --config repulsive \
      --skip-baseline
  step bench_pt 2400 python bench.py --pt
  step bench_stretch_df32 3500 python bench.py --config stretch \
      --dtype df32 --skip-parity --inner 1 --skip-baseline
  step bench_stretch_df32_sub 3500 python bench.py --config stretch \
      --dtype df32 --skip-parity --inner 1 --site-update submatrix \
      --skip-baseline
  step df_compile_probe 3500 python tools/df_compile_probe.py
  step profile_pair 1200 python -u tools/profile_phases.py
fi
echo "logs in $OUT"
