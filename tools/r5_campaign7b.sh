#!/bin/bash
# Round-5 campaign 7b: replaces campaign 7's tail after the ns=36 smoke
# exposed that THIS tunnel rejects float64 outright ("NotImplementedError:
# float64" from the axon AOT path) — the capstone's f64 oracle arm C
# therefore runs on CPU (native f64, reduced walkers), and the A/B arms
# stay on chip.  The tool's --skip re-analysis merges the three arms into
# one verdict.json.  Queue order unchanged otherwise (verdict value
# order).  Waits for the in-flight smoke_a step (arg 1) first.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${OUT:-$REPO/artifacts/r5c3}"
mkdir -p "$OUT"
cd "$REPO"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID to finish..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 10; done
fi
step() {
  local name="$1" t="$2"; shift 2
  echo "=== $name (timeout ${t}s) $(date -u +%H:%M:%S) ==="
  local t0=$SECONDS
  if timeout "$t" "$@" > "$OUT/$name.log" 2>&1; then
    echo "    OK in $((SECONDS-t0))s ($(tail -c 200 "$OUT/$name.log" | tr '\n' ' ' | tail -c 120))"
  else
    echo "    FAIL rc=$? in $((SECONDS-t0))s — see $OUT/$name.log"
  fi
}

# arm C (f64 oracle) on CPU in PARALLEL with the chip queue; merged last
step_bg() {
  local name="$1" t="$2"; shift 2
  echo "=== $name (background, timeout ${t}s) $(date -u +%H:%M:%S) ==="
  ( timeout "$t" "$@" > "$OUT/$name.log" 2>&1 ) &
  BG_PID=$!
}
step_bg capstone_c_cpu 3600 env JAX_PLATFORMS=cpu python tools/r5_capstone.py \
    --bins 400 --walkers 4 --skip A,B --out "$OUT/capstone"

step capstone_ab 2400 python tools/r5_capstone.py --bins 400 --walkers 16 \
    --skip C --out "$OUT/capstone"
step pt_doped_tf32 1800 python bench.py --pt --pt-scale doped \
    --pt-measure tf32 --pt-uneq
step stretch_measured_df32 1800 env DQMC_STACK_INPLACE=1 \
    DQMC_TRIPLET_CHUNK=1 DQMC_BLOCK_GROUP=2 python bench.py \
    --measured --config stretch --dtype df32 --measure-precision df32 \
    --walkers 1 --skip-baseline

echo "waiting for capstone_c_cpu (pid $BG_PID)..."
while kill -0 "$BG_PID" 2>/dev/null; do sleep 10; done
step capstone_merge 600 env JAX_PLATFORMS=cpu python tools/r5_capstone.py \
    --bins 400 --walkers 16 --skip A,B,C --out "$OUT/capstone"

step df_tier_tail 1500 python tools/r5_df_tier_tail.py --iters 60
step chain_growth_1024 1800 python tools/r5_chain_growth.py \
    --n 1024 --beta 16 --nt 320 --every 4
echo "campaign 7b complete"
