#!/bin/bash
# Round-5 campaign 7 (final session): strict verdict value order for the
# remaining wall budget after the VM recycle cut campaign 6 at
# `twokernel` s4 (which thereby LOCALIZED the df+tf worker crash to the
# minimal two-kernel-one-program pairing).
#
#   1. capstone smoke arm A — validates the ns=36 canon_ev Mosaic fix
#      (engine/fused.py) on chip; gates step 2.
#   2. capstone at production counts (verdict item 5).
#   3. tier-grade PT doped row (completes item 2).
#   4. stretch measured row, df32 engine + df32 tier (item 4 — tf32
#      tier at stretch would hit the two-kernel worker crash).
#   5. df measured-gate tail distribution (item 6).
#   6. chain growth curve at n=1024 (item 3 diagnostics).
#
# Waits for the in-flight smoke (arg 1 = its PID) to release the chip.
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

step smoke_a 900 python tools/r5_capstone.py --bins 3 --therms 20 \
    --walkers 16 --skip B,C --out "$OUT/smoke_a"
step capstone 2400 python tools/r5_capstone.py --bins 400 --walkers 16 \
    --out "$OUT/capstone"
step pt_doped_tf32 1800 python bench.py --pt --pt-scale doped \
    --pt-measure tf32 --pt-uneq
step stretch_measured_df32 1800 env DQMC_STACK_INPLACE=1 \
    DQMC_TRIPLET_CHUNK=1 DQMC_BLOCK_GROUP=2 python bench.py \
    --measured --config stretch --dtype df32 --measure-precision df32 \
    --walkers 1 --skip-baseline
step df_tier_tail 1500 python tools/r5_df_tier_tail.py --iters 60
step chain_growth_1024 1800 python tools/r5_chain_growth.py \
    --n 1024 --beta 16 --nt 320 --every 4
echo "campaign 7 complete"
