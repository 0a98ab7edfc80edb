#!/bin/bash
# Round-5 campaign 7c: the resized chip queue after the ns=36 smokes
# measured the REAL capstone wall rates (~1.2 s per measured sweep at
# 6x6 — the tf32-tier measured iteration is fixed-cost-dominated at tiny
# ns, slower than the 16x16 headline; TPU wins at scale, not at 6x6).
# Reference production counts (1000 bins) = ~6 h on this tunnel, so arm
# A runs 30 bins (19.2k walker-measured-sweeps, ~3e-4 density
# resolution); arm B is skipped — its A-vs-B role is already covered at
# the HEADLINE with better statistics (tools/r5_bias_ab.py, BENCHMARKS
# round-14); arm C (f64 oracle, 50 bins) is running on CPU in parallel
# (this tunnel rejects f64).  Then the two remaining unlanded verdict
# rows in value order: the stretch measured row (item 4) and the
# tier-grade PT row (item 2 residual), then diagnostics.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${OUT:-$REPO/artifacts/r5c3}"
mkdir -p "$OUT"
cd "$REPO"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
CPID="${1:-}"   # pid of the in-flight CPU arm C (merge waits on it)
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

step capstone_a 2100 python tools/r5_capstone.py --bins 30 --walkers 16 \
    --skip B,C --out "$OUT/capstone"
step stretch_measured_df32 1800 env DQMC_STACK_INPLACE=1 \
    DQMC_TRIPLET_CHUNK=1 DQMC_BLOCK_GROUP=2 python bench.py \
    --measured --config stretch --dtype df32 --measure-precision df32 \
    --walkers 1 --skip-baseline
step pt_doped_tf32 1800 python bench.py --pt --pt-scale doped \
    --pt-measure tf32 --pt-uneq
if [ -n "$CPID" ]; then
  echo "waiting for CPU arm C (pid $CPID)..."
  while kill -0 "$CPID" 2>/dev/null; do sleep 10; done
fi
step capstone_merge 600 env JAX_PLATFORMS=cpu python tools/r5_capstone.py \
    --bins 30 --walkers 16 --skip A,B,C --out "$OUT/capstone"
step df_tier_tail 1200 python tools/r5_df_tier_tail.py --iters 60
step chain_growth_1024 1500 python tools/r5_chain_growth.py \
    --n 1024 --beta 16 --nt 320 --every 4
echo "campaign 7c complete"
