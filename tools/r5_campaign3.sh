#!/bin/bash
# Round-5 campaign 3: capstone + tier-grade PT + stretch measured row +
# tf32 margin lever.  Launched after campaign 2a's ns=36 verdict.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${OUT:-$REPO/artifacts/r5c2}"
mkdir -p "$OUT"
cd "$REPO"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
step() {
  local name="$1" t="$2"; shift 2
  echo "=== $name (timeout ${t}s) $(date -u +%H:%M:%S) ==="
  if timeout "$t" "$@" > "$OUT/$name.log" 2>&1; then
    echo "    OK  ($(tail -c 200 "$OUT/$name.log" | tr '\n' ' ' | tail -c 120))"
  else
    echo "    FAIL rc=$? — see $OUT/$name.log"
  fi
}

# the reference's actual scientific job at production counts (item 5)
step capstone 10800 python tools/r5_capstone.py --bins 1000 --walkers 16
# tier-grade PT row: doped scale, tau-resolved tf32 measurement, ok
# gated on the tier self-check (item 2)
step pt_doped_tf32 5400 python bench.py --pt --pt-scale doped \
    --pt-measure tf32 --pt-uneq
# stretch measured row: tau-resolved observables at 32x32 via the tier
# (item 4) — chunk knobs shrink the batched tier's working set
step stretch_measured_tf32 7200 env DQMC_STACK_INPLACE=1 \
    DQMC_TRIPLET_CHUNK=1 DQMC_BLOCK_GROUP=2 python bench.py \
    --measured --config stretch --dtype df32 --measure-precision tf32 \
    --walkers 1 --skip-baseline
# tf32 margin lever (item 8): prune refinement steps
step measured_tf32_nir5 5400 env DQMC_TF_NIR=5 python bench.py \
    --measured --dtype float32 --measure-precision tf32 --skip-baseline
echo "campaign 3 complete"
