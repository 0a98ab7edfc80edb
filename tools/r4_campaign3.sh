#!/bin/bash
# Round-4 campaign 3 (this session): the remaining verdict items, in
# strict value-per-second order so a wall-clock cutoff loses the least:
#   1. submatrix ns=1024 lowering probe (+ one real execution)
#   2. kernel equivalence incl. the delayed-vs-submatrix trajectory
#      bit-assert on hardware (verdict item 7)
#   3. stretch W=2 / W=4 with the in-place df stack (verdict item 4)
#   4. submatrix-vs-delayed at the stretch scale (verdict item 4)
#   5. PT steady-state rows at headline + doped scale (verdict item 6)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${OUT:-$REPO/artifacts/r4c3}"
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

step sub_lower_1024 1500 python tools/r4_submatrix_lower.py \
    --ns 1024 --W 1 --run
step equivalence 2400 python tools/tpu_2f_equivalence.py
step stretch_w2_inplace 3300 env DQMC_STACK_INPLACE=1 python bench.py \
    --config stretch --dtype df32 --walkers 2 --skip-parity --inner 1 \
    --skip-baseline
step stretch_w4_inplace 3300 env DQMC_STACK_INPLACE=1 python bench.py \
    --config stretch --dtype df32 --walkers 4 --skip-parity --inner 1 \
    --skip-baseline
step stretch_submatrix_w1 3300 env DQMC_STACK_INPLACE=1 python bench.py \
    --config stretch --dtype df32 --walkers 1 --skip-parity --inner 1 \
    --site-update submatrix --skip-baseline
step pt_headline 3600 python bench.py --pt --pt-scale headline
step pt_doped 3000 python bench.py --pt --pt-scale doped
step stretch_delayed_w1 3000 env DQMC_STACK_INPLACE=1 python bench.py \
    --config stretch --dtype df32 --walkers 1 --skip-parity --inner 1 \
    --skip-baseline
echo "logs in $OUT"
# appended while campaign running (bash reads top-level commands
# incrementally): the stretch-scale accuracy pin — df32 chain vs f64
# oracle at ns=1024 beta=16 (verdict missing-#2's second half)
step stretch_accuracy_pin 3000 python tools/df_parity_probe.py \
    --n 1024 --nt 320 --beta 16 --n-stab 5
echo "campaign 3 complete (incl. appended steps)"
