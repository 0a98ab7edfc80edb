#!/bin/bash
# Round-4 campaign 2: fused-greens measured tiers, stretch memory paths,
# PT steady-state rows, kernel equivalence incl. trajectory assert.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${OUT:-$REPO/artifacts/r4c2}"
mkdir -p "$OUT"
cd "$REPO"
step() {
  local name="$1" t="$2"; shift 2
  echo "=== $name (timeout ${t}s) ==="
  if timeout "$t" "$@" > "$OUT/$name.log" 2>&1; then
    echo "    OK  ($(tail -c 200 "$OUT/$name.log" | tr '\n' ' ' | tail -c 120))"
  else
    echo "    FAIL rc=$? — see $OUT/$name.log"
  fi
}

# measured tiers with the uneq tier's G00 reused as the equal-time G
step measured_df32_fusedG 4500 python bench.py --measured \
    --measure-precision df32 --skip-baseline
step measured_tf32_fusedG 5400 python bench.py --measured \
    --measure-precision tf32 --skip-baseline
# stretch memory: in-place stack + donation, W scaling
step stretch_w2_inplace 7000 env DQMC_STACK_INPLACE=1 python bench.py \
    --config stretch --dtype df32 --walkers 2 --skip-parity --inner 1 \
    --skip-baseline
step stretch_w4_inplace 7000 env DQMC_STACK_INPLACE=1 python bench.py \
    --config stretch --dtype df32 --walkers 4 --skip-parity --inner 1 \
    --skip-baseline
# submatrix-vs-delayed at the scale it was built for (now lowerable)
step stretch_submatrix_w1 7000 env DQMC_STACK_INPLACE=1 python bench.py \
    --config stretch --dtype df32 --walkers 1 --skip-parity --inner 1 \
    --site-update submatrix --skip-baseline
step stretch_delayed_w1 7000 env DQMC_STACK_INPLACE=1 python bench.py \
    --config stretch --dtype df32 --walkers 1 --skip-parity --inner 1 \
    --skip-baseline
# PT steady-state rows
step pt_doped 5000 python bench.py --pt --pt-scale doped
step pt_headline 7000 python bench.py --pt --pt-scale headline
# kernel chain equivalence + delayed-vs-submatrix trajectory bit-assert
step equivalence 3000 python tools/tpu_2f_equivalence.py
echo "logs in $OUT"
