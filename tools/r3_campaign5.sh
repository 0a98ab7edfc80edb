#!/bin/bash
# Round-3 campaign 5: isolate the campaign-4 tier regressions at the
# reverted HEAD, and the real (lowerable) stretch submatrix A/B.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${OUT:-$REPO/artifacts/r3c5}"
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
# reverted defaults: engine-stride tf32, 0.2/dtau df32 cap, rolled OFF
step measured_tf32_reverted 4500 python bench.py --measured \
    --measure-precision tf32 --skip-baseline
step measured_df32_reverted 4500 python bench.py --measured \
    --measure-precision df32 --skip-baseline
# guilt probe: identical run but rolled QR ON — if the tier self-check
# explodes again, the rolled kernel under the tier's lowering is guilty
step measured_df32_rolled 4500 env DQMC_DF_QR_LOOP=1 python bench.py \
    --measured --measure-precision df32 --skip-baseline
step stretch_submatrix_w1 7000 python bench.py --config stretch \
    --dtype df32 --walkers 1 --skip-parity --inner 1 \
    --site-update submatrix --skip-baseline
echo "logs in $OUT"
