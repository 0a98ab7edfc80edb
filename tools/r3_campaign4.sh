#!/bin/bash
# Round-3 campaign 4: rows for the stride-calibration + rolled-QR-default
# commits, plus the REAL (routed) stretch submatrix A/B.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${OUT:-$REPO/artifacts/r3c4}"
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

step bench_measured_tf32_2x 4500 python bench.py --measured \
    --measure-precision tf32 --skip-baseline
step bench_measured_df32_02 4500 python bench.py --measured \
    --measure-precision df32 --skip-baseline
step bench_stretch_delayed 7000 python bench.py --config stretch \
    --dtype df32 --walkers 1 --skip-parity --inner 1 --skip-baseline
step bench_stretch_submatrix 7000 python bench.py --config stretch \
    --dtype df32 --walkers 1 --skip-parity --inner 1 \
    --site-update submatrix --skip-baseline
step bench_default 7000 python bench.py
echo "logs in $OUT"
