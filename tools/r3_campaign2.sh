#!/bin/bash
# Round-3 campaign 2: the rows that depend on the exponent-channel df
# refactor (log-domain-equivalent d storage), measured at the NEW head.
#   - stretch (32x32 beta=16) df32, delayed + submatrix site updates:
#     the VERDICT r2 item-2 deliverable, physics-valid only with the
#     exponent channel (linear-f32 d overflows at e^{+-148})
#   - headline df32 companion (the parity engine number at new HEAD)
#   - measured tf32 (north-star tier incl. the uneq triplet)
#   - df cold-compile probe (DQMC_DF_QR_LOOP on/off, VERDICT item 4)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${OUT:-$REPO/artifacts/r3c2}"
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

step bench_df32_headline 4500 python bench.py --dtype df32 \
    --skip-parity --inner 2 --skip-baseline
# rows the campaign-1 checklist lost to the 300 s probe-vs-warmup race
step bench_doped 2400 python bench.py --config doped --skip-baseline
step bench_repulsive 2400 python bench.py --config repulsive \
    --skip-baseline
# W=2: the old-HEAD stretch attempt compiled but RESOURCE_EXHAUSTED at
# W=4 (the df stack alone is ~1.1 GB/walker at ns=1024, nt/n_stab=64)
step bench_stretch_df32 7000 python bench.py --config stretch \
    --dtype df32 --walkers 2 --skip-parity --inner 1 --skip-baseline
step bench_stretch_df32_sub 7000 python bench.py --config stretch \
    --dtype df32 --walkers 2 --skip-parity --inner 1 \
    --site-update submatrix --skip-baseline
step bench_measured_tf32 4500 python bench.py --measured \
    --measure-precision tf32 --skip-baseline
step bench_measured_df32 4500 python bench.py --measured \
    --measure-precision df32 --skip-baseline
step df_compile_probe 7000 python tools/df_compile_probe.py
echo "logs in $OUT"
