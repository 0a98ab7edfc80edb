#!/bin/bash
# Round-3 campaign 3: remaining rows after campaign 2's stretch OOMs.
# W=2 stretch RESOURCE_EXHAUSTED during the sweep chunk (the df stack is
# ~1.04 GB/walker at ns=1024 and the block scan holds ~3 stack-sized
# buffers: carried + emitted slots + reassembled); W=1 peaks ~4 GB.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${OUT:-$REPO/artifacts/r3c3}"
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

step bench_measured_tf32_mixed 4500 python bench.py --measured \
    --measure-precision tf32 --skip-baseline
step bench_measured_df32 4500 python bench.py --measured \
    --measure-precision df32 --skip-baseline
step bench_stretch_df32_w1 7000 python bench.py --config stretch \
    --dtype df32 --walkers 1 --skip-parity --inner 1 --skip-baseline
step bench_stretch_df32_w1_sub 7000 python bench.py --config stretch \
    --dtype df32 --walkers 1 --skip-parity --inner 1 \
    --site-update submatrix --skip-baseline
step df_compile_probe 7000 python tools/df_compile_probe.py
echo "logs in $OUT"
