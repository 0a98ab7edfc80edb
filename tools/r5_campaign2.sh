#!/bin/bash
# Round-5 campaign 2a: PT root-cause + the round-4-lost PT headline row,
# plus the ns=36 lowering repro that gates the capstone's engine choice.
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

step ns36_repro 1800 python tools/r5_ns36_repro.py --L 6 --W 2
step pt_probe 3600 python tools/r5_pt_probe.py
step pt_headline 3600 python bench.py --pt --pt-scale headline
echo "campaign 2a complete"
