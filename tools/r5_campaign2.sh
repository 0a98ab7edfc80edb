#!/bin/bash
# Round-5 consolidated campaign 2: campaign 1 was cut over to this
# strict value-per-second queue (~4h of round left).  Order = verdict
# priority: bias A/B completion (item 1), PT (item 2), then the QR
# root-cause diagnostics, then the capstone (item 5) and stretch
# measured row (item 4).
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

# item 1: arm b + power vs the on-disk arm a (worker-crash resume)
step bias_ab_headline_retry 6000 python tools/r5_bias_ab.py \
    --config headline --bins 40 --sweeps 50 --arms b \
    --out "$REPO/artifacts/r5c1/bias_ab"
# capstone gate: does the Pallas engine lower at ns=36?
step ns36_repro 1500 python tools/r5_ns36_repro.py --L 6 --W 2
# item 2: envelope root-cause, then the round-4-lost headline row
step pt_probe 3600 python tools/r5_pt_probe.py --segs 8 --seg-pairs 12
step pt_headline 3600 python bench.py --pt --pt-scale headline
# QR root-cause diagnostics (fast; inform items 3/6)
step qr_fold_1024_b16 2400 python tools/r5_qr_fold_probe.py \
    --n 1024 --beta 16 --nt 320 --fold 32
step pin_n256_b16_xla 1800 env DQMC_DF_QR=xla python tools/df_parity_probe.py \
    --n 256 --nt 320 --beta 16 --n-stab 5 --granularities 5 --no-cond
step qr_fold_512_b16 1800 python tools/r5_qr_fold_probe.py \
    --n 512 --beta 16 --nt 320 --fold 32
# item 5: the reference's canonical workload at production counts
step capstone 10800 python tools/r5_capstone.py --bins 1000 --walkers 16
# item 4: stretch measured row (tau-resolved at 32x32, tf32 tier)
step stretch_measured_tf32 7200 env DQMC_STACK_INPLACE=1 \
    DQMC_TRIPLET_CHUNK=1 DQMC_BLOCK_GROUP=2 python bench.py \
    --measured --config stretch --dtype df32 --measure-precision tf32 \
    --walkers 1 --skip-baseline
# item 2 (cont): tier-grade PT row
step pt_doped_tf32 5400 python bench.py --pt --pt-scale doped \
    --pt-measure tf32 --pt-uneq
echo "campaign 2 complete"
