#!/bin/bash
# Round-5 campaign 6: the re-prioritized tail after pt_probe.  Campaign
# 4's remaining queue no longer fits the wall budget; strict verdict
# value order — the PT headline row (item 2), the bias power check
# (completes item 1), the two short diagnostics that unblock committed
# analysis (crash repro, gate-margin tail), the capstone at production
# walkers (item 5, per-arm crash isolation — the ns=36 Mosaic reshape
# seen in the W=2 smoke may not occur at W=16's aligned sublanes), then
# tier-grade PT and the chain-growth curve if the round still has room.
# Waits for the in-flight pt_probe step (arg 1 = its PID) to release
# the chip.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${OUT:-$REPO/artifacts/r5c2}"
mkdir -p "$OUT"
cd "$REPO"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID (pt_probe) to finish..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
fi
step() {
  local name="$1" t="$2"; shift 2
  echo "=== $name (timeout ${t}s) $(date -u +%H:%M:%S) ==="
  if timeout "$t" "$@" > "$OUT/$name.log" 2>&1; then
    echo "    OK  ($(tail -c 200 "$OUT/$name.log" | tr '\n' ' ' | tail -c 120))"
  else
    echo "    FAIL rc=$? — see $OUT/$name.log"
  fi
}

step pt_headline 2400 python bench.py --pt --pt-scale headline
step bias_power 3000 python tools/r5_bias_ab.py \
    --config headline --bins 40 --sweeps 50 --skip-ab \
    --out "$REPO/artifacts/r5c1/bias_ab"
step twokernel 900 python tools/r5_twokernel_repro.py
step df_tier_tail 1500 python tools/r5_df_tier_tail.py --iters 60
step capstone 5400 python tools/r5_capstone.py --bins 120 --walkers 16
step pt_doped_tf32 3600 python bench.py --pt --pt-scale doped \
    --pt-measure tf32 --pt-uneq
step chain_growth_1024 2400 python tools/r5_chain_growth.py \
    --n 1024 --beta 16 --nt 320 --every 4
step pin_n512_kernel 1500 python tools/df_parity_probe.py \
    --n 512 --nt 320 --beta 16 --n-stab 5 --granularities 5 --no-cond
step pin_n512_xla 1500 env DQMC_DF_QR=xla python tools/df_parity_probe.py \
    --n 512 --nt 320 --beta 16 --n-stab 5 --granularities 5 --no-cond
echo "campaign 6 complete"
