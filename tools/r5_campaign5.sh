#!/bin/bash
# Round-5 campaign 5: short diagnostic chip runs that unblock code/doc
# work — run between campaign 4's long tail items.
#   twokernel   minimal df+tf kernel-pair crash repro (known issue)
#   df_tier_tail  self-check distribution at the headline (margin policy)
#   pin_n512    chain accuracy at n=512 beta=16, kernel vs XLA QR path
#               (localizes the stretch 2.27e-4 onset: path or scale)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${OUT:-$REPO/artifacts/r5c3}"
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

step twokernel 1500 python tools/r5_twokernel_repro.py
step df_tier_tail 1800 python tools/r5_df_tier_tail.py --iters 60
step chain_growth_1024 2400 python tools/r5_chain_growth.py \
    --n 1024 --beta 16 --nt 320 --every 4
step pin_n512_kernel 1800 python tools/df_parity_probe.py \
    --n 512 --nt 320 --beta 16 --n-stab 5 --granularities 5 --no-cond
step pin_n512_xla 1800 env DQMC_DF_QR=xla python tools/df_parity_probe.py \
    --n 512 --nt 320 --beta 16 --n-stab 5 --granularities 5 --no-cond
echo "campaign 5 complete"
