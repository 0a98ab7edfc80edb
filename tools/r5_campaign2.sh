#!/bin/bash
# Round-5 consolidated campaign 2 (relaunch 2): bias arm b moved back to
# the front with its df32-measured fix (the df32-engine + tf32-tier
# pairing crashes the TPU worker — twice reproduced), and a chip-side
# capstone smoke gates the big capstone (the ns=36 Mosaic reshape did
# NOT reproduce on bare engines — suspicion is the full measured
# program shape).
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

step bias_ab_headline_retry2 6000 python tools/r5_bias_ab.py \
    --config headline --bins 40 --sweeps 50 --arms b \
    --out "$REPO/artifacts/r5c1/bias_ab"
step capstone_smoke_chip 2400 python tools/r5_capstone.py \
    --bins 3 --walkers 2 --therms 10 --out "$OUT/capstone_smoke"
step pt_probe 3600 python tools/r5_pt_probe.py --segs 8 --seg-pairs 12
step pt_headline 3600 python bench.py --pt --pt-scale headline
step qr_fold_1024_b16 2400 python tools/r5_qr_fold_probe.py \
    --n 1024 --beta 16 --nt 320 --fold 32
step pin_n256_b16_xla 1800 env DQMC_DF_QR=xla python tools/df_parity_probe.py \
    --n 256 --nt 320 --beta 16 --n-stab 5 --granularities 5 --no-cond
step qr_fold_512_b16 1800 python tools/r5_qr_fold_probe.py \
    --n 512 --beta 16 --nt 320 --fold 32
step capstone 10800 python tools/r5_capstone.py --bins 1000 --walkers 16
step stretch_measured_tf32 7200 env DQMC_STACK_INPLACE=1 \
    DQMC_TRIPLET_CHUNK=1 DQMC_BLOCK_GROUP=2 python bench.py \
    --measured --config stretch --dtype df32 --measure-precision tf32 \
    --walkers 1 --skip-baseline
step pt_doped_tf32 5400 python bench.py --pt --pt-scale doped \
    --pt-measure tf32 --pt-uneq
echo "campaign 2 complete"
