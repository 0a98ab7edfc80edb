#!/bin/bash
# Round-5 campaign 1: the round-4 verdict's expensive items FIRST
# (verdict weak #4: stop leaving long-runtime items to a cut-off tail).
#   0. stretch accuracy pin (ALREADY LANDED before this script:
#      artifacts/r5c1/stretch_accuracy_pin.log — 2.27e-4, NOT ~1e-8)
#   1-2. scale-isolation probes for that finding: is the df32 chain
#      error driven by ns (matrix size) or beta (ladder depth)?
#   3. f32 sampling bias A/B at the headline (verdict item 1)
#   4. tf32 tier at the stretch scale (is the north-star tier degraded
#      too?)
#   5. fold-granularity arm at ns=1024 (conditioning-driven?)
#   6. bias A/B at the doped workload (acceptance more marginal)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${OUT:-$REPO/artifacts/r5c1}"
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

step pin_n256_b16 2400 python tools/df_parity_probe.py \
    --n 256 --nt 320 --beta 16 --n-stab 5 --granularities 5
step pin_n1024_b8 2400 python tools/df_parity_probe.py \
    --n 1024 --nt 160 --beta 8 --n-stab 5 --granularities 5
step bias_ab_headline 7200 python tools/r5_bias_ab.py \
    --config headline --bins 40 --sweeps 50
step pin_n1024_b16_tf32 3000 python tools/df_parity_probe.py \
    --n 1024 --nt 320 --beta 16 --n-stab 5 --granularities 5 --nm tf32
step pin_n1024_b16_gran1 3600 python tools/df_parity_probe.py \
    --n 1024 --nt 320 --beta 16 --n-stab 5 --granularities 1 --no-cond
step bias_ab_doped 7200 python tools/r5_bias_ab.py \
    --config doped --bins 40 --sweeps 50
echo "campaign 1 complete"
# appended while running (bash incremental read): discriminate
# Pallas-kernel vs XLA df-QR path at the SAME workload — n=256 beta=16
# read 1.1e-8 via the kernel; if the XLA arm degrades, the ns=1024
# fallback path (n>512 -> ops/df_qr.df_qr) is the stretch-accuracy
# culprit, not a genuine size effect.
step pin_n256_b16_xla 2400 env DQMC_DF_QR=xla python tools/df_parity_probe.py \
    --n 256 --nt 320 --beta 16 --n-stab 5 --granularities 5
step pin_n512_b16 2400 python tools/df_parity_probe.py \
    --n 512 --nt 320 --beta 16 --n-stab 5 --granularities 5
echo "campaign 1 appendix complete"
# appendix 2: single-fold QR localization of the stretch degradation —
# orth/backward/d-ladder-resolution per path (xla vs kernel) at a REAL
# deep-chain fold input, scored against host-f64 QR of the same matrix.
step qr_fold_1024_b16 3000 python tools/r5_qr_fold_probe.py \
    --n 1024 --beta 16 --nt 320 --fold 32
step qr_fold_512_b16 2400 python tools/r5_qr_fold_probe.py \
    --n 512 --beta 16 --nt 320 --fold 32
step qr_fold_256_b16 1800 python tools/r5_qr_fold_probe.py \
    --n 256 --beta 16 --nt 320 --fold 32
echo "campaign 1 appendix 2 complete"
# appendix 3: arm b of the headline bias A/B died to a TPU worker
# crash/restart mid-run (arm a landed, 2068 s); rerun b + power and
# redo the comparison against the on-disk arm a.
step bias_ab_headline_retry 7200 python tools/r5_bias_ab.py \
    --config headline --bins 40 --sweeps 50 --arms b
