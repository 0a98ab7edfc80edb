#!/bin/bash
# Round-5 campaign 4 (session restart): the VM was recycled, so the
# uncommitted bias arm-a data died with it — both arms rerun.  Queue is
# strict verdict-priority order (item 1 bias A/B with power check, item
# 2 PT rows + envelope probe, item 5 capstone, item 4 stretch measured
# row), each step bounded so a slow step cannot starve the rest.
# run_simulation now enables the persistent XLA cache, so later steps
# reuse the tf32-tier/fused-engine compiles paid by the first ones.
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

# --- verdict item 1: bias A/B, split so arm a's data commits even if a
#     later arm hits the df32-worker surface again
step bias_a 4200 python tools/r5_bias_ab.py \
    --config headline --bins 40 --sweeps 50 --arms a --skip-power \
    --out "$REPO/artifacts/r5c1/bias_ab"
step bias_b 7200 python tools/r5_bias_ab.py \
    --config headline --bins 40 --sweeps 50 --arms b --skip-power \
    --out "$REPO/artifacts/r5c1/bias_ab"
# --- gates the production capstone (ns=36 Mosaic reshape suspicion)
step capstone_smoke_chip 2400 python tools/r5_capstone.py \
    --bins 3 --walkers 2 --therms 10 --out "$OUT/capstone_smoke"
# --- verdict item 2: explain the PT envelope, land the headline PT row
step pt_probe 3000 python tools/r5_pt_probe.py --segs 8 --seg-pairs 12
step pt_headline 3000 python bench.py --pt --pt-scale headline
# --- item 1's power check (the pass must mean something)
step bias_power 4200 python tools/r5_bias_ab.py \
    --config headline --bins 40 --sweeps 50 --skip-ab \
    --out "$REPO/artifacts/r5c1/bias_ab"
# --- item 2 completion: tier-grade measured PT row
step pt_doped_tf32 4200 python bench.py --pt --pt-scale doped \
    --pt-measure tf32 --pt-uneq
# --- item 5: the reference's scientific job end-to-end (bins sized to
#     the remaining wall budget; full 1000-bin run queued last in case
#     the round has the room)
step capstone 7200 python tools/r5_capstone.py --bins 250 --walkers 16
# --- item 4: tau-resolved stretch row via the chunked tier
step stretch_measured_tf32 7200 env DQMC_STACK_INPLACE=1 \
    DQMC_TRIPLET_CHUNK=1 DQMC_BLOCK_GROUP=2 python bench.py \
    --measured --config stretch --dtype df32 --measure-precision tf32 \
    --walkers 1 --skip-baseline
echo "campaign 4 complete"
