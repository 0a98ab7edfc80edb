"""Quantify the f32 sampling engine's stationary-distribution bias.

VERDICT r4 item 1 — the last unverified physics assumption under the
headline numbers: the f32 fused engine makes Metropolis decisions from a
working G whose steady drift envelope is ~1e-2 mean (the reference makes
every decision from an f64 G warned at 1e-6, update.cpp:22-28,
dqmc.cpp:390).  The measurement tiers fix what the *measurement* sees,
never what the *chain* samples.  This tool measures whether that matters:

  arm a:  dtype = float32 (fused f32 sampling) + measure_precision=tf32
  arm b:  dtype = df32  (hybrid ~1e-8 sampling) + measure_precision=df32
          (tf32 measurement under the df32 engine crashes the TPU
          worker — see the arm-b comment in main; the df32-vs-tf32
          measurement delta is ~1e-8, five orders below the ~1e-3
          statistical resolution, so the SAMPLING comparison is
          unaffected)

Identical workload, independent seeds, tier-grade measurement in both —
the difference between the two binned ensembles is the grade of the
sampled trajectory.  Agreement criterion per scalar observable:

  z = |m_a - m_b| / sqrt(err_a^2 + err_b^2) < Z_SCALAR (2.0)

and for the equal-time correlation matrices (an N-entry array: elementwise
2-sigma would false-fail ~5% of entries by chance):

  frac(|z| > 2) <= 0.10   AND   max |z| < sqrt(2 ln N) + 1.5

POWER CHECK (--power): arm a re-run with n_stab deliberately loosened —
the comparison MUST then fail, otherwise a pass is uninformative (the
test would accept anything).  The loosened chain's f32 working G drifts
for n_stab slices between stabilizations, which biases acceptance; if
the ensemble comparison cannot see that, it cannot see anything.

Run on TPU.  Results land as JSON (one line, parseable) + a table.

Usage:
  python tools/r5_bias_ab.py --config headline --bins 40 --sweeps 50
  python tools/r5_bias_ab.py --config doped --power
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (L, beta, nt, n_stab, U, mu, walkers) — mirrors bench.py CONFIGS
WORKLOADS = {
    "headline": (16, 8.0, 160, 5, 4.0, 0.0, 16),
    "doped": (12, 6.0, 120, 5, 6.0, -0.88, 32),
    "smoke": (4, 2.0, 8, 2, 4.0, -0.1, 4),      # CPU smoke test only
}

Z_SCALAR = 2.0
ARRAY_FRAC = 0.10


def _params_text(cfg, *, dtype, seed, n_stab, bins, sweeps, therms,
                 walkers, measure="tf32", meas_stab=0):
    # meas_stab: explicit measurement-tier stride.  The POWER arm must
    # set this to the production stride: its loosened n_stab is meant to
    # bias the SAMPLING chain only, but the tf32 tier defaults to the
    # engine stride — at n_stab=40 the tier rebuild both crawls (~2x
    # past the arm-a runtime; the first power attempt died on its
    # campaign timeout) and corrupts the measured values themselves,
    # which would let the power check "detect" measurement damage
    # instead of sampling bias.
    L, beta, nt, _, U, mu, _ = cfg
    meas_line = (f"measure_uneq_n_stab = {meas_stab}\n"
                 f"measure_n_stab = {meas_stab}\n" if meas_stab else "")
    return f"""
[Lattice]
L1 = {L}
L2 = {L}
[hubbard]
U = {U}
t = 1.0
mu = {mu}
[simulation]
beta = {beta}
nt = {nt}
n_therms = {therms}
n_sweeps = {sweeps}
n_bins = {bins}
n_stab = {n_stab}
dtype = {dtype}
measure_precision = {measure}
{meas_line}
symmetric = false
isMeasureUnequalTime = false
seed = {seed}
[walkers]
n_walkers = {walkers}
"""


def _run_arm(name, text, out_dir):
    from dqmc_tpu.config import Parameters
    from dqmc_tpu.run import run_simulation
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "parameters.in"), "w") as f:
        f.write(text)
    t0 = time.time()
    summary = run_simulation(Parameters.from_string(text), out_dir=out_dir,
                             verbose=False)
    dt = time.time() - t0
    print(f"[{name}] done in {dt:.0f}s: acc={summary.acc_rate:.4f} "
          f"err_max={summary.max_precision_error:.3e} "
          f"({summary.sweeps_per_sec:.2f} sweeps/s)", flush=True)
    return summary


def _estimates(out_dir):
    """Jackknifed (mean, err) for every scalar + equal-time r-space obs."""
    from dqmc_tpu.analysis.cli import load_bins
    from dqmc_tpu.analysis.jackknife import jackknife, jackknife_array
    scalars, eq_r, _, _, _ = load_bins(out_dir, False)
    out_s = {n: jackknife(np.asarray(b)) for n, b in scalars.items()}
    out_a = {n: jackknife_array(np.asarray(b)) for n, b in eq_r.items()}
    return out_s, out_a


def _compare(est_a, est_b, label):
    """Return (report dict, ok) for the two (scalars, arrays) estimates."""
    (sa, aa), (sb, ab) = est_a, est_b
    rows, ok = [], True
    for name in sorted(set(sa) & set(sb)):
        (ma, ea), (mb, eb) = sa[name], sb[name]
        denom = float(np.hypot(ea, eb))
        z = abs(ma - mb) / denom if denom > 0 else float("inf")
        passed = z < Z_SCALAR
        ok &= passed
        rel = denom / abs(ma) if ma else float("nan")
        rows.append({"obs": name, "kind": "scalar", "a": float(ma),
                     "b": float(mb), "err_a": float(ea), "err_b": float(eb),
                     "z": float(z), "resolution_rel": float(rel),
                     "pass": bool(passed)})
        print(f"  {label} {name:>14s}: a={ma:+.6f}±{ea:.2e} "
              f"b={mb:+.6f}±{eb:.2e}  z={z:5.2f} "
              f"[{'ok' if passed else 'FAIL'}]", flush=True)
    for name in sorted(set(aa) & set(ab)):
        (ma, ea), (mb, eb) = aa[name], ab[name]
        ma, mb = np.real(ma), np.real(mb)
        ea, eb = np.real(ea), np.real(eb)
        denom = np.hypot(ea, eb)
        mask = denom > 0
        z = np.abs(ma - mb)[mask] / denom[mask]
        n = z.size
        zmax_crit = float(np.sqrt(2 * np.log(max(n, 2))) + 1.5)
        frac = float((z > 2).mean()) if n else 0.0
        zmax = float(z.max()) if n else 0.0
        passed = frac <= ARRAY_FRAC and zmax < zmax_crit
        ok &= passed
        rows.append({"obs": name, "kind": "array", "n": int(n),
                     "frac_z_gt2": frac, "z_max": zmax,
                     "z_max_crit": zmax_crit, "pass": bool(passed)})
        print(f"  {label} {name:>14s}: n={n} frac(|z|>2)={frac:.3f} "
              f"max|z|={zmax:.2f} (crit {zmax_crit:.2f}) "
              f"[{'ok' if passed else 'FAIL'}]", flush=True)
    return rows, ok


def _maybe_force_cpu():
    """This image's axon plugin overrides the JAX_PLATFORMS env var
    (see tests/conftest.py) — honor it programmatically so CPU smoke
    runs do not land on the TPU tunnel."""
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")


def main():
    _maybe_force_cpu()
    p = argparse.ArgumentParser()
    p.add_argument("--config", choices=sorted(WORKLOADS),
                   default="headline")
    p.add_argument("--bins", type=int, default=40)
    p.add_argument("--sweeps", type=int, default=50)
    p.add_argument("--therms", type=int, default=300)
    p.add_argument("--walkers", type=int, default=0,
                   help="override the workload's walker count")
    p.add_argument("--power-nstab", type=int, default=40,
                   help="loosened n_stab for the power check")
    p.add_argument("--skip-power", action="store_true")
    p.add_argument("--skip-ab", action="store_true",
                   help="run only the power check (arms must exist)")
    p.add_argument("--arms", default="",
                   help="comma list of arms to (re)run: a,b (default "
                        "both; others are re-analyzed from disk — for "
                        "resuming after a TPU worker crash)")
    p.add_argument("--out", default=os.path.join(REPO, "artifacts",
                                                 "r5c1", "bias_ab"))
    args = p.parse_args()

    cfg = WORKLOADS[args.config]
    walkers = args.walkers or cfg[6]
    n_stab = cfg[3]
    base = dict(bins=args.bins, sweeps=args.sweeps, therms=args.therms,
                walkers=walkers)
    out = os.path.join(args.out, args.config)
    print(f"bias A/B on '{args.config}': L={cfg[0]} beta={cfg[1]} "
          f"nt={cfg[2]} U={cfg[4]} mu={cfg[5]} W={walkers}, "
          f"{args.bins} bins x {args.sweeps} sweeps, tf32-measured",
          flush=True)

    dir_a = os.path.join(out, "a_f32")
    dir_b = os.path.join(out, "b_df32")
    arms = set(a.strip() for a in args.arms.split(",") if a.strip()) \
        or {"a", "b"}
    if not args.skip_ab and "a" in arms:
        _run_arm("a:f32-sampled", _params_text(
            cfg, dtype="float32", seed=101, n_stab=n_stab, **base), dir_a)
    if not args.skip_ab and "b" in arms:
        # measurement tier df32, NOT tf32: the df32-engine + tf32-tier
        # kernel pairing in one program reproducibly crashes the TPU
        # worker ("kernel fault", twice on 2026-08-21) — a new-on-chip
        # combination.  The tier delta (1e-8 vs 1e-13 measurement G) is
        # 5 orders below the ~1e-3 statistical resolution, so the
        # sampling comparison is unaffected.
        _run_arm("b:df32-sampled", _params_text(
            cfg, dtype="df32", seed=202, n_stab=n_stab, measure="df32",
            **base), dir_b)
    missing = [d for d in (dir_a, dir_b)
               if not os.path.isdir(os.path.join(d, "results"))
               and not os.path.isdir(d)]
    if missing or not (os.path.isdir(dir_a) and os.path.isdir(dir_b)):
        # partial campaign step (e.g. arm a ran alone before arm b's
        # slot): the arm data is on disk; the comparison runs when the
        # other arm lands
        print(f"partial run — arm dirs present: "
              f"a={os.path.isdir(dir_a)} b={os.path.isdir(dir_b)}; "
              f"comparison deferred", flush=True)
        return 0
    est_a, est_b = _estimates(dir_a), _estimates(dir_b)
    print("A/B comparison (f32-sampled vs df32-sampled, both "
          "tf32-measured):", flush=True)
    rows, ok = _compare(est_a, est_b, "a-vs-b")

    power_rows, power_failed = None, None
    if not args.skip_power:
        dir_p = os.path.join(out, "power_loose")
        _run_arm(f"power:n_stab={args.power_nstab}", _params_text(
            cfg, dtype="float32", seed=303, n_stab=args.power_nstab,
            meas_stab=n_stab, **base), dir_p)
        est_p = _estimates(dir_p)
        print(f"POWER CHECK (f32 n_stab={args.power_nstab} vs df32 — "
              f"the comparison must FAIL):", flush=True)
        power_rows, power_ok = _compare(est_p, est_b, "power")
        power_failed = not power_ok

    verdict = {
        "tool": "r5_bias_ab", "config": args.config,
        "bins": args.bins, "sweeps": args.sweeps, "walkers": walkers,
        "ab_pass": bool(ok), "rows": rows,
        "power_nstab": None if args.skip_power else args.power_nstab,
        "power_detected": power_failed, "power_rows": power_rows,
        "ok": bool(ok) and (args.skip_power or bool(power_failed)),
    }
    path = os.path.join(out, "verdict.json")
    with open(path, "w") as f:
        json.dump(verdict, f, indent=1)
    print(json.dumps({k: verdict[k] for k in
                      ("config", "ab_pass", "power_detected", "ok")}))
    print(f"full verdict: {path}")
    return 0 if verdict["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
