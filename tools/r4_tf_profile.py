"""Device-time breakdown of ONE tf32/df32 tau-tier call (the measured
sweep's dominant piece) at the headline shape.

The round-4 finding that batching everything but the fold scans moved
tf32 throughput by ~0% says the cost model is wrong somewhere — this
prints the top XLA ops by device time for measurement_uneq_fn alone so
the next optimization targets reality.

Usage: python tools/r4_tf_profile.py [--nm tf32] [--L 16] [--walkers 16]
"""

import argparse
import collections
import glob
import gzip
import json
import shutil
import sys
import tempfile
from types import SimpleNamespace

import os
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nm", default="tf32", choices=("tf32", "df32"))
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--nt", type=int, default=160)
    p.add_argument("--beta", type=float, default=8.0)
    p.add_argument("--n-stab", type=int, default=5)
    p.add_argument("--walkers", type=int, default=16)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--real-measure", action="store_true",
                   help="use the manager's real fused uneq observables "
                        "(greenTau/doublonTau/currxxTau/...) instead of "
                        "a trivial mean")
    args = p.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    from dqmc_tpu import compile_cache
    compile_cache.enable()
    import jax.numpy as jnp
    from dqmc_tpu.engine.parity import measurement_uneq_fn
    from dqmc_tpu.engine.state import EngineConfig
    from dqmc_tpu.lattice import square_lattice
    from dqmc_tpu.models import AttractiveHubbard
    from dqmc_tpu.ops import df32, tf32

    nm = {"df32": df32, "tf32": tf32}[args.nm]
    lat = square_lattice(args.L, args.L)
    m64 = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=0.0,
                                  beta=args.beta, nt=args.nt,
                                  dtype=jnp.float64)
    cfg = EngineConfig(nt=args.nt, n_stab=args.n_stab)
    fields = jax.random.randint(jax.random.PRNGKey(0),
                                (args.walkers, args.nt, lat.n_sites), 0, 4,
                                dtype=jnp.int32)

    if args.real_measure:
        import tempfile
        from dqmc_tpu.measure.manager import MeasurementManager
        manager = MeasurementManager(
            lat, n_walkers=args.walkers, measure_unequal=True,
            dtype=jnp.float32,
            out_dir=tempfile.mkdtemp(prefix="dqmc_tfprof_out_"))
        manager.add_defaults()
        mfn = manager.uneq_measure_fn
    else:
        def mfn(Gtt, Gt0, G0t, G00):
            return jnp.mean(Gtt) + jnp.mean(Gt0) + jnp.mean(G0t)

    fn = measurement_uneq_fn(m64, cfg, nm, mfn)
    step = jax.jit(lambda f: fn(SimpleNamespace(fields=f)))
    out = step(fields)
    jax.block_until_ready(out[1])

    trace_dir = tempfile.mkdtemp(prefix="dqmc_tfprof_")
    jax.profiler.start_trace(trace_dir)
    out = step(fields)
    jax.block_until_ready(out[1])
    jax.profiler.stop_trace()

    ops = collections.Counter()
    n_calls = collections.Counter()
    for fng in glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True):
        with gzip.open(fng, "rt") as fh:
            data = json.load(fh)
        pids = {ev["pid"]: ev["args"].get("name")
                for ev in data["traceEvents"]
                if ev.get("ph") == "M" and ev.get("name") == "process_name"}
        dev = {pid for pid, nmn in pids.items()
               if nmn and ("TPU" in nmn or "/device" in nmn)}
        for ev in data["traceEvents"]:
            if ev.get("ph") != "X" or "dur" not in ev \
                    or ev.get("pid") not in dev:
                continue
            name = ev.get("name", "")
            if name.startswith(("jit_", "while", "cond", "body",
                                "condition")):
                continue
            key = name.split("(")[0][:64]
            ops[key] += ev["dur"]
            n_calls[key] += 1
    shutil.rmtree(trace_dir, ignore_errors=True)

    total = sum(ops.values())
    print(f"\ntau-tier device-time, {args.nm}, {args.L}x{args.L} "
          f"nt={args.nt} n_stab={cfg.n_stab} W={args.walkers}: "
          f"total {total/1e3:.1f} ms")
    print(f"{'op':64s} {'ms':>9s} {'calls':>7s} {'share':>7s}")
    for key, dur in ops.most_common(args.top):
        print(f"{key:64s} {dur/1e3:9.2f} {n_calls[key]:7d} "
              f"{100*dur/total:6.1f}%")


if __name__ == "__main__":
    main()
