"""Round-4 probe: df32 tau-tier self-check vs stabilization stride.

Campaign 5 (artifacts/r3c5) isolated the df32 tau-resolved measurement
tier's on-chip blowup (4.95e+5 self-check at the 16x16 headline) to the
stride-cap recalibration cf15998 (stride 5 -> 4); the rolled-QR flag was
bit-exactly irrelevant.  This probe calls measurement_uneq_fn DIRECTLY
(the same compiled-scan graph bench.py --measured consumes) on a small
shape and sweeps the stride, to reproduce the failure cheaply and
localize it.

Usage:  python tools/r4_tier_probe.py [--L 8] [--nt 160] [--beta 8]
            [--strides 2,4,5,8,10] [--nm df32] [--walkers 2] [--eager]
"""

from __future__ import annotations

import argparse
import time
from types import SimpleNamespace

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402

from dqmc_tpu import compile_cache  # noqa: E402

compile_cache.enable()

from dqmc_tpu.engine.parity import measurement_uneq_fn  # noqa: E402
from dqmc_tpu.engine.state import EngineConfig  # noqa: E402
from dqmc_tpu.lattice import square_lattice  # noqa: E402
from dqmc_tpu.models import AttractiveHubbard  # noqa: E402
from dqmc_tpu.ops import df32, tf32  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--L", type=int, default=8)
    p.add_argument("--nt", type=int, default=160)
    p.add_argument("--beta", type=float, default=8.0)
    p.add_argument("--U", type=float, default=4.0)
    p.add_argument("--strides", type=str, default="4,5")
    p.add_argument("--nm", type=str, default="df32")
    p.add_argument("--walkers", type=int, default=2)
    p.add_argument("--eager", action="store_true",
                   help="use_scan=False eager path (CPU-safe reference)")
    p.add_argument("--therm", type=int, default=0,
                   help="thermalize the fields with N f32-engine sweep "
                        "pairs first (bench.py's field distribution)")
    p.add_argument("--orth", type=str, default="auto",
                   help="f32 seed orthogonalization: auto|householder")
    args = p.parse_args()

    if args.orth != "auto":
        from dqmc_tpu.ops.linalg import set_f32_orthogonalization
        set_f32_orthogonalization(args.orth)

    nm = {"df32": df32, "tf32": tf32}[args.nm]
    lat = square_lattice(args.L, args.L)
    model64 = AttractiveHubbard.build(lat, U=args.U, t=1.0, mu=-0.1,
                                      beta=args.beta, nt=args.nt,
                                      dtype=jnp.float64)
    # deterministic field configuration, same for every stride
    key = jax.random.PRNGKey(7)
    if args.therm > 0:
        from dqmc_tpu.engine import init_state, sweep_pair
        from dqmc_tpu.engine.fused import supports_fused, sweep_pair_fused
        from dqmc_tpu.engine.state import EngineConfig as EC
        model32 = AttractiveHubbard.build(lat, U=args.U, t=1.0, mu=-0.1,
                                          beta=args.beta, nt=args.nt,
                                          dtype=jnp.float32)
        tcfg = EC(nt=args.nt, n_stab=5, use_pallas=True)
        keys = jax.random.split(key, args.walkers)
        sts = jax.jit(jax.vmap(lambda k: init_state(model32, tcfg, k)))(keys)
        fused = supports_fused(model32, tcfg)
        sw = (jax.jit(lambda s: sweep_pair_fused(model32, tcfg, s)) if fused
              else jax.jit(jax.vmap(lambda s: sweep_pair(model32, tcfg, s))))
        t0 = time.perf_counter()
        for _ in range(args.therm):
            sts = sw(sts)
        fields = jax.block_until_ready(sts.fields)
        print(f"thermalized {args.therm} sweep pairs (fused={fused}) "
              f"in {time.perf_counter() - t0:.1f}s")
    else:
        fields = jax.random.randint(
            key, (args.walkers, args.nt, lat.n_sites), 0, 4,
            dtype=jnp.int32)
    states = SimpleNamespace(fields=fields)

    def measure_fn(Gtt, Gt0, G0t, G00):
        # tiny stand-in observable touching all four inputs
        return (jnp.mean(Gtt) + jnp.mean(Gt0) + jnp.mean(G0t)
                + jnp.mean(G00))

    print(f"device={jax.devices()[0]} nm={args.nm} L={args.L} "
          f"nt={args.nt} beta={args.beta} W={args.walkers} "
          f"eager={args.eager}")
    for s in (int(x) for x in args.strides.split(",")):
        cfg = EngineConfig(nt=args.nt, n_stab=s)
        fn = measurement_uneq_fn(model64, cfg, nm, measure_fn,
                                 n_stab=s,
                                 use_scan=(not args.eager))
        t0 = time.perf_counter()
        if args.eager:
            ys, err = fn(states)
        else:
            ys, err = jax.jit(
                lambda f: fn(SimpleNamespace(fields=f)))(fields)
        err = jax.block_until_ready(err)
        dt = time.perf_counter() - t0
        emax = float(jnp.max(err))
        ymean = float(jnp.mean(ys))
        print(f"stride {s:3d}: self-check err_max = {emax:.3e}   "
              f"mean-obs {ymean:+.6e}   ({dt:.1f}s)")


if __name__ == "__main__":
    main()
