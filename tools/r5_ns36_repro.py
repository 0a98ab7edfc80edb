"""Chip repro for the ns=36 Mosaic lowering failure (round-5 finding).

The capstone workload is the reference's canonical 6x6 lattice
(ns=36 — NOT a multiple of the 8-sublane tile).  A first chip attempt
died in Mosaic with 'Unsupported reshape: vector<2x36xf32> ->
2x36x1' — every benchmarked shape so far (ns=64/144/256/1024) was
8-aligned, so the Pallas engines were never exercised at a ragged ns.
This tool isolates which engine path fails at ns=36 on hardware:

  1. per-slice Pallas site kernel (EngineConfig(use_pallas=True))
  2. fused block kernel (sweep_pair_fused)
  3. delayed rank-k (pure JAX)

Usage: python tools/r5_ns36_repro.py [--L 6] [--W 2]
"""

import argparse
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--L", type=int, default=6)
    p.add_argument("--W", type=int, default=2)
    p.add_argument("--nt", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from dqmc_tpu.engine import EngineConfig, init_state, sweep_pair
    from dqmc_tpu.engine.fused import supports_fused, sweep_pair_fused
    from dqmc_tpu.lattice import square_lattice
    from dqmc_tpu.models import AttractiveHubbard

    lat = square_lattice(args.L, args.L)
    model = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=-0.1, beta=2.0,
                                    nt=args.nt, dtype=jnp.float32)
    print(f"ns={model.n_sites} W={args.W} backend={jax.default_backend()}",
          flush=True)

    def attempt(name, cfg, fused=False):
        try:
            keys = jax.random.split(jax.random.PRNGKey(0), args.W)
            states = jax.jit(jax.vmap(
                lambda k: init_state(model, cfg, k)))(keys)
            t0 = time.time()
            if fused:
                out = jax.jit(
                    lambda s: sweep_pair_fused(model, cfg, s))(states)
            else:
                out = jax.jit(jax.vmap(
                    lambda s: sweep_pair(model, cfg, s)))(states)
            jax.block_until_ready(out.G)
            print(f"[{name}] OK ({time.time()-t0:.1f}s, "
                  f"acc_sum={float(out.acc_sum.mean()):.3f})", flush=True)
            return True
        except Exception as e:
            print(f"[{name}] FAIL: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)
            traceback.print_exc(limit=3)
            return False

    cfg_p = EngineConfig(nt=args.nt, n_stab=2, use_pallas=True)
    cfg_d = EngineConfig(nt=args.nt, n_stab=2, delay_rank=32)
    ok_p = attempt("per-slice pallas", cfg_p)
    ok_f = (attempt("fused block kernel", cfg_p, fused=True)
            if supports_fused(model, cfg_p) else None)
    ok_d = attempt("delayed rank-k (pure JAX)", cfg_d)
    print({"pallas": ok_p, "fused": ok_f, "delayed": ok_d})


if __name__ == "__main__":
    main()
