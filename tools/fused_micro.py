"""Micro-benchmark harness for the fused block kernel.

Times `fused_block` calls end-to-end on the current backend with
realistic headline-shaped inputs, over enough iterations that the axon
tunnel's whole-program wall clock is trustworthy (NOTES.md: per-op
timings through the tunnel are fiction; multi-hundred-ms batches match
trace totals).  Inputs are re-generated per timing rep from split keys
so the device result cache cannot serve repeats.

Usage: python tools/fused_micro.py [--k-delay 32] [--walkers 16]
           [--n-slices 5] [--L 16] [--iters 20] [--reps 3]
           [--update delayed|submatrix]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k-delay", type=int, default=32)
    p.add_argument("--walkers", type=int, default=16)
    p.add_argument("--n-slices", type=int, default=5)
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--forward", action="store_true", default=True)
    p.add_argument("--update", choices=("delayed", "submatrix"),
                   default="delayed")
    args = p.parse_args()

    from dqmc_tpu import compile_cache
    compile_cache.enable()
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_matmul_precision", "highest")
    from dqmc_tpu.engine.fused import fused_block
    from dqmc_tpu.lattice import square_lattice
    from dqmc_tpu.models import AttractiveHubbard

    W, ns_l, nsl = args.walkers, args.L, args.n_slices
    lat = square_lattice(ns_l, ns_l)
    ns = lat.n_sites
    model = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=0.0, beta=8.0,
                                    nt=160, dtype=jnp.float32)

    @jax.jit
    def run(key, G):
        ks = jax.random.split(key, 4)
        order = jax.vmap(lambda k: jax.random.permutation(k, ns))(
            jax.random.split(ks[0], nsl)).astype(jnp.int32)
        props = jax.random.randint(ks[1], (W, nsl, ns), 0, 3)
        us = jax.random.uniform(ks[2], (W, nsl, ns), jnp.float32)
        fields = jax.random.randint(ks[3], (W, nsl, ns), 0, 4)

        def body(carry, _):
            G, = carry
            G2, f2, bbar, acc = fused_block(
                model, order, props, us, G, fields,
                n_slices=nsl, k_delay=args.k_delay, forward=True,
                update=args.update)
            return (G2,), acc

        (G,), accs = jax.lax.scan(body, (G,), None, length=args.iters)
        return G, accs

    key = jax.random.PRNGKey(0)
    G0 = jnp.tile(jnp.eye(ns, dtype=jnp.float32) * 0.5, (W, 1, 1, 1))
    out = run(key, G0)
    jax.block_until_ready(out[0])
    times = []
    for r in range(args.reps):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        out = run(sub, G0)
        jax.block_until_ready(out[0])
        times.append(time.perf_counter() - t0)
    per_call = min(times) / args.iters * 1e3
    print(f"update={args.update} k_delay={args.k_delay} W={W} ns={ns} "
          f"n_slices={nsl}: "
          f"{per_call:.3f} ms/block-call "
          f"({per_call / nsl:.3f} ms/slice)  walls={['%.3f' % t for t in times]}")


if __name__ == "__main__":
    main()
