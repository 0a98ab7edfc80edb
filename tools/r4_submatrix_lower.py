"""Round-4: standalone Mosaic-lowering probe for the submatrix kernel.

Campaign 4/5 hit two different Mosaic rejections at the W=1 stretch
shape (ns=1024).  This compiles ONLY the submatrix site-update at the
failing shape (no engine graph) so fixes iterate in ~a minute.

Usage: python tools/r4_submatrix_lower.py [--ns 1024] [--W 1] [--k 32]
"""

import argparse

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ns", type=int, default=1024)
    p.add_argument("--W", type=int, default=1)
    p.add_argument("--k", type=int, default=32)
    p.add_argument("--run", action="store_true",
                   help="also execute once and print checksums")
    args = p.parse_args()

    from dqmc_tpu.ops.kernels import _metropolis_batched_sub_impl

    W, ns = args.W, args.ns
    g_vec = jnp.full((W,), 0.5, jnp.float32)
    alpha_vec = jnp.ones((W,), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), W)
    G = jnp.broadcast_to(jnp.eye(ns, dtype=jnp.float32),
                         (W, 1, ns, ns)) * 0.5
    fields = jnp.zeros((W, ns), jnp.int32)

    fn = lambda *a: _metropolis_batched_sub_impl(*a, k_sub=args.k)
    lowered = jax.jit(fn).lower(g_vec, alpha_vec, keys, G, fields)
    print(f"lowered ok (ns={ns} W={W} k={args.k}); compiling...")
    compiled = lowered.compile()
    print("COMPILE OK")
    if args.run:
        Gn, fn_, acc = compiled(g_vec, alpha_vec, keys, G, fields)
        print("ran: acc =", jax.device_get(acc)[:4],
              "sumG =", float(jnp.sum(Gn)))


if __name__ == "__main__":
    main()
