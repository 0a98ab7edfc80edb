"""Cost breakdown of the fused block kernel's site loop (TPU probe).

The fused propagate+update kernel is ~50% of the headline sweep pair
(BENCHMARKS.md); its site loop runs ~20 Mosaic ops per site and the NOTES
"measured dead ends" list several failed restructurings.  Before trying
another, this probe measures where the per-site time actually goes by
timing VARIANT kernels with parts disabled:

  full        the production kernel (ablation baseline; wraps + site loop)
  no_site     wraps + block product only (site loop removed)
  no_corr     site loop with the 4 big (WB, k, ns) correction ops removed
              (row_eff = row read, col_eff = col read) — NOT correct math,
              timing only
  no_flush    corrections kept, the every-k G/GT flush removed
  decide_only per-site decision chain on raw reads, no U/V writes at all

Wrap-internal ablations (all run with the site loop REMOVED, vs no_site):

  wrap_default   dots at bf16 DEFAULT precision (1 MXU pass instead of
                 HIGHEST's 6) — isolates MXU-pass cost
  wrap_noev      no expV scaling (pure matmul chains) — isolates the VPU
                 elementwise mul/div cost
  wrap_gonly     only the G chain + bbar (GT chain dropped) — NOT correct,
                 isolates the per-matmul cost scaling
  wrap_nobbar    G/GT chains without the block-product accumulation

Variants are local copies of engine/fused._fused_block_kernel with the
same layouts; they are NOT used by the engine.  Usage:
    python tools/site_loop_probe.py [--variants full,no_site,...]
"""

import argparse
import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_kernel(n_slices, k_delay, variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(order_ref, gb_ref, delta_ref, us_ref,
               ev_old_ref, ev_new_ref,
               expK_ref, expKT_ref, invexpKT_ref, expK2_ref,
               g_in_ref,
               g_ref, mask_ref, bbar_ref, acc_ref,
               gt_ref, ut_ref, v_ref):
        WB, ns = g_ref.shape[0], g_ref.shape[-1]
        dtype = g_ref.dtype
        g_ref[...] = g_in_ref[...]
        gt_ref[...] = jnp.swapaxes(g_in_ref[...], -1, -2)
        mask_ref[...] = jnp.zeros_like(mask_ref)
        eyeT = jax.lax.broadcasted_iota(jnp.int32, (ns, ns), 0) == \
            jax.lax.broadcasted_iota(jnp.int32, (ns, ns), 1)
        bbar_ref[...] = jnp.broadcast_to(
            jnp.where(eyeT, jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype)),
            (WB, ns, ns))
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, ns), 1)

        prec = (jax.lax.Precision.DEFAULT if variant == "wrap_default"
                else jax.lax.Precision.HIGHEST)

        def _dot(X, M, dims):
            return jax.lax.dot_general(X, M, dims,
                                       preferred_element_type=dtype,
                                       precision=prec)

        def right(X, M_ref):
            return _dot(X, M_ref[...], (((2,), (0,)), ((), ())))

        def left_t(X, MT_ref):
            return _dot(X, MT_ref[...], (((1,), (0,)), ((), ())))

        def expv_pre(l):
            return ev_old_ref[:, l * ns:(l + 1) * ns]

        def expv_post(l):
            b = l * ns
            m = mask_ref[:, b:b + ns]
            return jnp.where(m > 0.5, ev_new_ref[:, b:b + ns],
                             ev_old_ref[:, b:b + ns])

        def wrap_forward(ev):
            if variant == "wrap_gonly":
                core = left_t(right(gt_ref[...], expKT_ref), expK2_ref)
                g_ref[...] = core * ev[:, :, None] / ev[:, None, :]
                return
            core_t = left_t(right(g_ref[...], expK2_ref), expKT_ref)
            core = left_t(right(gt_ref[...], expKT_ref), expK2_ref)
            if variant == "wrap_noev":
                gt_ref[...] = core_t
                g_ref[...] = core
            else:
                gt_ref[...] = core_t * ev[:, None, :] / ev[:, :, None]
                g_ref[...] = core * ev[:, :, None] / ev[:, None, :]

        def site_loop(l):
            ut_ref[...] = jnp.zeros_like(ut_ref)
            v_ref[...] = jnp.zeros_like(v_ref)
            base = l * ns

            def body(idx, acc):
                slot = jax.lax.rem(idx, jnp.int32(k_delay))
                i = order_ref[l, idx]
                onehot = jnp.where(lane_ids == i, jnp.asarray(1.0, dtype),
                                   jnp.asarray(0.0, dtype))
                gb = gb_ref[pl.ds(base + i, 1), :].reshape(WB, 1)
                delta = delta_ref[pl.ds(base + i, 1), :].reshape(WB, 1)
                u = us_ref[pl.ds(base + idx, 1), :].reshape(WB, 1)

                row_g = g_ref[:, pl.ds(i, 1), :].reshape(WB, ns)
                col_g = gt_ref[:, pl.ds(i, 1), :].reshape(WB, ns)
                if variant in ("no_corr", "decide_only"):
                    row_eff, col_eff = row_g, col_g
                else:
                    ut_all = ut_ref[...]
                    v_all = v_ref[...]
                    ucoef = jnp.sum(ut_all * onehot[None], axis=2)
                    vcoef = jnp.sum(v_all * onehot[None], axis=2)
                    row_eff = row_g + jnp.sum(ucoef[:, :, None] * v_all,
                                              axis=1)
                    col_eff = col_g + jnp.sum(vcoef[:, :, None] * ut_all,
                                              axis=1)
                G_ii = jnp.sum(row_eff * onehot, axis=1, keepdims=True)

                r_flv = 1.0 + (1.0 - G_ii) * delta
                R = gb * r_flv * r_flv
                accept = u < R
                prefac = jnp.where(accept, delta / r_flv,
                                   jnp.zeros_like(delta))
                accf = accept.astype(dtype)

                if variant != "decide_only":
                    ut_ref[:, pl.ds(slot, 1), :] = \
                        (prefac * col_eff)[:, None, :]
                    v_ref[:, pl.ds(slot, 1), :] = \
                        (row_eff - onehot)[:, None, :]
                mask_ref[:, base:base + ns] += accf * onehot

                if variant not in ("no_flush", "decide_only"):
                    @pl.when(slot == k_delay - 1)
                    def _flush():
                        dn = (((1,), (1,)), ((0,), (0,)))
                        g_ref[...] += _dot(ut_ref[...], v_ref[...], dn)
                        gt_ref[...] += _dot(v_ref[...], ut_ref[...], dn)
                        ut_ref[...] = jnp.zeros_like(ut_ref)
                        v_ref[...] = jnp.zeros_like(v_ref)

                return acc

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(ns), body,
                              jnp.int32(0))
            acc_ref[...] += jnp.sum(mask_ref[:, base:base + ns],
                                    axis=1)[None, :]

        wrap_only = variant.startswith("wrap_") or variant == "no_site"
        acc_ref[...] = jnp.zeros_like(acc_ref)
        if variant == "empty":
            # harness floor: kernel launch + G copy-through + output zeros
            return
        for step in range(n_slices):
            l = step
            wrap_forward(expv_pre(l))
            if not wrap_only:
                site_loop(l)
            if variant != "wrap_nobbar":
                bbar_ref[...] = right(bbar_ref[...], expKT_ref) \
                    * expv_post(l)[:, None, :]

    return kernel


def run_variant(variant, W, L, nsl, k_delay, iters, reps):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from dqmc_tpu import hsfield
    from dqmc_tpu.lattice import square_lattice
    from dqmc_tpu.models import AttractiveHubbard

    lat = square_lattice(L, L)
    ns = lat.n_sites
    model = AttractiveHubbard.build(lat, U=4.0, t=1.0, mu=0.0, beta=8.0,
                                    nt=160, dtype=jnp.float32)
    dtype = jnp.float32
    Lrows = nsl * ns
    kern = make_kernel(nsl, k_delay, variant)

    def call_block(order_i, gb_b, delta_b, us_b, evo_b, evn_b, mats, G_b):
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((W, ns, ns), dtype),
                jax.ShapeDtypeStruct((W, Lrows), dtype),
                jax.ShapeDtypeStruct((W, ns, ns), dtype),
                jax.ShapeDtypeStruct((1, W), dtype),
            ),
            in_specs=[smem()] + [vmem()] * 10,
            out_specs=tuple(vmem() for _ in range(4)),
            scratch_shapes=[
                pltpu.VMEM((W, ns, ns), dtype),
                pltpu.VMEM((W, k_delay, ns), dtype),
                pltpu.VMEM((W, k_delay, ns), dtype),
            ],
            input_output_aliases={10: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )(order_i, gb_b, delta_b, us_b, evo_b, evn_b, *mats, G_b)

    expK = model.expK.astype(dtype)
    invexpK = model.invexpK.astype(dtype)
    mats = (expK, expK.T, invexpK.T, invexpK)

    @jax.jit
    def run(key, G):
        ks = jax.random.split(key, 4)
        order = jax.vmap(lambda k: jax.random.permutation(k, ns))(
            jax.random.split(ks[0], nsl)).astype(jnp.int32)
        gb = jax.random.uniform(ks[1], (Lrows, W), dtype, 0.5, 1.5)
        delta = jax.random.uniform(ks[2], (Lrows, W), dtype, -0.5, 0.5)
        us = jax.random.uniform(ks[3], (Lrows, W), dtype)
        ev = jnp.exp(jax.random.normal(ks[1], (W, Lrows)) * 0.1)

        def body(carry, _):
            G, = carry
            G2, mask, bbar, acc = call_block(order, gb, delta, us, ev, ev,
                                             mats, G)
            return (G2,), acc

        (G,), accs = jax.lax.scan(body, (G,), None, length=iters)
        return G, accs

    key = jax.random.PRNGKey(0)
    G0 = jnp.tile(jnp.eye(ns, dtype=dtype) * 0.5, (W, 1, 1))
    out = run(key, G0)
    jax.block_until_ready(out[0])
    times = []
    for _ in range(reps):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        out = run(sub, G0)
        jax.block_until_ready(out[0])
        times.append(time.perf_counter() - t0)
    per_call = min(times) / iters * 1e3
    print(f"{variant:12s}: {per_call:7.3f} ms/block-call "
          f"({per_call / nsl * 1e3:7.1f} us/slice)")
    return per_call


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default="full,no_site,no_corr,no_flush,"
                   "decide_only")
    p.add_argument("--walkers", type=int, default=16)
    p.add_argument("--n-slices", type=int, default=5)
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--k-delay", type=int, default=32)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    from dqmc_tpu import compile_cache
    compile_cache.enable()
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")

    results = {}
    for v in args.variants.split(","):
        results[v] = run_variant(v, args.walkers, args.L, args.n_slices,
                                 args.k_delay, args.iters, args.reps)
    if "full" in results and "no_site" in results:
        site = results["full"] - results["no_site"]
        print(f"\nsite-loop share: {site:.3f} ms/block-call "
              f"({site / results['full'] * 100:.0f}%)")
        n_sites = args.L * args.L
        per_site = site / (args.n_slices * n_sites) * 1e6
        print(f"per site-visit: {per_site:.0f} ns")


if __name__ == "__main__":
    main()
