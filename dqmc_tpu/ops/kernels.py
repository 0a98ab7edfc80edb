"""Pallas TPU kernels for the DQMC hot ops.

The profiling story (see bench.py history): one Monte-Carlo sweep is
dominated not by the O(ns^3) GEMMs (MXU-friendly) but by the *sequential*
Metropolis site loop — ns dependent steps per time slice, each a handful of
small vector ops.  As a `lax.scan`, every step pays XLA op-dispatch
latency (~12us/site at ns=256).  This module implements the entire site
loop as ONE Pallas program per walker: the Green's function stays resident
in VMEM, each site does a dynamic row/column read, a scalar Metropolis
decision in SMEM, and a rank-1 VPU outer-product accumulate — no HBM
traffic and no per-op dispatch inside the loop.

The random stream (visit order, proposals, uniforms) is drawn OUTSIDE with
jax.random and passed in, so the kernel reproduces the exact Markov chain
of engine.sweep.local_update_slice (asserted in tests via interpret mode).

Single stored flavor (spin-symmetric attractive model, det_power=2) is
specialized here; multi-flavor models use the scan path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _update_kernel(scal_ref, table_ref, fields_in_ref, order_ref, props_ref,
                   us_ref, g_in_ref, g_ref, fields_ref, acc_ref):
    """One walker's full-slice Metropolis sweep, VMEM-resident.

    SMEM refs: scal (1, 10) f32 = [g, alpha, eta0..3, gamma0..3]:
               table (4, 3) i32, fields/order/props (1, ns) i32, us (1, ns)
               f32, acc (1, 1) f32 out.
    VMEM refs: g_in / g (1, ns, ns) f32 (aliased in/out).
    """
    ns = g_ref.shape[-1]
    dtype = g_ref.dtype
    g_ref[...] = g_in_ref[...]

    # SMEM supports scalar access only: copy the field row element-wise
    def copy_field(j, _):
        fields_ref[0, j] = fields_in_ref[0, j]
        return 0

    jax.lax.fori_loop(0, ns, copy_field, 0)

    g_hs = scal_ref[0, 0]
    alpha = scal_ref[0, 1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, ns), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (ns, 1), 0)

    def eta(s):
        return scal_ref[0, 2 + s]

    def gamma(s):
        return scal_ref[0, 6 + s]

    def body(idx, acc):
        i = order_ref[0, idx]
        old = fields_ref[0, i]
        new = table_ref[old, props_ref[0, idx]]
        u = us_ref[0, idx]
        d_eta = eta(new) - eta(old)
        gammaR = gamma(new) / gamma(old)
        bosonR = jnp.exp(alpha * g_hs * d_eta)
        delta = jnp.exp(g_hs * d_eta) - 1.0  # expm1 not lowered on TPU pallas
        row = g_ref[0, pl.ds(i, 1), :]               # (1, ns)
        onehot = jnp.where(col_ids == i, jnp.asarray(1.0, dtype),
                           jnp.asarray(0.0, dtype))  # (1, ns)
        G_ii = jnp.sum(row * onehot)
        r_flv = 1.0 + (1.0 - G_ii) * delta
        # spin-symmetric attractive model: determinant ratio squared
        R = gammaR * bosonR * r_flv * r_flv
        accept = u < jnp.minimum(jnp.asarray(1.0, dtype), jnp.abs(R))

        @pl.when(accept)
        def _():
            prefac = delta / r_flv
            # column via row-select + reduce (lane-dynamic slices are slow):
            # col[j] = G[j, i] = sum_k G[j, k] * onehot_i[k]
            col = jnp.sum(g_ref[0, :, :] * onehot, axis=1,
                          keepdims=True)                     # (ns, 1)
            v = row - onehot
            g_ref[0, :, :] += (prefac * col) * v             # rank-1 VPU
            fields_ref[0, i] = new

        return acc + accept.astype(dtype)

    acc = jax.lax.fori_loop(0, ns, body, jnp.asarray(0.0, dtype))
    acc_ref[0, 0] = acc / ns


@functools.partial(jax.jit, static_argnames=("interpret",))
def metropolis_slice_update(model, key: jax.Array, G: jax.Array,
                            fields_l: jax.Array, *, interpret: bool = False):
    """Pallas-accelerated drop-in for engine.sweep.local_update_slice.

    G: (1, ns, ns) single-flavor Green's function; fields_l: (ns,).
    Returns (G, fields_l, acceptance_fraction) with the identical Markov
    chain (same key -> same stream -> same decisions).
    """
    from dqmc_tpu import hsfield

    from dqmc_tpu.engine.sweep import draw_slice_randoms

    ns = model.n_sites
    dtype = G.dtype
    order, props, us = draw_slice_randoms(key, ns, dtype)
    order = order.astype(jnp.int32)
    props = props.astype(jnp.int32)

    table = jnp.asarray(hsfield.PROPOSAL, jnp.int32)
    scal = jnp.concatenate([
        model.g.astype(dtype).reshape(1),
        model.alpha.astype(dtype).reshape(1),
        jnp.asarray(hsfield.ETA, dtype),
        jnp.asarray(hsfield.GAMMA, dtype),
    ]).reshape(1, 10)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    G_new, fields_new, acc = pl.pallas_call(
        _update_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, ns, ns), dtype),
            jax.ShapeDtypeStruct((1, ns), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ),
        in_specs=[smem(), smem(), smem(), smem(), smem(), smem(), vmem()],
        out_specs=(vmem(), smem(), smem()),
        input_output_aliases={6: 0},
        interpret=interpret,
    )(scal, table, fields_l.reshape(1, ns).astype(jnp.int32),
      order.reshape(1, ns), props.reshape(1, ns), us.reshape(1, ns), G)

    return G_new, fields_new[0], acc[0, 0]
