"""Unequal-time Green's-function sweep (dqmc.cpp:458-514, 223-280).

With the HS fields frozen (this sweep runs after the equal-time update
sweeps, main.cpp:156-158), propagate the triplet

    Gtt(tau) = G(tau,tau),   Gt0(tau) = G(tau,0),   G0t(tau) = G(0,tau)

forward through all slices, restabilizing every block from the LDR pair
(B(tau,0), B(beta,tau)):

    Gtt = [I + Bt0 Bbt]^-1,  Gt0 = [Bt0^-1 + Bbt]^-1,  G0t = -[Bbt^-1 + Bt0]^-1

Because the stack slots are identity-padded (see engine/sweep.py), the
tau = beta endpoint needs no special case: with Bbt = Id the three formulas
reduce exactly to the reference's l == nt-1 branch (dqmc.cpp:265-274).

The scan emits per-tau measurement inputs.  By default it stacks the full
(nt+1)-slice Green's functions (matching the reference's GF struct,
stackngf.h:15-29); callers that cannot afford O(nt * ns^2) memory can pass
a ``measure_fn`` that is applied per-tau inside the scan so only the
reduced observables are materialized.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from dqmc_tpu.engine.state import EngineConfig, WalkerState
from dqmc_tpu.engine.sweep import (
    _inv_invldr_f,
    _inv_pair_f,
    _mat_mul_ldr_f,
    identity_stack,
    slot_get,
)
from dqmc_tpu.models.kinetic import apply_B_left, apply_invB_right
from dqmc_tpu.ops.linalg import LDR


class TauGreens(NamedTuple):
    """Per-tau Green's functions, leading (nt+1,) tau axis then (nfl, ns, ns)."""

    Gtt: jax.Array
    Gt0: jax.Array
    G0t: jax.Array


@partial(jax.jit, static_argnames=("cfg", "measure_fn", "warp"))
def sweep_unequal_time(model, cfg: EngineConfig, state: WalkerState,
                       measure_fn: Optional[Callable] = None,
                       warp: bool = False):
    """Returns (ys, err_max) where ys is ``TauGreens`` stacked over
    tau = 0..nt when measure_fn is None, else the stacked per-tau results of
    ``measure_fn(Gtt, Gt0, G0t)`` (tau axis leading, tau = 0..nt).

    Must be called right after a backward sweep: the stack then holds
    suffix products B(beta, tau) and state.G is G(0,0).

    warp=True applies the symmetric-Trotter half-warp to every Green's
    function seen by the measurement — the reference warps Gtt AND Gt0/G0t
    per tau when unequal-time measurement is on (dqmc.cpp:300-312); the
    propagation/stabilization itself always runs on the unwarped functions.
    """
    nfl, ns = model.n_flavor, model.n_sites
    dtype = model.dtype
    eye = jnp.eye(ns, dtype=dtype)
    eyeB = jnp.tile(eye, (nfl, 1, 1))

    G00 = state.G
    # tau = 0 seeding (dqmc.cpp:235-239): Gt0(0) = G(0,0), G0t(0) = G - I
    Gtt0, Gt00, G0t0 = G00, G00, G00 - eye

    if measure_fn is None:
        emit = lambda a, b, c, g00: TauGreens(a, b, c)
    else:
        emit = measure_fn

    if warp:
        from dqmc_tpu.engine.sweep import half_warp
        raw_emit = emit

        def emit(a, b, c, g00):
            return raw_emit(half_warp(model, a), half_warp(model, b),
                            half_warp(model, c), half_warp(model, g00))

    ls, i_stacks, do_stabs = cfg.slice_schedule(forward=True)
    xs = (jnp.asarray(ls), jnp.asarray(i_stacks), jnp.asarray(do_stabs))

    Bt0_init = slot_get(identity_stack(nfl, 1, ns, dtype), 0)

    def step(carry, x):
        Gtt, Gt0, G0t, Bt0, Bbar, emax = carry
        l, i_stack, do_stab = x
        fields_l = jnp.take(state.fields, l, axis=0)
        Gtt = apply_invB_right(model, fields_l,
                               apply_B_left(model, fields_l, Gtt))
        Gt0 = apply_B_left(model, fields_l, Gt0)
        G0t = apply_invB_right(model, fields_l, G0t)
        Bbar = apply_B_left(model, fields_l, Bbar)

        def stab(args):
            Gtt, Gt0, G0t, Bt0, Bbar = args
            Bt0 = _mat_mul_ldr_f(Bbar, Bt0)
            # suffix B(beta,tau) read from the stack in TRANSPOSE form
            Bbt = slot_get(state.stack, i_stack + 2)
            Gtt_n, _ = _inv_pair_f(Bt0, Bbt)
            Gt0_n = _inv_invldr_f(Bt0, Bbt)
            # G0t = -[B(beta,tau)^{-1} + B(tau,0)]^{-1}; by the transpose
            # identity the same kernel applies with swapped roles, transposed
            G0t_n = -jnp.swapaxes(_inv_invldr_f(Bbt, Bt0), -1, -2)
            err = jnp.maximum(
                jnp.max(jnp.abs(Gtt - Gtt_n)),
                jnp.maximum(jnp.max(jnp.abs(Gt0 - Gt0_n)),
                            jnp.max(jnp.abs(G0t - G0t_n))))
            return Gtt_n, Gt0_n, G0t_n, Bt0, eyeB, err

        def no_stab(args):
            Gtt, Gt0, G0t, Bt0, Bbar = args
            return Gtt, Gt0, G0t, Bt0, Bbar, jnp.zeros((), dtype)

        Gtt, Gt0, G0t, Bt0, Bbar, err = jax.lax.cond(
            do_stab, stab, no_stab, (Gtt, Gt0, G0t, Bt0, Bbar))
        emax = jnp.maximum(emax, err)
        return (Gtt, Gt0, G0t, Bt0, Bbar, emax), emit(Gtt, Gt0, G0t, G00)

    carry0 = (Gtt0, Gt00, G0t0, Bt0_init, eyeB, jnp.zeros((), dtype))
    (_, _, _, _, _, err_max), ys = jax.lax.scan(step, carry0, xs)

    y0 = emit(Gtt0, Gt00, G0t0, G00)
    ys = jax.tree_util.tree_map(
        lambda first, rest: jnp.concatenate([first[None], rest], axis=0),
        y0, ys)
    return ys, err_max
