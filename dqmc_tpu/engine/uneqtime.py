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
    _mat_mul_ldr_f,
    identity_stack,
    slot_get,
)
from dqmc_tpu.models.kinetic import apply_B_left, apply_invB_right
from dqmc_tpu.ops.linalg import LDR, inv_triplet_dag

_inv_triplet_f = jax.vmap(inv_triplet_dag)


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

    step = _uneq_step(model, cfg, state, lambda a, b, c: emit(a, b, c, G00),
                      eyeB)
    carry0 = (Gtt0, Gt00, G0t0, Bt0_init, eyeB, jnp.zeros((), dtype))
    (_, _, _, _, _, err_max), ys = jax.lax.scan(step, carry0, xs)

    y0 = emit(Gtt0, Gt00, G0t0, G00)
    ys = jax.tree_util.tree_map(
        lambda first, rest: jnp.concatenate([first[None], rest], axis=0),
        y0, ys)
    return ys, err_max


def iter_unequal_time(model, cfg: EngineConfig, state: WalkerState,
                      tau_chunk: int = 16, warp: bool = False):
    """Stream the tau-resolved Green's functions in bounded device memory.

    The full ``TauGreens`` stack is O(3 * nt * nfl * ns^2) — ~4 GB per
    walker at L=32, beta=16 — so large lattices cannot materialize it on
    device.  This generator runs the exact same propagation/stabilization
    chain as ``sweep_unequal_time`` in jitted scan segments of ``tau_chunk``
    slices, yielding ``(tau_start, TauGreens_chunk)`` with the chunk pulled
    to host numpy before the next segment runs.  Chunks concatenate to the
    unchunked result exactly (the scan carry crosses chunk boundaries
    unchanged); tau = 0 is included in the first chunk, so chunk c covers
    tau = [c == 0 ? 0 : c*tau_chunk + 1 .. min((c+1)*tau_chunk, nt)].

    Same contract as sweep_unequal_time: call right after a backward sweep.
    """
    import numpy as np

    nfl, ns = model.n_flavor, model.n_sites
    dtype = model.dtype
    eye = jnp.eye(ns, dtype=dtype)
    eyeB = jnp.tile(eye, (nfl, 1, 1))
    G00 = state.G
    Gtt0, Gt00, G0t0 = G00, G00, G00 - eye

    carry = (Gtt0, Gt00, G0t0,
             slot_get(identity_stack(nfl, 1, ns, dtype), 0), eyeB,
             jnp.zeros((), dtype))
    emit0 = _tau_emit(model, warp)
    first = jax.tree_util.tree_map(lambda x: np.asarray(x)[None],
                                   emit0(Gtt0, Gt00, G0t0))
    for start in range(0, cfg.nt, tau_chunk):
        n = min(tau_chunk, cfg.nt - start)
        carry, ys = _uneq_segment(model, cfg, state, carry, start, n=n,
                                  warp=warp)
        ys = jax.tree_util.tree_map(np.asarray, ys)
        if start == 0:
            ys = jax.tree_util.tree_map(
                lambda f, r: np.concatenate([f, r], axis=0), first, ys)
        yield start, ys


def _tau_emit(model, warp: bool):
    if not warp:
        return TauGreens
    from dqmc_tpu.engine.sweep import half_warp
    return lambda a, b, c: TauGreens(*(half_warp(model, x)
                                       for x in (a, b, c)))


@partial(jax.jit, static_argnames=("cfg", "n", "warp"))
def _uneq_segment(model, cfg, state, carry, start, *, n, warp):
    nfl, ns = model.n_flavor, model.n_sites
    eyeB = jnp.tile(jnp.eye(ns, dtype=model.dtype), (nfl, 1, 1))
    ls, i_stacks, do_stabs = cfg.slice_schedule(forward=True)
    xs = jax.tree_util.tree_map(
        lambda a: jax.lax.dynamic_slice_in_dim(jnp.asarray(a), start, n,
                                               axis=0),
        (ls, i_stacks, do_stabs))
    step = _uneq_step(model, cfg, state, _tau_emit(model, warp), eyeB)
    return jax.lax.scan(step, carry, xs)


def _uneq_step(model, cfg, state, emit, eyeB):
    """The shared per-slice scan body of the unequal-time sweep (without
    the equal-time G00 argument in emit — used by the chunked iterator)."""
    dtype = model.dtype

    def step(carry, x):
        Gtt, Gt0, G0t, Bt0, Bbar, emax = carry
        l, i_stack, do_stab = x
        fields_l = jnp.take(state.fields, l, axis=0)
        # batch the slice's five B-applications into two stacked GEMMs
        # (dqmc.cpp:223-246 does them one by one): B @ [Gtt, Gt0, Bbar]
        # left, then [B Gtt, G0t] @ B^{-1} right — same math, 2 MXU
        # dispatches per slice instead of 5 and expV built twice not five
        # times
        BL = apply_B_left(model, fields_l, jnp.stack([Gtt, Gt0, Bbar]))
        Gt0, Bbar = BL[1], BL[2]
        BR = apply_invB_right(model, fields_l, jnp.stack([BL[0], G0t]))
        Gtt, G0t = BR[0], BR[1]

        def stab(args):
            Gtt, Gt0, G0t, Bt0, Bbar = args
            Bt0 = _mat_mul_ldr_f(Bbar, Bt0)
            Bbt = slot_get(state.stack, i_stack + 2)
            Gtt_n, Gt0_n, G0t_n, _ = _inv_triplet_f(Bt0, Bbt)
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
        return (Gtt, Gt0, G0t, Bt0, Bbar, emax), emit(Gtt, Gt0, G0t)

    return step
