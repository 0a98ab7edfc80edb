"""Parity-grade (df32) Green's-function rebuild at the engine level.

Computes G(0,0) = [I + B(beta,0)]^{-1} for a FIXED field configuration
with ~2^-46 numerics built entirely from f32 TPU hardware operations
(ops/df_linalg) — the north-star parity quantity (BASELINE.md:
max|dG| < 1e-10 vs the reference on a fixed field configuration).

Current role: validation and spot-checking.  A production df32 sweep
needs the df CGS2 Pallas kernel (NOTES.md roadmap); this module defines
the exact semantics that kernel must reproduce, and gives users an
on-demand parity probe for any field configuration produced by the fast
f32 engine.  Pass the f64-BUILT twin of the running model (so expK
carries its full scipy-computed precision)::

    m64 = AttractiveHubbard.build(lat, U=U, t=t, mu=mu, beta=beta,
                                  nt=nt, dtype=jnp.float64)
    G_df, log_det = parity_rebuild_greens(m64, cfg, state.fields)
    err = jnp.max(jnp.abs(G_df.hi - state.G[0]))   # f32-chain deviation
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from dqmc_tpu import hsfield
from dqmc_tpu.engine.state import EngineConfig
from dqmc_tpu.ops import df32, df_linalg
from dqmc_tpu.ops.df32 import DF


def _maybe_jit(f):
    """jit on accelerators; eager on CPU.

    XLA:CPU's backend codegen at optimization level > 0 corrupts fused
    double-float graphs: the identical fold chain measures 1.1e-8 eager
    vs 5.4e-4 jitted on CPU (LLVM-level contraction/reassociation across
    the fused error-free transformations; --xla_backend_optimization_level=0
    restores 1.3e-8).  TPU compiles the same graphs bit-stably (eager ==
    jitted, measured) — see NOTES.md round-4 log.
    """
    jitted = jax.jit(f)

    def call(*args, **kw):
        if jax.default_backend() == "cpu":
            return f(*args, **kw)
        return jitted(*args, **kw)

    return call


def _expv_table_f64(model) -> np.ndarray:
    """exp(g * eta(s)) for the 4 field states, f64 (4,) per flavor sign."""
    g = float(np.asarray(model.g, np.float64))
    eta = np.asarray(hsfield.ETA, np.float64)
    return np.exp(g * eta)


def _slice_B_df(model, expK: DF, fields_l: jax.Array) -> DF:
    """df B_l = diag(expV(s_l)) @ expK (model.cpp:75-80 semantics).

    The diagonal scaling must be a FULL df multiply (two_prod on the hi
    parts): a plain ``hi*hi`` product drops its own rounding error, which
    caps every B at 2^-24 relative and with it the whole parity tier.
    Select-chain over the 4 field values, not a gather (NOTES.md: tiny
    jnp table gathers lower to element-at-a-time XLA gathers)."""
    tbl = _expv_table_f64(model)
    evh = jnp.zeros(fields_l.shape, jnp.float32)
    evl = jnp.zeros(fields_l.shape, jnp.float32)
    for v in range(4):
        h = np.float32(tbl[v])
        l = np.float32(tbl[v] - np.float64(h))
        evh = jnp.where(fields_l == v, h, evh)
        evl = jnp.where(fields_l == v, l, evl)
    ev = DF(evh[..., :, None], evl[..., :, None])
    return df32.mul(expK, ev)


def parity_rebuild_greens(model, cfg: EngineConfig, fields: jax.Array):
    """(G as DF pair (ns, ns), log_det) for one walker's field config.

    Single flavor (the attractive model); the chain runs the dag
    (transpose-suffix) fold exactly like engine.sweep's rebuild
    (dqmc.cpp:43-72), block products dense in df, one df QR per block.
    """
    if model.n_flavor != 1:
        raise NotImplementedError("parity rebuild: single flavor only")
    if model.expK.dtype != jnp.float64:
        raise ValueError("parity rebuild needs the f64-built model twin "
                         "(expK at full precision); build with "
                         "dtype=jnp.float64")
    ns = model.n_sites
    expK = df32.from_f64(model.expK)

    @_maybe_jit
    def block_product(fields_blk):
        Bbar = df32.df(jnp.eye(ns, dtype=jnp.float32))
        n_blk = fields_blk.shape[0]
        for i in range(n_blk):
            B = _slice_B_df(model, expK, fields_blk[i])
            Bbar = df32.matmul(B, Bbar)
        return Bbar

    fold = _maybe_jit(lambda BbarT, F: df_linalg.mat_mul_ldr(BbarT, F))
    first = _maybe_jit(df_linalg.to_ldr)
    inv = _maybe_jit(df_linalg.inv_one_plus_ldr_dag)

    F2t = None
    for i_stack in range(cfg.n_stack - 1, -1, -1):
        l0 = i_stack * cfg.n_stab
        l1 = min(l0 + cfg.n_stab, cfg.nt)
        Bbar = block_product(fields[l0:l1])
        BbarT = df_linalg.transpose(Bbar)
        F2t = first(BbarT) if F2t is None else fold(BbarT, F2t)

    eye = df32.df(jnp.eye(ns, dtype=jnp.float32))
    F1 = first(eye)
    G, log_det = inv(F1, F2t)
    return G, log_det
