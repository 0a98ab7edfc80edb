"""df32 CGS2 QR: ~2^-46 factorization built only from df32 ops.

The parity-grade factorization of the LDR stabilization chain
(ops/df_linalg.py).  A real df orthogonalization loop is required — not a
refinement of the f32 factorization: for graded DQMC folds the f32 Q
basis misaligns from the true triangular basis by O(eps32 * cond)
rotations in the small-d directions; every matmul-level repair either
loses the alignment (Newton orthogonalization), explodes under
un-equilibration (keeping the non-triangular R), caps the backward error
at f32 grade (masking), or diverges (first-order rotations) — all four
measured, see NOTES.md.  Classical Gram-Schmidt with reorthogonalization
carried in df arithmetic resolves the grading down to ~2^-46 directly.

Structure mirrors the f32 Pallas kernel (ops/qr_kernel.py): 32-column
panels, two batched panel-external projection passes (df matmuls on the
MXU via the int8 digit-plane scheme), and a ``lax.fori_loop`` over the
columns inside a panel (two-pass CGS), so the trace/compile cost is O(1)
in the in-panel column count instead of O(n) — a fully unrolled
per-column loop at n=256 produced ~100k-primitive graphs that took XLA
minutes to compile.

Everything runs on A^T (rows = columns of A), per-column access is a
sublane dynamic slice, and R is accumulated transposed, exactly like the
Pallas kernel's layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dqmc_tpu.ops import df32
from dqmc_tpu.ops.df32 import DF

_BLOCK = 32


def _t(x: DF) -> DF:
    return DF(jnp.swapaxes(x.hi, -1, -2), jnp.swapaxes(x.lo, -1, -2))


def _rows(x: DF, a, b) -> DF:
    return DF(x.hi[..., a:b, :], x.lo[..., a:b, :])


def _set_rows(x: DF, a, b, v: DF) -> DF:
    return DF(x.hi.at[..., a:b, :].set(v.hi),
              x.lo.at[..., a:b, :].set(v.lo))


def _dyn_row(x: DF, t, size=1) -> DF:
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, t, size, axis=-2)
    return DF(sl(x.hi), sl(x.lo))


def _dyn_set_row(x: DF, t, v: DF) -> DF:
    st = lambda a, u: jax.lax.dynamic_update_slice_in_dim(a, u, t, axis=-2)
    return DF(st(x.hi, v.hi), st(x.lo, v.lo))


def df_qr(A: DF):
    """(Q, R) with A = Q R to ~2^-46 columnwise, Q df-orthonormal, R upper.

    A: (..., n, n) df pair; any leading batch dims.  n not a multiple of
    the 32-column panel runs as one full-width panel (validation sizes;
    the engine's lattices are padded upstream).
    """
    n = A.hi.shape[-1]
    block = _BLOCK if n % _BLOCK == 0 else n
    QT = _t(A)                                      # rows = columns of A
    batch = A.hi.shape[:-2]
    rt = DF(jnp.zeros(batch + (n, n), jnp.float32),
            jnp.zeros(batch + (n, n), jnp.float32))
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)

    for ip in range(n // block):
        p = ip * block
        # --- panel-external orthogonalization (twice, CGS2) ---
        for _ in range(2 if p else 0):
            P = _rows(QT, p, p + block)
            Qdone = _rows(QT, 0, p)
            C = df32.matmul(P, _t(Qdone))           # (block, p)
            P = df32.sub(P, df32.matmul(C, Qdone))
            QT = _set_rows(QT, p, p + block, P)
            rt = DF(rt.hi.at[..., p:p + block, 0:p].add(C.hi),
                    rt.lo.at[..., p:p + block, 0:p].add(C.lo))

        # --- in-panel two-pass CGS, fori_loop over columns ---
        # Carry: a zero-initialized ``Qfin`` buffer that receives each
        # finished q, and the panel-local R^T rows.  Projections run
        # against Qfin only — its rows beyond the current column are
        # exactly zero, so they contribute exactly 0 in the digit-plane
        # matmul AND keep its per-row/column scales at the finished-q
        # magnitude.  (Projecting against the raw panel with a lane mask
        # is algebraically identical but numerically ~50x worse: the raw
        # unfinished columns dominate the Ozaki per-column scales, and
        # every q-row contribution is quantized relative to those larger
        # scales — measured on the graded QR test.)
        def col_step(t, carry):
            Qfin, rg = carry                         # (.., block, n) df x2
            y = _dyn_row(P0, t)                      # (.., 1, n) raw column
            row = DF(jnp.zeros(batch + (1, block), jnp.float32),
                     jnp.zeros(batch + (1, block), jnp.float32))
            for _ in range(2):
                c = df32.matmul(y, _t(Qfin))         # (.., 1, block)
                y = df32.sub(y, df32.matmul(c, Qfin))
                row = df32.add(row, c)
            nrm2 = df32.matmul(y, _t(y))             # (.., 1, 1)
            nrm = df32.sqrt(DF(nrm2.hi[..., 0, 0], nrm2.lo[..., 0, 0]))
            safe = df32.where(nrm.hi == 0,
                              df32.df(jnp.ones_like(nrm.hi)), nrm)
            inv = df32.div(df32.df(jnp.ones_like(nrm.hi)), safe)
            q = df32.mul(y, DF(inv.hi[..., None, None],
                               inv.lo[..., None, None]))
            Qfin = _dyn_set_row(Qfin, t, q)
            diag = (col_ids == t)
            row = df32.where(jnp.broadcast_to(diag, row.hi.shape),
                             DF(jnp.broadcast_to(nrm.hi[..., None, None],
                                                 row.hi.shape),
                                jnp.broadcast_to(nrm.lo[..., None, None],
                                                 row.lo.shape)),
                             row)
            rg = _dyn_set_row(rg, t, row)
            return Qfin, rg

        P0 = _rows(QT, p, p + block)
        z = DF(jnp.zeros(batch + (block, n), jnp.float32),
               jnp.zeros(batch + (block, n), jnp.float32))
        rg0 = DF(jnp.zeros(batch + (block, block), jnp.float32),
                 jnp.zeros(batch + (block, block), jnp.float32))
        Qfin, rg = jax.lax.fori_loop(0, block, col_step, (z, rg0))
        QT = _set_rows(QT, p, p + block, Qfin)
        rt = DF(rt.hi.at[..., p:p + block, p:p + block].set(rg.hi),
                rt.lo.at[..., p:p + block, p:p + block].set(rg.lo))
    return _t(QT), _t(rt)
