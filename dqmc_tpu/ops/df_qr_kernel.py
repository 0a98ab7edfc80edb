"""Pallas TPU kernel for the df32 CGS2 panel loop.

The pure-XLA df QR (ops/df_qr.py) spends nearly all its time in the
sequential in-panel column loop: every column does two projection passes
whose tiny df matmuls each pay the full Ozaki digit-plane machinery as
separate XLA fusions — measured ~8-10 ms per (8,256,256) factorization,
which at 64 stabilizations per sweep-pair is the parity engine's
dominant cost (NOTES.md round-4 profile: 88% "fusions").

This module keeps the panel-EXTERNAL projections in XLA (two batched
df32.matmul calls per panel — already MXU int8 Ozaki, cheap) and fuses
the in-panel loop into one Pallas program per panel.  In-kernel df dot
products use an exact bf16 digit-plane scheme:

- each df row vector is scaled by a per-row power of two (exponent
  planted by f32 bit tricks — exact; Mosaic has no frexp and jnp.exp2
  is a polynomial near-power) and split into 7 signed 7-bit digit
  planes held as bf16 integers <= 64 (exactly representable);
- an MXU bf16 x bf16 -> f32 dot of two digit planes accumulates
  EXACTLY (products <= 2^12, partial sums integers < 2^21 < 2^24 for
  k <= 256), so every digit-class product is error-free; classes
  recombine with power-of-two weights in df arithmetic.

Mosaic layout constraints shape the data structures:

- bf16 VMEM stores must be 8-row aligned (2 rows/sublane packing), so
  the finished-q plane buffer allots 8 rows per column (7 planes + one
  zero row) and each column flushes all 8 rows in one aligned store;
- per-(i, j) class slices of the projection dot would need strided
  lane reads, so recombination instead runs on EXPANDED lanes (column
  t's results live at lane 8t) using lane-roll trees; R rows are
  emitted lane-expanded and compacted by the XLA wrapper ([..., ::8]);
- the rank-block update contraction mixes digit weights across lanes,
  which would break exact f32 accumulation — it runs as 7 dots, one
  per q-digit plane, each masked to its lane class (static masks) and
  therefore integer-exact.

Projections run against the zero-initialized plane buffer, so
unfinished columns contribute exactly zero and need no masking
(the same zero-padding insight as ops/df_qr.py — see there for why
projecting against raw panels is ~50x worse).

Numerical contract: same algorithm as ops/df_qr.df_qr (two projection
passes per column against finished in-panel q's, R accumulated from
process coefficients) hence the same ~2^-46 columnwise backward error
on graded DQMC folds; pinned against the XLA path and an f64 oracle in
tests/test_df_qr_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dqmc_tpu.ops import df32
from dqmc_tpu.ops.df32 import DF

_BLOCK = 32
_NP = 7            # digit planes: 7 x 7 bits = 49 = df32's significand
_PBITS = 7
_X = 8             # plane rows allotted per column (7 + 1 pad, aligned)

# Mosaic's lower_fun nesting for this kernel's convert chains exceeds
# CPython's default 1000-frame recursion limit at some shapes (observed:
# unbatched n=64 panels — RecursionError inside
# _convert_element_type_lowering_rule); the lowering is finite, just deep.
import sys as _sys

if _sys.getrecursionlimit() < 10000:
    _sys.setrecursionlimit(10000)


def _t(x: DF) -> DF:
    return DF(jnp.swapaxes(x.hi, -1, -2), jnp.swapaxes(x.lo, -1, -2))


def _rows(x: DF, a, b) -> DF:
    return DF(x.hi[..., a:b, :], x.lo[..., a:b, :])


def _set_rows(x: DF, a, b, v: DF) -> DF:
    return DF(x.hi.at[..., a:b, :].set(v.hi),
              x.lo.at[..., a:b, :].set(v.lo))


# ----------------------------------------------------------------------
# in-kernel df helpers
# ----------------------------------------------------------------------

def _pow2_scales(m):
    """(s, inv_s): s = 2^(e+1) for m = f * 2^e, f in [1, 2); both exact.

    m >= 0 f32.  The exponent comes straight off the bit pattern and the
    scale/inverse are built by planting (e +- bias) in the exponent
    field.  m == 0 (or subnormal, exponent field 0) maps to scale 1.
    """
    i32 = lambda c: jnp.int32(c)  # x64-safe: literals must stay int32
    bits = jax.lax.bitcast_convert_type(m, jnp.int32)
    e = jax.lax.shift_right_logical(bits, i32(23)) & i32(0xFF)
    s = jax.lax.bitcast_convert_type(
        jax.lax.shift_left(e + i32(1), i32(23)), jnp.float32)
    inv_s = jax.lax.bitcast_convert_type(
        jax.lax.shift_left(i32(253) - e, i32(23)), jnp.float32)
    good = e > 0
    one = jnp.ones_like(m)
    return jnp.where(good, s, one), jnp.where(good, inv_s, one)


def _extract_planes(v: DF, axis: int = -1):
    """(planes [NP f32 digit arrays], s): v = s*(sum_i p_i 2^{-7(i+1)} + r).

    Digits p_i in [-64, 64]; |r| <= 2^-49; every residual subtraction is
    exact (each p_i/w is a representable multiple of a power of two).
    """
    mag = jnp.max(jnp.abs(v.hi), axis=axis, keepdims=True)
    s, inv_s = _pow2_scales(mag)
    r = DF(v.hi * inv_s, v.lo * inv_s)          # exact: power-of-two mul
    planes = []
    for i in range(_NP):
        w = np.float32(2.0 ** (_PBITS * (i + 1)))
        inv_w = np.float32(2.0 ** (-_PBITS * (i + 1)))
        q = jnp.floor(r.hi * w + 0.5)           # rint up to ties: |q|<=64
        planes.append(q)
        r = df32.sub(r, DF(q * inv_w, jnp.zeros_like(q)))
    return planes, s


def _stack8_bf16(planes):
    """NP digit arrays (.., 1, n) -> (.., 8, n) bf16 with one zero row."""
    rows = [p.astype(jnp.bfloat16) for p in planes]
    rows.append(jnp.zeros_like(rows[0]))
    return jnp.concatenate(rows, axis=-2)


def _wsum_df(terms, w0_exp):
    """df sum of exact-f32 terms[k] weighted 2^{w0_exp - 7k}, high first."""
    acc = None
    for k, t in enumerate(terms):
        w = np.float32(2.0 ** (w0_exp - _PBITS * k))
        tdf = DF(t * w, jnp.zeros_like(t))
        acc = tdf if acc is None else df32.add(acc, tdf)
    return acc


# ----------------------------------------------------------------------
# the panel kernel
# ----------------------------------------------------------------------

def _panel_kernel(block, n, ph_ref, pl_ref, qh_ref, ql_ref, rh_ref, rl_ref,
                  pq_ref, sq_ref):
    """Two-pass CGS over one 32-column panel, all-df, in VMEM.

    ph/pl (WB, block, n): panel rows = columns of A (externally
    orthogonalized already).  qh/ql (WB, block, n): finished df q rows.
    rh/rl (WB, block, X*block): LANE-EXPANDED panel R rows — column u's
    coefficient sits at lane X*u; the wrapper compacts with [..., ::X].
    pq (WB, X*block, n) bf16 scratch: rows X*t..X*t+6 hold q_t's digit
    planes, row X*t+7 stays zero — zero-initialized so unfinished
    columns project to exactly 0.  sq (WB, X*block) f32 scratch: s_q of
    column t broadcast over lanes [X*t, X*t+8).
    """
    WB = ph_ref.shape[0]
    f32 = jnp.float32
    nx = _X * block
    qh_ref[...] = jnp.zeros_like(qh_ref)
    ql_ref[...] = jnp.zeros_like(ql_ref)
    rh_ref[...] = jnp.zeros_like(rh_ref)
    rl_ref[...] = jnp.zeros_like(rl_ref)
    pq_ref[...] = jnp.zeros_like(pq_ref)
    sq_ref[...] = jnp.ones_like(sq_ref)

    lane_x = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx), 2)
    # keep every scalar in the modular lane arithmetic an explicit int32:
    # under jax_enable_x64 a bare Python int becomes an i64[] operand and
    # Mosaic's convert-lowering recurses without terminating on it
    _Xc = jnp.int32(_X)
    m0 = (lane_x % _Xc == 0).astype(f32)          # lanes X*t

    def dot_n(x, y):
        # (WB, a, n) x (WB, b, n) -> (WB, a, b): contract lanes
        return jax.lax.dot_general(
            x, y, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT)

    def dot_r(x, y):
        # (WB, a, k) x (WB, k, n) -> (WB, a, n): contract rows of y
        return jax.lax.dot_general(
            x, y, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT)

    def col_step(t, _):
        y = DF(ph_ref[:, pl.ds(t, 1), :], pl_ref[:, pl.ds(t, 1), :])
        row_acc = DF(jnp.zeros((WB, 1, nx), f32),
                     jnp.zeros((WB, 1, nx), f32))
        sq_exp = sq_ref[...].reshape(WB, 1, nx)

        for _pass in range(2):
            planes_y, s_y = _extract_planes(y)       # (WB, 1, n) each
            ystack = _stack8_bf16(planes_y)          # (WB, 8, n)
            qplanes = pq_ref[...]                    # (WB, nx, n) bf16
            D = dot_n(ystack, qplanes)               # (WB, 8, nx) exact
            # E[l] = sum_i 2^{-7(i+1)} D[i, l]  (df; terms exact f32)
            E = _wsum_df([D[:, i:i + 1, :] for i in range(_NP)],
                         -_PBITS)
            # c[X*t'] = sum_j 2^{-7(j+1)} E[X*t'+j]  (lane-roll tree)
            c_full = None
            for j in range(_NP):
                w = np.float32(2.0 ** (-_PBITS * (j + 1)))
                if j == 0:        # roll-by-0 lowers to a 0-size slice
                    term = DF(E.hi * w, E.lo * w)
                else:
                    term = DF(jnp.roll(E.hi, -j, axis=2) * w,
                              jnp.roll(E.lo, -j, axis=2) * w)
                c_full = term if c_full is None else df32.add(c_full, term)
            # c_true = c * s_y * s_q   (power-of-two muls: exact)
            sy_sq = s_y * sq_exp
            row_acc = df32.add(row_acc, DF(c_full.hi * sy_sq,
                                           c_full.lo * sy_sq))
            # update y -= s_y * sum_t (c[t] s_q[t]^2) qhat[t]
            sq2_m = sq_exp * sq_exp * m0
            e = DF(c_full.hi * sq2_m, c_full.lo * sq2_m)
            # group-broadcast lanes X*t -> [X*t, X*t+8) (adds onto exact
            # zeros: error-free)
            for shift in (1, 2, 4):
                e = DF(e.hi + jnp.roll(e.hi, shift, axis=2),
                       e.lo + jnp.roll(e.lo, shift, axis=2))
            planes_e, s_e = _extract_planes(e)       # (WB, 1, nx) each
            estack = _stack8_bf16(planes_e)          # (WB, 8, nx)
            # 7 per-digit-plane dots, each masked to its lane class so
            # every f32 accumulation keeps a single power-of-two scale
            cls = [None] * (2 * _NP - 1)
            for j in range(_NP):
                mj = (lane_x % _Xc == jnp.int32(j))
                lhs = jnp.where(mj, estack, jnp.bfloat16(0))
                Dj = dot_r(lhs, qplanes)             # (WB, 8, n) exact
                for i in range(_NP - j):
                    p = Dj[:, i:i + 1, :]
                    w = i + j
                    cls[w] = p if cls[w] is None else cls[w] + p
            delta = _wsum_df(cls[:_NP], -2 * _PBITS)
            se_sy = s_e * s_y
            y = df32.sub(y, DF(delta.hi * se_sy, delta.lo * se_sy))

        # norm^2 = y . y from y's digit planes (exact class products)
        planes_y, s_y = _extract_planes(y)
        ystack = _stack8_bf16(planes_y)
        Dn = dot_n(ystack, ystack)                   # (WB, 8, 8)
        cls_n = [None] * _NP
        for i in range(_NP):
            for j in range(_NP - i):
                p = Dn[:, i:i + 1, j:j + 1]
                w = i + j
                cls_n[w] = p if cls_n[w] is None else cls_n[w] + p
        nrm2_hat = _wsum_df(cls_n, -2 * _PBITS)      # (WB, 1, 1) df
        sy2 = s_y * s_y
        nrm = df32.sqrt(DF((nrm2_hat.hi * sy2).reshape(WB, 1),
                           (nrm2_hat.lo * sy2).reshape(WB, 1)))
        zero = nrm.hi == 0
        safe = df32.where(zero, df32.df(jnp.ones_like(nrm.hi)), nrm)
        inv = df32.div(df32.df(jnp.ones_like(safe.hi)), safe)
        q = df32.mul(y, DF(inv.hi[:, :, None], inv.lo[:, :, None]))
        q = df32.where(jnp.broadcast_to(zero[:, :, None], q.hi.shape),
                       DF(jnp.zeros_like(q.hi), jnp.zeros_like(q.lo)), q)

        qh_ref[:, pl.ds(t, 1), :] = q.hi
        ql_ref[:, pl.ds(t, 1), :] = q.lo
        # flush q's planes: one aligned 8-row bf16 store at X*t
        planes_q, s_q = _extract_planes(q)
        pq_ref[:, pl.ds(t * _X, _X), :] = _stack8_bf16(planes_q)
        grp = (lane_x // _Xc == t).reshape(1, nx)
        sq_all = sq_ref[...]
        sq_ref[...] = jnp.where(grp, s_q.reshape(WB, 1), sq_all)
        # R row (expanded): coefficients at lanes X*u, diag at lane X*t
        diag = (lane_x == t * _X)
        rrow = df32.where(jnp.broadcast_to(diag, row_acc.hi.shape),
                          DF(jnp.broadcast_to(nrm.hi[:, :, None],
                                              row_acc.hi.shape),
                             jnp.broadcast_to(nrm.lo[:, :, None],
                                              row_acc.lo.shape)),
                          row_acc)
        rh_ref[:, pl.ds(t, 1), :] = rrow.hi
        rl_ref[:, pl.ds(t, 1), :] = rrow.lo
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(block), col_step,
                      jnp.int32(0))


def _panel_cgs2_impl(Ph, Pl, interpret: bool = False):
    """df two-pass CGS of one panel: (B, block, n) -> 4 arrays
    (qh, ql, rh_expanded, rl_expanded)."""
    B, block, n = Ph.shape
    f32 = jnp.float32
    # whole batch in one program: VMEM per walker is ~(block, n) x 6 f32
    # + (X*block, n) bf16 ~= 0.5 MB at n=256 — far under the cap
    kern = functools.partial(_panel_kernel, block, n)
    out = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((B, block, n), f32),
                   jax.ShapeDtypeStruct((B, block, n), f32),
                   jax.ShapeDtypeStruct((B, block, _X * block), f32),
                   jax.ShapeDtypeStruct((B, block, _X * block), f32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((B, _X * block, n), jnp.bfloat16),
            pltpu.VMEM((B, _X * block), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(Ph, Pl)
    return out


# vmap plumbing (mirrors ops/qr_kernel): vmapped calls flatten into ONE
# batched kernel instead of a grid of batch-1 programs

@jax.custom_batching.custom_vmap
def _panel_flat(Ph, Pl):
    interpret = jax.default_backend() == "cpu"
    return _panel_cgs2_impl(Ph, Pl, interpret=interpret)


@_panel_flat.def_vmap
def _panel_flat_vmap(axis_size, in_batched, Ph, Pl):
    B2, B, block, n = axis_size, Ph.shape[1], Ph.shape[2], Ph.shape[3]
    out = _panel_flat(Ph.reshape(B2 * B, block, n),
                      Pl.reshape(B2 * B, block, n))
    return tuple(x.reshape((B2, B) + x.shape[1:]) for x in out), (True,) * 4


@jax.custom_batching.custom_vmap
def _panel_single(Ph, Pl):
    """(block, n) unbatched panel — the shape vmapped traces see."""
    interpret = jax.default_backend() == "cpu"
    out = _panel_cgs2_impl(Ph[None], Pl[None], interpret=interpret)
    return tuple(x[0] for x in out)


@_panel_single.def_vmap
def _panel_single_vmap(axis_size, in_batched, Ph, Pl):
    return _panel_flat(Ph, Pl), (True,) * 4


def _panel_call(P: DF):
    """(Q df, Rg df) of one externally-orthogonalized panel (.., block, n);
    compacts the kernel's lane-expanded R rows."""
    if P.hi.ndim == 2:
        out = _panel_single(P.hi, P.lo)
    else:
        lead = P.hi.shape[:-2]
        block, n = P.hi.shape[-2:]
        out = _panel_flat(P.hi.reshape((-1, block, n)),
                          P.lo.reshape((-1, block, n)))
        out = tuple(x.reshape(lead + x.shape[1:]) for x in out)
    qh, ql, rhx, rlx = out
    return DF(qh, ql), DF(rhx[..., ::_X], rlx[..., ::_X])


def df_qr_hybrid(A: DF, *, loop: bool | None = None):
    """(Q, R) of a df batch (..., n, n): XLA external CGS2 + Pallas
    panels.

    Drop-in for ops/df_qr.df_qr on TPU — identical algorithm, the
    sequential in-panel loop fused into one Pallas program per panel.
    Requirements for the kernel path: n a multiple of the 32-column
    panel (callers pad with exact identity blocks, see
    ops/qr_kernel.cgs2_qr) and n <= 512 (the exact-f32 class-sum bound
    for the digit-plane dots); everything else falls back to the XLA
    path.

    ``loop=True`` selects the rolled variant (`_df_qr_hybrid_loop`): one
    ``lax.fori_loop`` body shared by all n/32 panels, with fixed-shape
    zero-padded projections — arithmetic identical (exactly-zero rows
    contribute exact zeros through the digit-plane matmul, see
    ops/df32._digit_planes' zero guard) but the traced graph and the
    Mosaic/XLA compile shrink ~(n/32)x, attacking the df32 engine's
    cold-compile cost.  Default: rolled, ON; DQMC_DF_QR_LOOP=0 restores
    the unrolled path.  On-chip validation: bit-identical on the df32
    ENGINE graph with 2.3x faster cold compile and +6.6% throughput
    (tools/df_compile_probe.py, BENCHMARKS campaign 2-3), and
    bit-identical self-check on the df32 MEASURED tier graph with
    288 s vs 653 s chunk compile and +5.5% throughput
    (artifacts/r3c5: measured_df32_rolled vs measured_df32_reverted —
    the isolation A/B that exonerated this kernel from the campaign-4
    tier regression, which was the stride recalibration instead).

    NOTE the env var is read at TRACE time and baked into any jitted
    graph: flipping it after a function has compiled has no effect on
    that cache entry.  Set it before the first df QR call (or pass
    ``loop=`` explicitly).
    """
    n = A.hi.shape[-1]
    if n % _BLOCK or n > 512:
        from dqmc_tpu.ops.df_qr import df_qr
        return df_qr(A)
    if loop is None:
        # Default ON (see docstring for the two on-chip bit-identical
        # A/Bs, engine graph + measured tier graph).  DQMC_DF_QR_LOOP=0
        # opts out.
        import os
        loop = os.environ.get("DQMC_DF_QR_LOOP", "1") not in (
            "0", "off", "false")
    if loop:
        return _df_qr_hybrid_loop(A)
    block = _BLOCK
    QT = _t(A)
    batch = A.hi.shape[:-2]
    rt = DF(jnp.zeros(batch + (n, n), jnp.float32),
            jnp.zeros(batch + (n, n), jnp.float32))

    for ip in range(n // block):
        p = ip * block
        for _ in range(2 if p else 0):
            P = _rows(QT, p, p + block)
            Qdone = _rows(QT, 0, p)
            C = df32.matmul(P, _t(Qdone))
            P = df32.sub(P, df32.matmul(C, Qdone))
            QT = _set_rows(QT, p, p + block, P)
            rt = DF(rt.hi.at[..., p:p + block, 0:p].add(C.hi),
                    rt.lo.at[..., p:p + block, 0:p].add(C.lo))
        Q, Rg = _panel_call(_rows(QT, p, p + block))
        QT = _set_rows(QT, p, p + block, Q)
        rt = DF(rt.hi.at[..., p:p + block, p:p + block].set(Rg.hi),
                rt.lo.at[..., p:p + block, p:p + block].set(Rg.lo))
    return _t(QT), _t(rt)


def _df_qr_hybrid_loop(A: DF):
    """Rolled df_qr_hybrid: one shared panel body, fixed shapes.

    Differences from the unrolled path, each arithmetic-neutral:

    - projections run against the FULL row buffer with unfinished rows
      zero-masked instead of a growing (p, n) slice — extra terms are
      exact zeros (digit planes of a zero row are zero int8 planes, the
      int32 dot accumulates them exactly), so C and the update match the
      variable-shape matmul bit for bit;
    - panel 0 runs the same two projection passes against an all-zero
      buffer (C = 0 exactly; df32.sub(P, 0) renormalizes (hi, lo) of the
      already-normalized input, a value-identical no-op) instead of
      skipping them;
    - the R row block is assembled per panel (coefficients + diagonal
      block overlaid at the dynamic column offset) and written with one
      dynamic_update_slice per word.

    Cost: the projection matmuls are (32, n) x (n, n) regardless of
    panel index — ~2x the unrolled path's average projection FLOPs —
    in exchange for a traced graph (and compile) ~(n/32)x smaller.
    """
    block = _BLOCK
    n = A.hi.shape[-1]
    batch = A.hi.shape[:-2]
    row_ax = A.hi.ndim - 2
    col_ax = A.hi.ndim - 1
    QT = _t(A)
    zeros = jnp.zeros(batch + (n, n), jnp.float32)
    # (n, 1) row-index column, broadcast over batch and lanes
    ridx = jnp.arange(n, dtype=jnp.int32)[:, None]

    def body(ip, carry):
        QTh, QTl, rth, rtl = carry
        p = ip * block
        P = DF(jax.lax.dynamic_slice_in_dim(QTh, p, block, axis=row_ax),
               jax.lax.dynamic_slice_in_dim(QTl, p, block, axis=row_ax))
        done = ridx < p
        Qd = DF(jnp.where(done, QTh, 0), jnp.where(done, QTl, 0))
        C_tot = DF(jnp.zeros(batch + (block, n), jnp.float32),
                   jnp.zeros(batch + (block, n), jnp.float32))
        for _ in range(2):
            C = df32.matmul(P, _t(Qd))
            P = df32.sub(P, df32.matmul(C, Qd))
            # component-wise accumulation, matching the unrolled path's
            # .add on each word
            C_tot = DF(C_tot.hi + C.hi, C_tot.lo + C.lo)
        Q, Rg = _panel_call(P)
        QTh = jax.lax.dynamic_update_slice_in_dim(QTh, Q.hi, p, axis=row_ax)
        QTl = jax.lax.dynamic_update_slice_in_dim(QTl, Q.lo, p, axis=row_ax)
        # C_tot columns >= p are exact zeros; overlaying Rg at column p
        # reproduces the unrolled path's block .set
        rowh = jax.lax.dynamic_update_slice_in_dim(C_tot.hi, Rg.hi, p,
                                                   axis=col_ax)
        rowl = jax.lax.dynamic_update_slice_in_dim(C_tot.lo, Rg.lo, p,
                                                   axis=col_ax)
        rth = jax.lax.dynamic_update_slice_in_dim(rth, rowh, p, axis=row_ax)
        rtl = jax.lax.dynamic_update_slice_in_dim(rtl, rowl, p, axis=row_ax)
        return QTh, QTl, rth, rtl

    carry = (QT.hi, QT.lo, zeros, zeros)
    if jax.default_backend() == "cpu":
        # eager CPU (the test harness): a Python loop keeps the df
        # arithmetic out of compiled XLA:CPU units (the LLVM
        # reassociation bug, ops/df_linalg.py docstring); lax.fori_loop
        # would compile its body even outside jit
        for ip in range(n // block):
            carry = body(jnp.int32(ip), carry)
    else:
        carry = jax.lax.fori_loop(0, n // block, body, carry)
    QTh, QTl, rth, rtl = carry
    return _t(DF(QTh, QTl)), _t(DF(rth, rtl))
