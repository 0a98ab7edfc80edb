"""Pallas TPU kernel for the tf32 CGS2 panel loop.

The tf32 (triple-float32) twin of ops/df_qr_kernel.py — read that
module's docstring for the design; this one states only the deltas.

Round-4 motivation: the tf32 measurement tier's cost is ~entirely the
sequential in-panel column loop of the pure-XLA multiword QR
(ops/df_qr.py with nm=tf32) — batching every OTHER phase of the
tau-resolved tier (triplets, propagation, the equal-time chain) moved
throughput by ~0% (BENCHMARKS round-4, artifacts/r4).  The df32 twin of
this kernel bought 2.14x on the df engine's folds; this module applies
the identical structure at the triple-word tier:

- 10 signed 7-bit digit planes (70 plane bits >= tf32's ~69-bit
  significand) instead of df32's 7, held as bf16 integers <= 64;
- 16 plane rows allotted per column (10 planes + 6 zero pad) so bf16
  VMEM stores stay 8-row aligned — the lane-expanded R/coefficient
  layout uses stride X = 16;
- all in-kernel scalar algebra (plane extraction residuals, projection
  subtraction, norm/normalize) runs in tf32 EFT chains (ops/tf32),
  elementwise f32 — Mosaic-lowerable;
- exactness bound: digit products <= 2^12, k <= 256 lane-contractions
  give partial sums <= 2^20, and <= 10 same-class additions keep every
  f32 accumulation an exact integer < 2^24.

Numerical contract: same algorithm as ops/df_qr.df_qr(nm=tf32) — two
projection passes per column against finished in-panel q's — hence the
same tf-tier columnwise backward error on graded DQMC folds; pinned
against the XLA path in tests/test_tf_qr_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dqmc_tpu.ops import tf32
from dqmc_tpu.ops.df_qr_kernel import _pow2_scales
from dqmc_tpu.ops.tf32 import TF

_BLOCK = 32
_NP = 10           # digit planes: 10 x 7 bits = 70 >= tf32 significand
_PBITS = 7
_X = 16            # plane rows allotted per column (10 + 6 pad, aligned)

import sys as _sys

if _sys.getrecursionlimit() < 10000:
    _sys.setrecursionlimit(10000)


def _t(x: TF) -> TF:
    return TF(*(jnp.swapaxes(c, -1, -2) for c in x))


def _rows(x: TF, a, b) -> TF:
    return TF(*(c[..., a:b, :] for c in x))


def _set_rows(x: TF, a, b, v: TF) -> TF:
    return TF(*(c.at[..., a:b, :].set(u) for c, u in zip(x, v)))


# ----------------------------------------------------------------------
# in-kernel tf helpers
# ----------------------------------------------------------------------

def _extract_planes(v: TF, axis: int = -1):
    """(planes [NP f32 digit arrays], s): v = s*(sum_i p_i 2^{-7(i+1)} + r).

    Digits p_i in [-64, 64]; residual tracked in tf32 so all 70 plane
    bits are genuine (ops/tf32._digit_planes semantics)."""
    mag = jnp.max(jnp.abs(v.hi), axis=axis, keepdims=True)
    s, inv_s = _pow2_scales(mag)
    r = TF(v.hi * inv_s, v.mi * inv_s, v.lo * inv_s)  # exact pow2 mul
    planes = []
    for i in range(_NP):
        w = np.float32(2.0 ** (_PBITS * (i + 1)))
        inv_w = np.float32(2.0 ** (-_PBITS * (i + 1)))
        q = jnp.floor(r.hi * w + 0.5)
        planes.append(q)
        z = jnp.zeros_like(q)
        r = tf32.sub(r, TF(q * inv_w, z, z))
    return planes, s


def _stack16_bf16(planes):
    """NP digit arrays (.., 1, n) -> (.., 16, n) bf16, zero-padded."""
    rows = [p.astype(jnp.bfloat16) for p in planes]
    z = jnp.zeros_like(rows[0])
    rows.extend([z] * (_X - _NP))
    return jnp.concatenate(rows, axis=-2)


def _wsum_tf(terms, w0_exp):
    """tf sum of exact-f32 terms[k] weighted 2^{w0_exp - 7k}, high first."""
    acc = None
    for k, t in enumerate(terms):
        w = np.float32(2.0 ** (w0_exp - _PBITS * k))
        z = jnp.zeros_like(t)
        ttf = TF(t * w, z, z)
        acc = ttf if acc is None else tf32.add(acc, ttf)
    return acc


# ----------------------------------------------------------------------
# the panel kernel
# ----------------------------------------------------------------------

def _panel_kernel(block, n, ph_ref, pm_ref, pl_ref,
                  qh_ref, qm_ref, ql_ref, rh_ref, rm_ref, rl_ref,
                  pq_ref, sq_ref):
    """Two-pass CGS over one 32-column panel, all-tf, in VMEM.

    Layout identical to the df kernel with X = 16: pq (WB, X*block, n)
    bf16 holds q_t's 10 digit planes at rows X*t..X*t+9; R rows are
    lane-expanded (coefficient of column u at lane X*u)."""
    WB = ph_ref.shape[0]
    f32 = jnp.float32
    nx = _X * block
    qh_ref[...] = jnp.zeros_like(qh_ref)
    qm_ref[...] = jnp.zeros_like(qm_ref)
    ql_ref[...] = jnp.zeros_like(ql_ref)
    rh_ref[...] = jnp.zeros_like(rh_ref)
    rm_ref[...] = jnp.zeros_like(rm_ref)
    rl_ref[...] = jnp.zeros_like(rl_ref)
    pq_ref[...] = jnp.zeros_like(pq_ref)
    sq_ref[...] = jnp.ones_like(sq_ref)

    lane_x = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx), 2)
    _Xc = jnp.int32(_X)
    m0 = (lane_x % _Xc == 0).astype(f32)          # lanes X*t

    def dot_n(x, y):
        return jax.lax.dot_general(
            x, y, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT)

    def dot_r(x, y):
        return jax.lax.dot_general(
            x, y, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT)

    def col_step(t, _):
        y = TF(ph_ref[:, pl.ds(t, 1), :], pm_ref[:, pl.ds(t, 1), :],
               pl_ref[:, pl.ds(t, 1), :])
        zx = jnp.zeros((WB, 1, nx), f32)
        row_acc = TF(zx, zx, zx)
        sq_exp = sq_ref[...].reshape(WB, 1, nx)

        for _pass in range(2):
            planes_y, s_y = _extract_planes(y)       # (WB, 1, n) each
            ystack = _stack16_bf16(planes_y)         # (WB, 16, n)
            qplanes = pq_ref[...]                    # (WB, nx, n) bf16
            D = dot_n(ystack, qplanes)               # (WB, 16, nx) exact
            E = _wsum_tf([D[:, i:i + 1, :] for i in range(_NP)],
                         -_PBITS)
            c_full = None
            for j in range(_NP):
                w = np.float32(2.0 ** (-_PBITS * (j + 1)))
                if j == 0:
                    term = TF(*(c * w for c in E))
                else:
                    term = TF(*(jnp.roll(c, -j, axis=2) * w for c in E))
                c_full = term if c_full is None else tf32.add(c_full, term)
            sy_sq = s_y * sq_exp
            row_acc = tf32.add(row_acc,
                               TF(*(c * sy_sq for c in c_full)))
            sq2_m = sq_exp * sq_exp * m0
            e = TF(*(c * sq2_m for c in c_full))
            for shift in (1, 2, 4, 8):
                e = TF(*(c + jnp.roll(c, shift, axis=2) for c in e))
            planes_e, s_e = _extract_planes(e)       # (WB, 1, nx) each
            estack = _stack16_bf16(planes_e)         # (WB, 16, nx)
            cls = [None] * (2 * _NP - 1)
            for j in range(_NP):
                mj = (lane_x % _Xc == jnp.int32(j))
                lhs = jnp.where(mj, estack, jnp.bfloat16(0))
                Dj = dot_r(lhs, qplanes)             # (WB, 16, n) exact
                for i in range(_NP - j):
                    p = Dj[:, i:i + 1, :]
                    w = i + j
                    cls[w] = p if cls[w] is None else cls[w] + p
            delta = _wsum_tf(cls[:_NP], -2 * _PBITS)
            se_sy = s_e * s_y
            y = tf32.sub(y, TF(*(c * se_sy for c in delta)))

        planes_y, s_y = _extract_planes(y)
        ystack = _stack16_bf16(planes_y)
        Dn = dot_n(ystack, ystack)                   # (WB, 16, 16)
        cls_n = [None] * _NP
        for i in range(_NP):
            for j in range(_NP - i):
                p = Dn[:, i:i + 1, j:j + 1]
                w = i + j
                cls_n[w] = p if cls_n[w] is None else cls_n[w] + p
        nrm2_hat = _wsum_tf(cls_n, -2 * _PBITS)      # (WB, 1, 1) tf
        sy2 = s_y * s_y
        nrm = tf32.sqrt(TF(*( (c * sy2).reshape(WB, 1)
                             for c in nrm2_hat)))
        zero = nrm.hi == 0
        ones = jnp.ones_like(nrm.hi)
        zs = jnp.zeros_like(nrm.hi)
        safe = tf32.where(zero, TF(ones, zs, zs), nrm)
        inv = tf32.div(TF(ones, zs, zs), safe)
        q = tf32.mul(y, TF(*(c[:, :, None] for c in inv)))
        q = tf32.where(jnp.broadcast_to(zero[:, :, None], q.hi.shape),
                       TF(*(jnp.zeros_like(c) for c in q)), q)

        qh_ref[:, pl.ds(t, 1), :] = q.hi
        qm_ref[:, pl.ds(t, 1), :] = q.mi
        ql_ref[:, pl.ds(t, 1), :] = q.lo
        planes_q, s_q = _extract_planes(q)
        pq_ref[:, pl.ds(t * _X, _X), :] = _stack16_bf16(planes_q)
        grp = (lane_x // _Xc == t).reshape(1, nx)
        sq_all = sq_ref[...]
        sq_ref[...] = jnp.where(grp, s_q.reshape(WB, 1), sq_all)
        diag = (lane_x == t * _X)
        rrow = tf32.where(
            jnp.broadcast_to(diag, row_acc.hi.shape),
            TF(*(jnp.broadcast_to(c[:, :, None], row_acc.hi.shape)
                 for c in nrm)),
            row_acc)
        rh_ref[:, pl.ds(t, 1), :] = rrow.hi
        rm_ref[:, pl.ds(t, 1), :] = rrow.mi
        rl_ref[:, pl.ds(t, 1), :] = rrow.lo
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(block), col_step,
                      jnp.int32(0))


def _panel_cgs2_impl(Ph, Pm, Pl, interpret: bool = False):
    """tf two-pass CGS of one panel: (B, block, n) x3 -> 6 arrays
    (qh, qm, ql, rh_expanded, rm_expanded, rl_expanded)."""
    B, block, n = Ph.shape
    f32 = jnp.float32
    kern = functools.partial(_panel_kernel, block, n)
    out = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((B, block, n), f32),
                   jax.ShapeDtypeStruct((B, block, n), f32),
                   jax.ShapeDtypeStruct((B, block, n), f32),
                   jax.ShapeDtypeStruct((B, block, _X * block), f32),
                   jax.ShapeDtypeStruct((B, block, _X * block), f32),
                   jax.ShapeDtypeStruct((B, block, _X * block), f32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(6)),
        scratch_shapes=[
            pltpu.VMEM((B, _X * block, n), jnp.bfloat16),
            pltpu.VMEM((B, _X * block), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2**20),
        interpret=interpret,
    )(Ph, Pm, Pl)
    return out


@jax.custom_batching.custom_vmap
def _panel_flat(Ph, Pm, Pl):
    interpret = jax.default_backend() == "cpu"
    return _panel_cgs2_impl(Ph, Pm, Pl, interpret=interpret)


@_panel_flat.def_vmap
def _panel_flat_vmap(axis_size, in_batched, Ph, Pm, Pl):
    B2, B, block, n = axis_size, Ph.shape[1], Ph.shape[2], Ph.shape[3]
    out = _panel_flat(Ph.reshape(B2 * B, block, n),
                      Pm.reshape(B2 * B, block, n),
                      Pl.reshape(B2 * B, block, n))
    return (tuple(x.reshape((B2, B) + x.shape[1:]) for x in out),
            (True,) * 6)


@jax.custom_batching.custom_vmap
def _panel_single(Ph, Pm, Pl):
    """(block, n) unbatched panel — the shape vmapped traces see."""
    interpret = jax.default_backend() == "cpu"
    out = _panel_cgs2_impl(Ph[None], Pm[None], Pl[None],
                           interpret=interpret)
    return tuple(x[0] for x in out)


@_panel_single.def_vmap
def _panel_single_vmap(axis_size, in_batched, Ph, Pm, Pl):
    return _panel_flat(Ph, Pm, Pl), (True,) * 6


def _panel_call(P: TF):
    """(Q tf, Rg tf) of one externally-orthogonalized panel (.., block, n);
    compacts the kernel's lane-expanded R rows."""
    if P.hi.ndim == 2:
        out = _panel_single(P.hi, P.mi, P.lo)
    else:
        lead = P.hi.shape[:-2]
        block, n = P.hi.shape[-2:]
        out = tuple(
            x.reshape(lead + x.shape[1:]) for x in _panel_flat(
                P.hi.reshape((-1, block, n)),
                P.mi.reshape((-1, block, n)),
                P.lo.reshape((-1, block, n))))
    qh, qm, ql, rhx, rmx, rlx = out
    return (TF(qh, qm, ql),
            TF(rhx[..., ::_X], rmx[..., ::_X], rlx[..., ::_X]))


def tf_qr_hybrid(A: TF):
    """(Q, R) of a tf batch (..., n, n): XLA external CGS2 + Pallas
    panels — drop-in for ops/df_qr.df_qr(nm=tf32) on TPU.

    Requirements: n a multiple of the 32-column panel and n <= 512 (the
    exact-f32 class-sum bound); everything else falls back to the XLA
    path.
    """
    n = A.hi.shape[-1]
    if n % _BLOCK or n > 512:
        from dqmc_tpu.ops.df_qr import df_qr
        return df_qr(A, nm=tf32)
    block = _BLOCK
    QT = _t(A)
    batch = A.hi.shape[:-2]
    z = jnp.zeros(batch + (n, n), jnp.float32)
    rt = TF(z, z, z)

    for ip in range(n // block):
        p = ip * block
        for _ in range(2 if p else 0):
            P = _rows(QT, p, p + block)
            Qdone = _rows(QT, 0, p)
            C = tf32.matmul(P, _t(Qdone))
            P = tf32.sub(P, tf32.matmul(C, Qdone))
            QT = _set_rows(QT, p, p + block, P)
            rt = TF(*(r.at[..., p:p + block, 0:p].add(c)
                      for r, c in zip(rt, C)))

        P = _rows(QT, p, p + block)
        Qp, Rg = _panel_call(P)
        QT = _set_rows(QT, p, p + block, Qp)
        rt = TF(*(r.at[..., p:p + block, p:p + block].set(g)
                  for r, g in zip(rt, Rg)))
    return _t(QT), _t(rt)
