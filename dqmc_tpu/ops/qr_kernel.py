"""Pallas TPU kernel: batched blocked CGS2 QR factorization.

Why this exists: XLA:TPU's Householder QR (geqrf + orgqr custom calls) and
LU (getrf) are sequential-panel routines costing ~1.5-2.4 ms each at
(16, 256, 256) f32, and the DQMC stabilization does one QR + one LU-solve
per block — ~60% of the whole sweep.  Gram-based alternatives (CholeskyQR)
die on these inputs (fold matrices reach cond ~1e6-1e7 even after column
equilibration; the gram squares that past 1/eps_f32 — see ops/linalg.py).
Classical Gram-Schmidt with reorthogonalization (CGS2) is columnwise
stable like Householder ("twice is enough": full orthogonality for
cond < ~1/eps), validated on the real chain in tests/test_qr_kernel.py
— and it is built from dot products, so one VMEM-resident program
factorizes the whole batch with MXU matmuls for the panel-external work
and short VPU steps inside a 32-column panel.

Layout: everything runs on A^T (rows = columns of A), so per-column access
is sublane-dynamic (fast) and every reduction is along lanes.  R is
produced transposed (RT[j, i] = R[i, j]) for the same reason; the wrapper
transposes in XLA where it fuses into consumers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 32


def _cgs2_kernel(n_panels, block, at_in_ref, qt_ref, rt_ref):
    """In-place CGS2 on transposed matrices.

    at_in (B, n, n): rows are the columns of A (aliased with qt output).
    qt (B, n, n): rows are the columns of Q.
    rt (B, n, n): RT[b, j, i] = R[i, j].
    """
    B, n, _ = qt_ref.shape
    dtype = qt_ref.dtype
    qt_ref[...] = at_in_ref[...]
    rt_ref[...] = jnp.zeros_like(rt_ref)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)

    def dot_bn(X, Y):
        # (B, a, n) x (B, c, n) -> (B, a, c), contracting lanes
        return jax.lax.dot_general(
            X, Y, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST)

    def mat_bn(C, Y):
        # (B, a, c) x (B, c, n) -> (B, a, n)
        return jax.lax.dot_general(
            C, Y, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST)

    for ip in range(n_panels):
        p = ip * block
        # --- external orthogonalization against Q[0:p], twice (CGS2) ---
        for _ in range(2 if p else 0):
            P = qt_ref[:, p:p + block, :]
            Qdone = qt_ref[:, 0:p, :]
            C = dot_bn(P, Qdone)                      # (B, block, p)
            qt_ref[:, p:p + block, :] = P - mat_bn(C, Qdone)
            rt_ref[:, p:p + block, 0:p] += C
        # --- in-panel CGS2, sequential over the block's columns ---

        def col(j, _):
            P = qt_ref[:, p:p + block, :]             # (B, block, n)
            y = qt_ref[:, pl.ds(p + j, 1), :]         # (B, 1, n)
            mask = (row_ids < j).astype(dtype)        # (1, block)
            onehot_j = (row_ids == j).astype(dtype)

            def widen(c):
                # place the block's coefficients at lanes [p, p+block);
                # Mosaic requires dynamic-sublane RMWs to start at lane 0,
                # so accumulate a full (1, n) row (p is a Python constant)
                return jnp.pad(c, ((0, 0), (p, n - p - block)))[:, None, :]

            c1 = dot_bn(y, P).reshape(B, block) * mask
            y = y - mat_bn(c1[:, None, :], P)
            c2 = dot_bn(y, P).reshape(B, block) * mask
            y = y - mat_bn(c2[:, None, :], P)
            nrm = jnp.sqrt(jnp.sum(y * y, axis=2))            # (B, 1)
            # panel lanes of this RT row are zero before this single
            # accumulate, so summing c1+c2 in registers is bit-identical
            # to two separate read-modify-writes
            rt_ref[:, pl.ds(p + j, 1), :] += widen(c1 + c2 + nrm * onehot_j)
            safe = jnp.where(nrm == 0, jnp.ones_like(nrm), nrm)
            qt_ref[:, pl.ds(p + j, 1), :] = y / safe[:, :, None]
            return jnp.int32(0)  # i32 carry: i64 does not lower in Mosaic

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(block), col, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cgs2_qr_impl(A: jax.Array, interpret: bool = False):
    """(Q, R) for a flat batch A (B, n, n); n must be a multiple of 32."""
    B, n, _ = A.shape
    dtype = A.dtype
    kern = functools.partial(_cgs2_kernel, n // _BLOCK, _BLOCK)
    AT = jnp.swapaxes(A, -1, -2)
    # VMEM: ~4 (n, n_pad)-sized buffers per matrix (QT aliasing the input,
    # RT, their pipeline double-buffers) plus panel temporaries; v5e VMEM
    # is 128 MB once the default 16 MB scoped cap is raised
    n_pad = -(-n // 128) * 128
    # measured: 4 matrices at n=1024 needed 111 MB => ~7 (n, n_pad) buffers
    # per matrix live (QT aliased with input + RT + pipeline double-buffers
    # + panel temporaries)
    per = 7 * n * n_pad * jnp.dtype(dtype).itemsize
    WB = max(1, min(B, (80 * 2**20) // per))
    while B % WB:
        WB -= 1
    grid = (B // WB,)
    # index-map zeros must be CONCRETE i32 (numpy scalars): under
    # jax_enable_x64 literal python ints trace as i64 and Mosaic cannot
    # legalize the (i32, i64, i64) index tuple; traced jnp constants are
    # rejected as captures
    import numpy as _np
    zero = _np.int32(0)
    spec = pl.BlockSpec((WB, n, n), lambda i: (i, zero, zero),
                        memory_space=pltpu.VMEM)
    QT, RT = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((B, n, n), dtype),
                   jax.ShapeDtypeStruct((B, n, n), dtype)),
        in_specs=[spec],
        out_specs=(spec, spec),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(AT)
    return jnp.swapaxes(QT, -1, -2), jnp.swapaxes(RT, -1, -2)


@jax.custom_batching.custom_vmap
def _cgs2_qr_single(A: jax.Array):
    """(Q, R) of one (n, n) matrix; vmapping flattens into one batched
    kernel call (further vmaps keep flattening)."""
    interpret = jax.default_backend() == "cpu"
    Q, R = _cgs2_qr_impl(A[None], interpret=interpret)
    return Q[0], R[0]


@jax.custom_batching.custom_vmap
def _cgs2_qr_flat(A: jax.Array):
    interpret = jax.default_backend() == "cpu"
    return _cgs2_qr_impl(A, interpret=interpret)


@_cgs2_qr_flat.def_vmap
def _cgs2_qr_flat_vmap(axis_size, in_batched, A):
    B2, B = axis_size, A.shape[1]
    n = A.shape[-1]
    Q, R = _cgs2_qr_flat(A.reshape(B2 * B, n, n))
    return (Q.reshape(B2, B, n, n), R.reshape(B2, B, n, n)), (True, True)


@_cgs2_qr_single.def_vmap
def _cgs2_qr_single_vmap(axis_size, in_batched, A):
    Q, R = _cgs2_qr_flat(A)
    return (Q, R), (True, True)


def cgs2_qr(A: jax.Array):
    """Batched (Q, R) via the Pallas CGS2 kernel for any square size.

    Sizes that are not a multiple of the 32-column panel are handled by
    EXACT block-diagonal identity padding: qr([[A,0],[0,I]]) =
    ([[Qa,0],[0,I]], [[Ra,0],[0,I]]), so the unpadded factors are read
    straight off the padded ones (the identity rows orthogonalize to
    themselves untouched — CGS projections against them are exactly zero
    for the zero off-blocks)."""
    n = A.shape[-1]
    if A.shape[-2] != n:
        return jnp.linalg.qr(A)
    pad = (-n) % _BLOCK
    if pad:
        np_ = n + pad
        eye_blk = jnp.eye(pad, dtype=A.dtype)
        Ap = jnp.zeros(A.shape[:-2] + (np_, np_), A.dtype)
        Ap = Ap.at[..., :n, :n].set(A)
        Ap = Ap.at[..., n:, n:].set(eye_blk)
        Q, R = cgs2_qr(Ap)
        return Q[..., :n, :n], R[..., :n, :n]
    if A.ndim == 2:
        return _cgs2_qr_single(A)
    lead = A.shape[:-2]
    Q, R = _cgs2_qr_flat(A.reshape((-1, n, n)))
    return Q.reshape(lead + (n, n)), R.reshape(lead + (n, n))
