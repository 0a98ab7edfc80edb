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
_GROUP = 8
_VMEM_LIMIT_QR = 100 * 2**20   # v5e has 128 MB; the 16 MB default starves


def _cgs2_kernel(n_panels, block, group, at_in_ref, qt_ref, rt_ref,
                 wt_ref=None, st_ref=None):
    """In-place CGS2 on transposed matrices.

    at_in (B, n, n): rows are the columns of A (aliased with qt output).
    qt (B, n, n): rows are the columns of Q.
    rt (B, n, n): RT[b, j, i] = R[i, j].
    wt (B, n, n), optional: W^T with W = R^{-1}, produced by blocked
    forward substitution on R^T (lower triangular): inside each panel only
    the 32x32 diagonal-block inverse S^T = (R^T_PP)^{-1} is accumulated
    (one (1, 32) x (32, 32) dot per column — the rg row's diagonal entry
    meets a still-zero S row, so no masking is needed), and at panel end
    the full rows land in two MXU matmuls,
        W^T[P, :] = S^T (E_P - R^T[P, :] W^T),
    where W^T rows >= p are still zero so the unmasked product is exactly
    the cross-panel correction.  A per-column full-width accumulation
    ((1, n) x (n, n) per column) was measured SLOWER than the external
    triangular-solve custom call it replaces; this blocked form adds ~one
    n^3-equivalent of MXU work total.
    st (B, block, block) scratch holds S^T (required when wt is given).
    """
    B, n, _ = qt_ref.shape
    dtype = qt_ref.dtype
    qt_ref[...] = at_in_ref[...]
    rt_ref[...] = jnp.zeros_like(rt_ref)
    if wt_ref is not None:
        wt_ref[...] = jnp.zeros_like(wt_ref)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
    lane_blk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, block), 2)

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
        # --- in-panel CGS2, sequential over GROUPS of columns ---
        # The in-panel chain is ~1k latency-bound small MXU matmuls per
        # factorization (4 per column); grouping batches the first
        # projection pass of `group` columns into ONE matmul pair, cutting
        # the chain to 2 + 2*group matmuls per group.  Each column still
        # receives two COMPLETE projection passes in classical order: its
        # pass-1 against in-group predecessors is finished by a batched
        # rank-1 fixup the moment each predecessor is normalized, and its
        # pass-2 rereads the panel (which already holds the finished
        # in-group q's).  The R rows are still accumulated IN-KERNEL from
        # the process coefficients — rebuilding R as triu(Q^T A) outside
        # costs 2x chain accuracy (single-pass dots lose the small-d rows
        # to cancellation; measured) — but into a (B, group, block) value
        # flushed with one aligned multi-row store per group.

        def col_group(jg, _):
            j = group * jg                            # 8-aligned: Mosaic
            P = qt_ref[:, p:p + block, :]             # needs provable
            Y = qt_ref[:, pl.ds(p + j, group), :]     # sublane alignment
            maskj = (row_ids < j).astype(dtype)[:, None, :]  # (1, 1, block)

            # batched pass 1 of the whole group against columns < j
            c1 = dot_bn(Y, P) * maskj                 # (B, group, block)
            Y = Y - mat_bn(c1, P)
            rg = c1                                   # group's R rows

            for t in range(group):
                grow = (jax.lax.broadcasted_iota(     # row t of the group
                    jnp.int32, (1, group, 1), 1) == t).astype(dtype)
                y = Y[:, t:t + 1, :]
                # pass 2 against ALL previous columns: the panel reread
                # includes the in-group q's written in earlier t-steps
                P2 = qt_ref[:, p:p + block, :]
                mask2 = (row_ids < j + t).astype(dtype)       # (1, block)
                onehot_t = (row_ids == j + t).astype(dtype)
                c2 = dot_bn(y, P2).reshape(B, block) * mask2
                y = y - mat_bn(c2[:, None, :], P2)
                nrm = jnp.sqrt(jnp.sum(y * y, axis=2))        # (B, 1)
                safe = jnp.where(nrm == 0, jnp.ones_like(nrm), nrm)
                q = y / safe[:, :, None]
                qt_ref[:, pl.ds(p + j + t, 1), :] = q
                rg = rg + (c2 + nrm * onehot_t)[:, None, :] * grow
                if wt_ref is not None:
                    # panel-local inverse row: s_t = (e_t - rg_t S^T)/r_tt.
                    # rg row t is complete in-panel as of the line above;
                    # its diagonal entry meets a still-zero S row, so the
                    # self-term contributes exactly 0.
                    contrib = mat_bn(rg[:, t:t + 1, :], st_ref[...])
                    e_t = jnp.where(lane_blk == j + t,
                                    jnp.asarray(1.0, dtype),
                                    jnp.asarray(0.0, dtype))
                    st_ref[:, pl.ds(j + t, 1), :] = \
                        (e_t - contrib) / safe[:, :, None]
                if t < group - 1:
                    # complete pass 1 of the remaining in-group columns
                    # against the fresh q (batched rank-1).  Computed for
                    # the whole group and masked to rows > t — Mosaic has
                    # no scatter, and the wasted rows are never read again
                    later = (jax.lax.broadcasted_iota(
                        jnp.int32, (1, group, 1), 1) > t).astype(dtype)
                    s = jnp.sum(Y * q, axis=2, keepdims=True) * later
                    Y = Y - s * q
                    s2 = jnp.sum(Y * q, axis=2, keepdims=True) * later
                    Y = Y - s2 * q
                    s = s + s2
                    rg = rg + s * onehot_t[None]      # pass-1 coefficients

            # place the group's R rows at lanes [p, p+block) and store with
            # one aligned multi-row accumulate (rows are zero beforehand)
            rt_ref[:, pl.ds(p + j, group), :] += jnp.pad(
                rg, ((0, 0), (0, 0), (p, n - p - block)))
            return jnp.int32(0)  # i32 carry: i64 does not lower in Mosaic

        if wt_ref is not None:
            st_ref[...] = jnp.zeros_like(st_ref)
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(block // group), col_group,
                          jnp.int32(0))
        if wt_ref is not None:
            # blocked forward substitution: the panel's W^T rows in two
            # MXU matmuls.  rt rows [p, p+block) are complete (external C
            # plus in-panel rg); wt rows >= p are still zero, so the
            # unmasked R^T[P, :] @ W^T is exactly the cross-panel term.
            eP = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (1, block, n), 2)
                == p + jax.lax.broadcasted_iota(jnp.int32, (1, block, n), 1),
                jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype))
            X = jnp.broadcast_to(eP, (B, block, n))
            if ip:
                X = X - mat_bn(rt_ref[:, p:p + block, :], wt_ref[...])
            wt_ref[:, p:p + block, :] = mat_bn(st_ref[...], X)


@functools.partial(jax.jit, static_argnames=("interpret", "with_inv"))
def _cgs2_qr_impl(A: jax.Array, interpret: bool = False,
                  with_inv: bool = False):
    """(Q, R[, Rinv]) for a flat batch A (B, n, n); n a multiple of 32."""
    B, n, _ = A.shape
    dtype = A.dtype
    kern = functools.partial(_cgs2_kernel, n // _BLOCK, _BLOCK, _GROUP)
    AT = jnp.swapaxes(A, -1, -2)
    # VMEM: ~4 (n, n_pad)-sized buffers per matrix (QT aliasing the input,
    # RT, their pipeline double-buffers) plus panel temporaries; v5e VMEM
    # is 128 MB once the default 16 MB scoped cap is raised
    n_pad = -(-n // 128) * 128
    # measured: 4 matrices at n=1024 needed 111 MB => ~7 (n, n_pad) buffers
    # per matrix live (QT aliased with input + RT + pipeline double-buffers
    # + panel temporaries)
    n_bufs = 9 if with_inv else 7      # + WT and its pipeline buffer
    per = n_bufs * n * n_pad * jnp.dtype(dtype).itemsize
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
    n_out = 3 if with_inv else 2
    out = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=tuple(jax.ShapeDtypeStruct((B, n, n), dtype)
                        for _ in range(n_out)),
        in_specs=[spec],
        out_specs=tuple(spec for _ in range(n_out)),
        scratch_shapes=([pltpu.VMEM((WB, _BLOCK, _BLOCK), dtype)]
                        if with_inv else []),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_QR),
        interpret=interpret,
    )(AT)
    return tuple(jnp.swapaxes(x, -1, -2) for x in out)


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


# ---- (Q, R, R^-1) variant: the stabilization solve without a
# triangular-solve custom call ------------------------------------------

@jax.custom_batching.custom_vmap
def _cgs2_qr_inv_flat(A: jax.Array):
    interpret = jax.default_backend() == "cpu"
    return _cgs2_qr_impl(A, interpret=interpret, with_inv=True)


@_cgs2_qr_inv_flat.def_vmap
def _cgs2_qr_inv_flat_vmap(axis_size, in_batched, A):
    B2, B = axis_size, A.shape[1]
    n = A.shape[-1]
    out = _cgs2_qr_inv_flat(A.reshape(B2 * B, n, n))
    return tuple(x.reshape(B2, B, n, n) for x in out), (True,) * 3


@jax.custom_batching.custom_vmap
def _cgs2_qr_inv_single(A: jax.Array):
    interpret = jax.default_backend() == "cpu"
    out = _cgs2_qr_impl(A[None], interpret=interpret, with_inv=True)
    return tuple(x[0] for x in out)


@_cgs2_qr_inv_single.def_vmap
def _cgs2_qr_inv_single_vmap(axis_size, in_batched, A):
    return _cgs2_qr_inv_flat(A), (True,) * 3


def cgs2_qr_inv(A: jax.Array):
    """Batched (Q, R, R^{-1}) via the Pallas CGS2 kernel.

    Same factorization as :func:`cgs2_qr` with W = R^{-1} produced
    in-kernel by blocked forward substitution (a (1, 32) x (32, 32) dot
    per column plus two MXU matmuls per 32-column panel) — so the
    stabilized M-solve becomes two plain matmuls, X = R^{-1} (Q^T Y),
    replacing XLA's TriangularSolve custom call (~0.32 ms at
    (16, 256, 256), i.e. ~80% of a whole factorization).
    Numerics: applying an explicit triangular inverse has the same
    cond(R)-scaled error envelope as substitution for these equilibrated
    M systems; pinned on the real chain in tests/test_qr_kernel.py.

    Non-multiple-of-32 sizes use the same exact identity padding as
    cgs2_qr (the padded W is block-diagonal, so the top-left block IS
    the unpadded inverse).
    """
    n = A.shape[-1]
    if A.shape[-2] != n:
        raise ValueError("cgs2_qr_inv: square matrices only")
    pad = (-n) % _BLOCK
    if pad:
        np_ = n + pad
        eye_blk = jnp.eye(pad, dtype=A.dtype)
        Ap = jnp.zeros(A.shape[:-2] + (np_, np_), A.dtype)
        Ap = Ap.at[..., :n, :n].set(A)
        Ap = Ap.at[..., n:, n:].set(eye_blk)
        Q, R, W = cgs2_qr_inv(Ap)
        return Q[..., :n, :n], R[..., :n, :n], W[..., :n, :n]
    if A.ndim == 2:
        return _cgs2_qr_inv_single(A)
    lead = A.shape[:-2]
    out = _cgs2_qr_inv_flat(A.reshape((-1, n, n)))
    return tuple(x.reshape(lead + (n, n)) for x in out)
