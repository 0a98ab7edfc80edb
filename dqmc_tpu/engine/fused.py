"""Fused propagate+update block kernel: one Pallas program per
stabilization block (the hot loop of dqmc.cpp:337-456 minus the QR).

Motivation (measured on TPU v5e, 16x16 beta=8 nt=160 n_stab=5, W=16 f32):
a sweep-pair spends ~224 ms in the stabilization QR/LU custom calls
(irreducible with XLA primitives; partial pivoting is load-bearing, see
ops/linalg.py), ~28 ms in propagation GEMM fusions, ~100 ms in per-slice
site-update kernel launches, and ~76 ms in scan/cond/slot dispatch.  This
module attacks everything except the QR/LU: the Green's function and its
transpose stay VMEM-resident across all n_stab slices of a block, the
B G B^-1 wrap and the running block product are in-kernel MXU matmuls,
the Metropolis site loop runs in place (the delayed rank-k scheme of
ops/kernels.py), and the per-slice random streams are drawn in one batched
pass before the block scan (one (n_stab, ns) sort instead of n_stab
separate ones).

Layout notes:
- G and G^T are maintained as two independent matmul chains with ZERO
  explicit transposes: a left-multiply (M @ X)^T is one dot_general
  contracting X's row axis (see left_t) — Mosaic transposes of
  (WB, ns, ns) cost more than the extra matmuls.
- The forward block product is accumulated TRANSPOSED (BbarT' = BbarT
  expK^T diag(expV)) so it is right-multiplying too; the wrapper
  transposes once per block in XLA.
- Every field-dependent Metropolis factor is precomputed outside the
  kernel (each site is visited once per slice, so its pre-update value is
  the slice-start value); all table lookups are where-selects and
  proposals are indexed by SITE, so the precompute contains no gathers
  (XLA:TPU gathers are element-at-a-time — measured ~80 ms/pair).
- n_stab is a Python constant: the slice loop is unrolled inside the
  kernel, so every stream offset is static.

The fused path requires nt % n_stab == 0 and a single stored flavor
(attractive model, det_power = 2); the engine falls back to the per-slice
scan path otherwise.

Markov-chain note: the fused sweep realizes the same family of chains as
the walker-batched kernel path (shared per-slice visit order across the
device's walkers, per-walker proposals/uniforms) but draws the slice keys
with one split per sweep instead of one per slice, so individual
trajectories differ from the unfused path by key schedule (statistically
equivalent; equivalence of the update MATH is pinned per-slice in
tests/test_fused.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dqmc_tpu import hsfield
from dqmc_tpu.engine.state import EngineConfig, WalkerState
from dqmc_tpu.engine.sweep import (
    _inv_pair_f,
    _mat_mul_ldr_f,
    draw_slice_randoms,
    identity_slot,
    slot_get,
    stack_from_slots,
)


def _fused_block_kernel(n_slices, k_delay, forward, mxu_precision, scheme,
                        nfl, *refs):
    """One stabilization block for a walker block WB.

    The field-dependent Metropolis factors are PRECOMPUTED outside: every
    site is visited exactly once per slice, so its pre-update field value —
    and hence d_eta, the gamma/boson ratio product gb, the B-matrix delta,
    and both expV candidates — are known before the kernel runs.  Only the
    G-dependent half of the decision lives in the loop; the kernel emits
    the accept MASK and the caller reconstructs the new fields.

    SMEM: order (n_slices, ns) i32 — shared per-slice visit orders.
    VMEM in: gb / delta (n_slices*ns, WB) f32 SITE-major
             (gb = gammaR * bosonR; proposals are drawn per SITE so no
             permutation is ever needed — the kernel reads row base+i,
             a sublane-dynamic access exactly as cheap as base+idx);
             us (n_slices*ns, WB) f32 visit-index-major;
             ev_old / ev_new (WB, n_slices*ns) f32, SITE-major: exp(g eta)
             of the pre-slice field and of the proposal;
             expK / expKT / invexpKT / expK2 (ns, ns): for forward these
             are (expK, expK^T used twice, invexpK^T, invexpK);
             for backward (expK, expK^T, invexpK^T, expK) — see wrap();
             g_in (WB, ns, ns).
    VMEM out: g (aliased with g_in); mask (WB, n_slices*ns) f32 accept
              mask (site-major); bbar (WB, ns, ns) — the block product
              accumulated IN TRANSPOSE for forward (the caller transposes;
              keeping the accumulator in the output ref saves VMEM),
              NORMAL form for backward; acc (1, WB).
    scratch: gt (WB, ns, ns); ut, v (WB, k_delay, ns).

    scheme selects the in-slice site-update algorithm: "delayed" (rank-k
    U/V buffers, O(WB k ns) effective-row formation per site) or
    "submatrix" (bordered Woodbury on the k x k candidate submatrix,
    O(WB k^2) per site — see ops/kernels._batched_submatrix_kernel).  The
    submatrix layout replaces the ut/v scratch with grows/gcols
    (WB, k, ns) + winv (WB, k, k) and adds a pall input
    (n_slices * ns/k, ns, k) of one-hot block column selectors.
    """
    if scheme == "submatrix":
        (order_ref, gb_ref, delta_ref, us_ref, ev_old_ref, ev_new_ref,
         expK_ref, expKT_ref, invexpKT_ref, expK2_ref, pall_ref, g_in_ref,
         g_ref, mask_ref, bbar_ref, acc_ref, sgn_ref,
         gt_ref, grows_ref, gcols_ref, winv_ref) = refs
    else:
        (order_ref, gb_ref, delta_ref, us_ref, ev_old_ref, ev_new_ref,
         expK_ref, expKT_ref, invexpKT_ref, expK2_ref, g_in_ref,
         g_ref, mask_ref, bbar_ref, acc_ref, sgn_ref,
         gt_ref, ut_ref, v_ref) = refs
    # nfl == 2: the leading "chain" axis of every G-shaped ref is the
    # flavor-major stack [up-of-all-WB ; down-of-all-WB] (2*WB chains);
    # decisions (gb/us/mask/acc/sgn) stay per WALKER (WB-wide) and couple
    # the two flavor halves through R = gb * r_up * r_dn (det_power = 1,
    # models/repulsive_hubbard.update_factors).
    WC, ns = g_ref.shape[0], g_ref.shape[-1]
    WB = WC // nfl
    dtype = g_ref.dtype
    g_ref[...] = g_in_ref[...]
    gt_ref[...] = jnp.swapaxes(g_in_ref[...], -1, -2)
    mask_ref[...] = jnp.zeros_like(mask_ref)
    sgn_ref[...] = jnp.ones_like(sgn_ref)
    eyeT = jax.lax.broadcasted_iota(jnp.int32, (ns, ns), 0) == \
        jax.lax.broadcasted_iota(jnp.int32, (ns, ns), 1)
    bbar_ref[...] = jnp.broadcast_to(
        jnp.where(eyeT, jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype)),
        (WC, ns, ns))

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, ns), 1)

    three_pass = mxu_precision == "bf16x3" and dtype == jnp.float32

    def _split(X):
        # hi/lo bf16 decomposition: X = hi + lo to ~16-bit mantissa
        h = X.astype(jnp.bfloat16)
        return h, (X - h.astype(dtype)).astype(jnp.bfloat16)

    def _dot(X, M, dims):
        if not three_pass:
            return jax.lax.dot_general(X, M, dims,
                                       preferred_element_type=dtype,
                                       precision=mxu_precision)
        # manual bf16x3 (Mosaic lowers only DEFAULT/HIGHEST; HIGHEST is 6
        # bf16 passes on v5e).  Three passes with f32 accumulation give
        # ~1e-5 relative error — three orders below the f32 chain's own
        # stabilization floor (NOTES.md) at half the MXU work.
        Xh, Xl = _split(X)
        Mh, Ml = _split(M)
        # precision must be DEFAULT: a global "highest" default would ask
        # Mosaic for fp32 contraction of bf16 operands ("Bad lhs type")
        d = lambda a, b: jax.lax.dot_general(
            a, b, dims, preferred_element_type=dtype,
            precision=jax.lax.Precision.DEFAULT)
        return d(Xh, Mh) + (d(Xh, Ml) + d(Xl, Mh))

    def right(X, M_ref):
        # X (WB, ns, ns) @ M (ns, ns) on the MXU, normal layout
        return _dot(X, M_ref[...], (((2,), (0,)), ((), ())))

    def left_t(X, MT_ref):
        # (M @ X)^T for per-batch X with M given TRANSPOSED — one
        # dot_general contracting X's ROW axis; no explicit transpose:
        # out[w, k, b] = sum_j X[w, j, k] M[b, j] = (M X)[b, k]^T
        return _dot(X, MT_ref[...], (((1,), (0,)), ((), ())))

    def expv_pre(l):
        return ev_old_ref[:, l * ns:(l + 1) * ns]         # (WB, ns) static

    def expv_post(l):
        b = l * ns
        m = mask_ref[:, b:b + ns]                         # (WB, ns)
        if nfl == 2:
            m = jnp.concatenate([m, m], axis=0)           # per-walker accept
        return jnp.where(m > 0.5, ev_new_ref[:, b:b + ns],
                         ev_old_ref[:, b:b + ns])

    # Similarity wraps maintain G and G^T as two INDEPENDENT matmul chains
    # (4 MXU matmuls/slice, zero transposes — Mosaic transposes of
    # (WB, ns, ns) cost more than the extra matmuls):
    #   normal:    G'   = (M2^T (G^T) M1^T)^T   via left_t(right(GT,.),.)
    #   transpose: G'^T = (M1 (G) M2)^T          via left_t(right(G,.),.)

    def canon_ev(ev):
        # The wraps' row scaling needs the trailing-unit broadcast
        # (WC, ns) -> (WC, ns, 1), which Mosaic cannot lower from a
        # LANE-OFFSET layout when ns is not sublane-aligned: the per-slice
        # ev slices start at lane l*ns mod 128, and at ns=36 (the
        # reference's canonical 6x6 lattice) the full measured program
        # assigns vpad offsets that die with "Unsupported reshape
        # (W,36)->(W,36,1)".  A VMEM roundtrip through offset-0 scratch
        # canonicalizes the layout; exact (a copy), and skipped entirely
        # for the 8-aligned shapes every benched config uses.
        if ns % 8 == 0:
            return ev
        scr = ut_ref if scheme != "submatrix" else gcols_ref
        scr[:, 0, :] = ev
        return scr[:, 0, :]

    def wrap_forward(ev):
        # G' = diag(ev) (expK G invexpK) diag(1/ev)
        core_t = left_t(right(g_ref[...], expK2_ref), expKT_ref)
        # M = invexpK^T => pass MT = invexpK (expK2_ref holds it forward)
        core = left_t(right(gt_ref[...], expKT_ref), expK2_ref)
        gt_ref[...] = core_t * ev[:, None, :] / ev[:, :, None]
        g_ref[...] = core * ev[:, :, None] / ev[:, None, :]

    def wrap_backward(ev):
        # G' = invexpK (diag(1/ev) G diag(ev)) expK
        S = g_ref[...] / ev[:, :, None] * ev[:, None, :]
        ST = gt_ref[...] / ev[:, None, :] * ev[:, :, None]
        gt_ref[...] = left_t(right(S, expK_ref), invexpKT_ref)
        g_ref[...] = left_t(right(ST, invexpKT_ref), expK_ref)

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
            delta = delta_ref[pl.ds(base + i, 1), :].reshape(WC, 1)
            u = us_ref[pl.ds(base + idx, 1), :].reshape(WB, 1)

            row_g = g_ref[:, pl.ds(i, 1), :].reshape(WC, ns)
            col_g = gt_ref[:, pl.ds(i, 1), :].reshape(WC, ns)
            ut_all = ut_ref[...]
            v_all = v_ref[...]
            ucoef = jnp.sum(ut_all * onehot[None], axis=2)
            vcoef = jnp.sum(v_all * onehot[None], axis=2)
            row_eff = row_g + jnp.sum(ucoef[:, :, None] * v_all, axis=1)
            col_eff = col_g + jnp.sum(vcoef[:, :, None] * ut_all, axis=1)
            G_ii = jnp.sum(row_eff * onehot, axis=1, keepdims=True)

            r_flv = 1.0 + (1.0 - G_ii) * delta
            if nfl == 1:
                R = gb * r_flv * r_flv
                # u < min(1, |R|) reduced to u < R: R >= 0 bitwise for
                # this kernel's models (gb > 0: product of a positive
                # gamma ratio and an exp; r^2 >= 0) and uniform u < 1
                # strictly — exact decision equivalence, two fewer VPU
                # ops on the critical path
                accept_w = u < R
                accept = accept_w
            else:
                # det_power = 1: R = gb * r_up * r_dn can be NEGATIVE —
                # Metropolis on |R|, accepted sign flips tracked per
                # walker (engine.sweep.local_update_core semantics)
                R = gb * r_flv[:WB] * r_flv[WB:]
                accept_w = u < jnp.abs(R)
                sgn_ref[...] *= jnp.where(accept_w & (R < 0.0),
                                          jnp.asarray(-1.0, dtype),
                                          jnp.asarray(1.0, dtype))[:, 0][None]
                accept = jnp.concatenate([accept_w, accept_w], axis=0)
            prefac = jnp.where(accept, delta / r_flv, jnp.zeros_like(delta))
            accf = accept_w.astype(dtype)

            ut_ref[:, pl.ds(slot, 1), :] = (prefac * col_eff)[:, None, :]
            v_ref[:, pl.ds(slot, 1), :] = (row_eff - onehot)[:, None, :]
            mask_ref[:, base:base + ns] += accf * onehot

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
        # acceptance tally read back from the mask (2 ops per slice instead
        # of 1 per site on the sequential critical path)
        acc_ref[...] += jnp.sum(mask_ref[:, base:base + ns],
                                axis=1)[None, :]

    def site_loop_sub(l):
        # submatrix scheme: decisions on the k x k candidate submatrix via
        # a bordered Woodbury inverse; O(WB k^2) sequential work per site
        # (ops/kernels._batched_submatrix_kernel has the algebra notes)
        base = l * ns
        nb = ns // k_delay
        hp = jax.lax.Precision.HIGHEST   # decision math is always exact-f32
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (1, k_delay), 1)
        sub_kk = jax.lax.broadcasted_iota(jnp.int32, (k_delay, k_delay), 0)
        lane_kk = jax.lax.broadcasted_iota(jnp.int32, (k_delay, k_delay), 1)

        def gather(bt, _):
            t = jax.lax.rem(bt, jnp.int32(k_delay))
            i = order_ref[l, bt]
            grows_ref[:, pl.ds(t, 1), :] = g_ref[:, pl.ds(i, 1), :]
            gcols_ref[:, pl.ds(t, 1), :] = gt_ref[:, pl.ds(i, 1), :]
            return jnp.int32(0)

        def block(b, _):
            kbase = b * k_delay
            jax.lax.fori_loop(kbase, kbase + jnp.int32(k_delay), gather,
                              jnp.int32(0))
            P_b = pall_ref[pl.ds(l * nb + b, 1), :, :].reshape(ns, k_delay)
            dn = (((2,), (0,)), ((), ()))
            GII = jax.lax.dot_general(grows_ref[...], P_b, dn,
                                      preferred_element_type=dtype,
                                      precision=hp)
            GIIT = jax.lax.dot_general(gcols_ref[...], P_b, dn,
                                       preferred_element_type=dtype,
                                       precision=hp)
            winv_ref[...] = jnp.zeros_like(winv_ref)

            def site(t, mask):
                i = order_ref[l, kbase + t]
                onehot = jnp.where(lane_ids == i, jnp.asarray(1.0, dtype),
                                   jnp.asarray(0.0, dtype))
                gb = gb_ref[pl.ds(base + i, 1), :].reshape(WB, 1)
                delta = delta_ref[pl.ds(base + i, 1), :].reshape(WB, 1)
                u = us_ref[pl.ds(base + kbase + t, 1), :].reshape(WB, 1)

                # row t of GII/GIIT via masked reduction — Mosaic has no
                # dynamic_slice on VMEM values (only pl.ds on refs)
                row_t = jnp.where(sub_kk == t, jnp.asarray(1.0, dtype),
                                  jnp.asarray(0.0, dtype))
                GII_t = jnp.sum(GII * row_t[None], axis=1)   # (WB, k)
                GIIT_t = jnp.sum(GIIT * row_t[None], axis=1)
                brow = -GII_t * mask                     # (WB, k) = -G[t,P]
                crow = -GIIT_t * mask                    # (WB, k) = -G[P,t]
                Wv = winv_ref[...]
                Wc = jnp.sum(Wv * crow[:, None, :], axis=2)
                bW = jnp.sum(Wv * brow[:, :, None], axis=1)
                bWc = jnp.sum(brow * Wc, axis=1, keepdims=True)
                onehot_t = jnp.where(lane_k == t, jnp.asarray(1.0, dtype),
                                     jnp.asarray(0.0, dtype))
                G_tt = jnp.sum(GII_t * onehot_t, axis=1, keepdims=True)
                r_flv = 1.0 + delta * (1.0 - G_tt) - delta * bWc
                R = gb * r_flv * r_flv
                accept = u < R                           # R >= 0 (see above)
                accf = accept.astype(dtype)
                inv_s = jnp.where(accept, delta / r_flv,
                                  jnp.zeros_like(delta))
                Wv = Wv + inv_s[:, :, None] * Wc[:, :, None] * bW[:, None, :]
                Wv = jnp.where((sub_kk == t)[None], (-inv_s * bW)[:, None, :]
                               * jnp.ones((1, k_delay, 1), dtype), Wv)
                Wv = jnp.where((lane_kk == t)[None], (-inv_s * Wc)[:, :, None]
                               * jnp.ones((1, 1, k_delay), dtype), Wv)
                Wv = jnp.where(((sub_kk == t) & (lane_kk == t))[None],
                               inv_s[:, :, None]
                               * jnp.ones((1, k_delay, k_delay), dtype), Wv)
                winv_ref[...] = Wv
                mask = jnp.where((lane_k == t) & accept,
                                 jnp.asarray(1.0, dtype), mask)
                mask_ref[:, base:base + ns] += accf * onehot
                return mask

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(k_delay), site,
                              jnp.zeros((WB, k_delay), dtype))
            # composite flush: G += G[:,I] W (G[I,:] - I[I,:])
            V = grows_ref[...] - jnp.swapaxes(P_b, 0, 1)[None]
            dn_kk = (((2,), (1,)), ((0,), (0,)))
            M = _dot(winv_ref[...], V, dn_kk)            # (WB, k, ns)
            dn_t = (((1,), (1,)), ((0,), (0,)))
            g_ref[...] += _dot(gcols_ref[...], M, dn_t)
            gt_ref[...] += _dot(M, gcols_ref[...], dn_t)
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), block, jnp.int32(0))
        acc_ref[...] += jnp.sum(mask_ref[:, base:base + ns],
                                axis=1)[None, :]

    if scheme == "submatrix":
        site_loop = site_loop_sub

    acc_ref[...] = jnp.zeros_like(acc_ref)
    for step in range(n_slices):
        if forward:
            l = step
            wrap_forward(canon_ev(expv_pre(l)))           # pre-update fields
            site_loop(l)
            # BbarT' = BbarT expK^T diag(expV_post)
            bbar_ref[...] = right(bbar_ref[...], expKT_ref) \
                * expv_post(l)[:, None, :]
        else:
            l = n_slices - 1 - step
            site_loop(l)
            ev = canon_ev(expv_post(l))                   # post-update fields
            wrap_backward(ev)
            # Bbar' = Bbar diag(ev) expK (normal form)
            bbar_ref[...] = right(bbar_ref[...] * ev[:, None, :], expK_ref)

    acc_ref[...] = acc_ref[...] / (ns * n_slices)


_VMEM_LIMIT = 100 * 2**20   # v5e has 128 MB VMEM; the 16 MB default scoped
                            # cap starves these kernels (measured)


def _pick_block(W: int, ns: int, k: int, itemsize: int, n_slices: int = 8,
                budget: int = 80 * 2**20, nfl: int = 1) -> int:
    """Walker-block size for the fused kernel.

    Empirical VMEM model (validated against Mosaic's scoped-allocation
    accounting): ~7 (ns, ns_pad)-sized live buffers per walker — G, GT,
    Bbar out x2 (pipeline double-buffer), G in x2, matmul temporaries —
    plus U/V scratch and streams; lanes pad to 128.  A too-small WB
    starves the MXU (batch-1 matmuls): measured 32 -> 46 sweeps/s going
    from WB=1 to WB=8 on the headline run.
    """
    ns_pad = -(-ns // 128) * 128
    # measured: ~14 (ns, ns_pad) buffers live per walker at large ns
    # (G/GT/Bbar + pipeline double-buffers + dot_general temporaries)
    per_walker = (14 * ns * ns_pad + 3 * k * ns_pad
                  + 6 * n_slices * ns_pad) * itemsize * nfl
    wb = max(1, min(W, budget // max(per_walker, 1)))
    while W % wb:
        wb -= 1
    return wb


@functools.partial(jax.jit,
                   static_argnames=("n_slices", "k_delay", "forward",
                                    "interpret", "precision", "update"))
def fused_block(model, order, props, us, G, fields_blk, *,
                n_slices: int, k_delay: int = 32, forward: bool = True,
                interpret: bool = False, precision: str = "highest",
                update: str = "delayed"):
    """Run one stabilization block for a walker batch.

    order: (n_slices, ns) i32 shared visit orders; props (W, n_slices, ns)
    proposal draws indexed by SITE (state-independent, so per-site and
    per-visit indexing give equally valid chains — per-site needs no
    permutation anywhere); us (W, n_slices, ns) uniforms indexed by visit;
    G: (W, 1, ns, ns); fields_blk: (W, n_slices, ns) the block's field
    slices (time-major per walker).  Returns (G', fields_blk',
    Bbar (W, 1, ns, ns), acc (W,)) with Bbar the block's propagator
    product in application order.
    """
    W, nfl, ns, _ = G.shape
    assert nfl in (1, 2)
    assert not (nfl == 2 and update == "submatrix"), \
        "submatrix scheme: single-flavor only (delayed supports 2f)"
    dtype = G.dtype
    if ns % k_delay:
        k_delay = next(k for k in (16, 8, 4, 2, 1) if ns % k == 0)
    L = n_slices * ns
    # CPU backends run the kernel interpreted (functional, for tests and
    # for an explicit [simulation] engine = fused on CPU)
    interpret = interpret or jax.default_backend() == "cpu"

    # ------------------------------------------------------------------
    # host-graph precomputation of every field-dependent factor: each site
    # is visited exactly once per slice, so its pre-update value is the
    # slice-start value and the whole Metropolis arithmetic except the
    # G-dependent determinant ratio vectorizes outside the kernel.  All
    # SITE-major (props are site-indexed, so no permutation exists), and
    # every 4-entry table lookup is a where-select chain: XLA:TPU gathers
    # are element-at-a-time and were measured at ~80 ms/pair here.
    # ------------------------------------------------------------------
    g_hs = model.g.astype(dtype)
    alpha = model.alpha.astype(dtype)
    fields_blk = fields_blk.astype(jnp.int32)
    order_i = order.astype(jnp.int32)                    # (n_slices, ns)

    def tab4(tbl, idx):
        out = jnp.zeros(idx.shape, dtype)
        for v in range(4):
            out = jnp.where(idx == v, jnp.asarray(float(tbl[v]), dtype), out)
        return out

    old = fields_blk                                     # site-major
    props_i = props.astype(jnp.int32)
    new_site = props_i + (props_i >= old)
    eta_old = tab4(hsfield.ETA, old)
    eta_new = tab4(hsfield.ETA, new_site)
    d_eta = eta_new - eta_old
    gb = (tab4(hsfield.GAMMA, new_site) / tab4(hsfield.GAMMA, old)) \
        * jnp.exp(alpha * g_hs * d_eta)
    if nfl == 1:
        delta = jnp.expm1(g_hs * d_eta)                  # (W, n_slices, ns)
        ev_old = jnp.exp(g_hs * eta_old).reshape(W, L)
        ev_new = jnp.exp(g_hs * eta_new).reshape(W, L)
    else:
        # opposite flavor couplings exp(+-g eta): flavor axis after W
        delta = jnp.stack([jnp.expm1(g_hs * d_eta),
                           jnp.expm1(-g_hs * d_eta)], axis=1)
        ev_old = jnp.stack([jnp.exp(g_hs * eta_old),
                            jnp.exp(-g_hs * eta_old)],
                           axis=1).reshape(W, nfl, L)
        ev_new = jnp.stack([jnp.exp(g_hs * eta_new),
                            jnp.exp(-g_hs * eta_new)],
                           axis=1).reshape(W, nfl, L)

    expK = model.expK.astype(dtype)
    invexpK = model.invexpK.astype(dtype)
    mats = (expK, expK.T, invexpK.T, invexpK if forward else expK)

    # visit-index-major streams: row l*ns+idx = visit idx of slice l
    gb_t = gb.reshape(W, L).T
    delta_t = delta.reshape(W, nfl * L).T if nfl == 2 \
        else delta.reshape(W, L).T
    us_t = us.reshape(W, L).T

    WB = _pick_block(W, ns, k_delay, jnp.dtype(dtype).itemsize,
                     n_slices=n_slices, nfl=nfl)
    # Mosaic lowers only DEFAULT and HIGHEST dot precisions (it rejects
    # bf16x3 "HIGH"); "bf16x3" selects the kernel's MANUAL three-pass
    # hi/lo-split scheme, "default" = one raw bf16 pass (physics-breaking,
    # kept for measurement)
    mxu_prec = {"highest": jax.lax.Precision.HIGHEST,
                "default": jax.lax.Precision.DEFAULT,
                "bf16x3": "bf16x3"}[precision]
    kern = functools.partial(_fused_block_kernel, n_slices, k_delay, forward,
                             mxu_prec, update, nfl)
    WC = nfl * WB
    if update == "submatrix":
        # per-(slice, block) one-hot column selectors for the k x k gathers
        nb = ns // k_delay
        pall = jax.nn.one_hot(order_i.reshape(n_slices * nb, k_delay), ns,
                              dtype=dtype).transpose(0, 2, 1)
        extra_in = (pall,)
        scratch = [
            pltpu.VMEM((WB, ns, ns), dtype),            # GT
            pltpu.VMEM((WB, k_delay, ns), dtype),       # Grows
            pltpu.VMEM((WB, k_delay, ns), dtype),       # Gcols
            pltpu.VMEM((WB, k_delay, k_delay), dtype),  # Winv
        ]
    else:
        extra_in = ()
        scratch = [
            pltpu.VMEM((WC, ns, ns), dtype),        # GT (chain axis)
            pltpu.VMEM((WC, k_delay, ns), dtype),   # Ut
            pltpu.VMEM((WC, k_delay, ns), dtype),   # V
        ]


    def call_block(gb_b, delta_b, us_b, evo_b, evn_b, G_b):
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        n_in = 10 + len(extra_in)
        return pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((WC, ns, ns), dtype),
                jax.ShapeDtypeStruct((WB, L), dtype),
                jax.ShapeDtypeStruct((WC, ns, ns), dtype),
                jax.ShapeDtypeStruct((1, WB), dtype),
                jax.ShapeDtypeStruct((1, WB), dtype),
            ),
            in_specs=[smem()] + [vmem()] * n_in,
            out_specs=(vmem(), vmem(), vmem(), vmem(), vmem()),
            scratch_shapes=scratch,
            input_output_aliases={n_in: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=interpret,
        )(order_i, gb_b, delta_b, us_b, evo_b, evn_b, *mats, *extra_in, G_b)

    n_blocks = W // WB

    def fm(x, width):
        # (W, nfl, width) -> (n_blocks, nfl*WB, width) flavor-major blocks
        return (x.reshape(n_blocks, WB, nfl, width)
                .transpose(0, 2, 1, 3).reshape(n_blocks, nfl * WB, width))

    if nfl == 1:
        G_in = G.reshape(n_blocks, WB, ns * ns)
        evo_in = ev_old.reshape(n_blocks, WB, L)
        evn_in = ev_new.reshape(n_blocks, WB, L)
        dl_in = delta_t.T.reshape(n_blocks, WB, L)
    else:
        G_in = fm(G.reshape(W, nfl, ns * ns), ns * ns)
        evo_in = fm(ev_old, L)
        evn_in = fm(ev_new, L)
        dl_in = fm(delta_t.T.reshape(W, nfl, L), L)
    G_in = G_in.reshape(n_blocks, WC, ns, ns)

    if n_blocks == 1:
        G_new, mask, bbar, acc, sgn = call_block(
            gb_t, dl_in[0].reshape(WC, L).T, us_t,
            evo_in[0], evn_in[0], G_in[0])
        G_new, bbar, acc, sgn = G_new[None], bbar[None], acc[None], sgn[None]
        mask = mask[None]
    else:
        tv = lambda x: x.T.reshape(n_blocks, WB, L).transpose(0, 2, 1)
        G_new, mask, bbar, acc, sgn = jax.vmap(call_block)(
            tv(gb_t), jnp.swapaxes(dl_in, 1, 2), tv(us_t),
            evo_in, evn_in, G_in)

    mask = mask.reshape(W, L)
    accepted = mask.reshape(W, n_slices, ns) > 0.5
    fields_new = jnp.where(accepted, new_site, fields_blk)
    # undo the flavor-major block layout
    G_new = (G_new.reshape(n_blocks, nfl, WB, ns, ns)
             .transpose(0, 2, 1, 3, 4).reshape(W, nfl, ns, ns))
    bbar = (bbar.reshape(n_blocks, nfl, WB, ns, ns)
            .transpose(0, 2, 1, 3, 4).reshape(W, nfl, ns, ns))
    if forward:
        # the kernel accumulates the forward block product transposed
        bbar = jnp.swapaxes(bbar, -1, -2)
    return (G_new, fields_new, bbar, acc.reshape(W), sgn.reshape(W))


# ----------------------------------------------------------------------
# batched fused sweep driver
# ----------------------------------------------------------------------

def supports_fused(model, cfg: EngineConfig) -> bool:
    # ns cap: at ns=1024 a single walker's VMEM footprint is ~59 MB
    # (measured), forcing WB=1 batch-starved matmuls — the per-slice path
    # wins there.  nt % n_stab != 0 is handled by a separately-compiled
    # tail block (see sweep_fused).  2-flavor det_power=1 models
    # (repulsive Hubbard) run the delayed scheme with both flavor chains
    # resident in the same kernel (decisions couple through
    # R = gb * r_up * r_dn); the submatrix scheme stays single-flavor.
    flavor_ok = ((model.n_flavor == 1 and model.det_power == 2)
                 or (model.n_flavor == 2 and model.det_power == 1
                     and cfg.fused_update != "submatrix"))
    return (flavor_ok and not getattr(model, "checkerboard", False)
            and model.n_sites <= 512)


@functools.partial(jax.jit, static_argnames=("cfg", "forward", "interpret"))
def sweep_fused(model, cfg: EngineConfig, states: WalkerState, *,
                forward: bool = True,
                interpret: bool = False) -> WalkerState:
    """One walker-BATCHED Monte-Carlo sweep using the fused block kernel.

    states carries a leading walker axis (W, ...).  Produces the same
    per-block stabilization (mat_mul_ldr fold + dag inverse) as
    engine.sweep, with everything between stabilizations fused into one
    Pallas program per block.
    """
    if not supports_fused(model, cfg):
        raise NotImplementedError("fused sweep: dense 1f(det^2)/2f(det^1) "
                                  "model with ns <= 512 required")
    W = states.G.shape[0]
    nfl, ns = model.n_flavor, model.n_sites
    dtype = model.dtype
    n_stab, n_stack = cfg.n_stab, cfg.n_stack
    rem = cfg.nt % n_stab              # ragged tail block (dqmc.cpp:14-18)
    n_full = cfg.nt // n_stab

    # one key split per sweep: per-walker per-slice keys
    keys = jax.vmap(lambda k: jax.random.split(k, cfg.nt + 1))(states.key)
    new_key = keys[:, cfg.nt]
    slice_keys = keys[:, :cfg.nt]                     # (W, nt, ...)
    # shared visit order per slice from walker 0; per-walker props/us
    orders = jax.vmap(
        lambda k: draw_slice_randoms(k, ns, dtype)[0])(slice_keys[0])
    props = jax.vmap(jax.vmap(
        lambda k: draw_slice_randoms(k, ns, dtype)[1]))(slice_keys)
    us = jax.vmap(jax.vmap(
        lambda k: draw_slice_randoms(k, ns, dtype)[2]))(slice_keys)

    tail = (orders[-rem:], props[:, -rem:], us[:, -rem:]) if rem else None
    orders = orders[:n_full * n_stab].reshape(n_full, n_stab, ns)
    props = props[:, :n_full * n_stab].reshape(W, n_full, n_stab, ns)
    us = us[:, :n_full * n_stab].reshape(W, n_full, n_stab, ns)

    stabilize_f = jax.vmap(
        lambda G, F_prev, other, bbar: _stabilize_one(G, F_prev, other,
                                                      bbar, forward))

    def run_block(carry, i_stack, order_b, props_b, us_b, n_slices, l0):
        fields, G, F_prev, log_det, acc, sgn, emax, esum, ecnt = carry
        fields_blk = jax.lax.dynamic_slice_in_dim(fields, l0, n_slices,
                                                  axis=1)
        G, fields_blk, bbar, acc_b, sgn_b = fused_block(
            model, order_b, props_b, us_b, G, fields_blk,
            n_slices=n_slices, forward=forward, interpret=interpret,
            precision=cfg.wrap_precision, update=cfg.fused_update,
            k_delay=cfg.submatrix_rank
            if cfg.fused_update == "submatrix" and cfg.submatrix_rank
            else 32)
        fields = jax.lax.dynamic_update_slice_in_dim(fields, fields_blk, l0,
                                                     axis=1)
        # the opposite half-chain, read per block from the NON-CARRIED input
        # stack (the sweep never writes slots it reads — see sweep.py)
        other = jax.vmap(
            lambda st: slot_get(st, i_stack + (2 if forward else 0))
        )(states.stack)
        G_new, F_new, log_det_new, err = stabilize_f(G, F_prev, other, bbar)
        acc = acc + acc_b * (n_slices / cfg.nt)
        sgn = sgn * sgn_b.astype(sgn.dtype)
        emax = jnp.maximum(emax, err)
        esum = esum + err
        ecnt = ecnt + jnp.ones_like(ecnt)
        return (fields, G_new, F_new, log_det_new, acc, sgn, emax, esum,
                ecnt)

    def block_step(carry, xs):
        i_stack, order_b, props_b, us_b = xs
        carry = run_block(carry, i_stack, order_b, props_b, us_b,
                          n_stab, i_stack * n_stab)
        return carry, carry[2]

    def tail_block(carry):
        # the short last block runs as a separately-compiled kernel call
        order_t, props_t, us_t = tail
        return run_block(carry, jnp.int32(n_stack - 1), order_t, props_t,
                         us_t, rem, n_full * n_stab)

    i_stacks = jnp.arange(n_full, dtype=jnp.int32)
    if not forward:
        i_stacks = i_stacks[::-1]
        orders = orders[::-1]
        props = props[:, ::-1]
        us = us[:, ::-1]
    xs = (i_stacks, orders, jnp.moveaxis(props, 0, 1),
          jnp.moveaxis(us, 0, 1))

    id_w = jax.tree_util.tree_map(
        lambda x: jnp.tile(x, (W,) + (1,) * x.ndim),
        identity_slot(nfl, ns, dtype))
    carry = (states.fields, states.G, id_w, states.log_det_M,
             states.acc_sum, states.sign, states.err_max, states.err_sum,
             states.err_count)
    tail_slot = None
    if rem and not forward:
        carry = tail_block(carry)
        tail_slot = carry[2]
    carry, slots = jax.lax.scan(block_step, carry, xs)
    if rem and forward:
        carry = tail_block(carry)
        tail_slot = carry[2]
    stack = stack_from_slots(slots, id_w, tail_slot, reverse=not forward,
                             axis=2)
    (fields, G, _, log_det, acc, sgn, emax, esum, ecnt) = carry
    return dataclasses.replace(
        states, fields=fields, G=G, stack=stack, log_det_M=log_det,
        key=new_key, acc_sum=acc, sign=sgn, err_max=emax, err_sum=esum,
        err_count=ecnt)


def _stabilize_one(G, F_prev, other, Bbar, forward):
    """Per-walker stabilization at a block boundary (same math as
    engine.sweep.sweep's stabilize): extend the carried chain factor F_prev
    with the block product; ``other`` is the opposite half-chain's slot read
    from the input stack (suffix slot i+2 forward, prefix slot i backward)."""
    if forward:
        F_new = _mat_mul_ldr_f(Bbar, F_prev)
        G_new, log_det = _inv_pair_f(F_new, other)
    else:
        F_new = _mat_mul_ldr_f(jnp.swapaxes(Bbar, -1, -2), F_prev)
        G_new, log_det = _inv_pair_f(other, F_new)
    err = jnp.max(jnp.abs(G - G_new))
    return G_new, F_new, log_det, err


def sweep_pair_fused(model, cfg: EngineConfig, states: WalkerState,
                     interpret: bool = False) -> WalkerState:
    """Walker-batched forward+backward sweep pair on the fused path."""
    states = sweep_fused(model, cfg, states, forward=True,
                         interpret=interpret)
    return sweep_fused(model, cfg, states, forward=False,
                       interpret=interpret)
