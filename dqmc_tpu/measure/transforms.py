"""Site-pair -> displacement -> momentum transforms.

TPU-native re-design of the reference's transform namespace
(measurementh5.h:12-117):

- ``site_to_r``: the O(ns^2) scalar accumulation loop becomes one batched
  gather + mean over cells, using the precomputed lattice translation table.
  Output layout matches the reference exactly: (L1, L2, (a*n_orb+b)*S + s)
  with displacement index offsets dx + L/2 - 1 for even L
  (measurementh5.h:57-61).
- ``r_to_k``: the explicit O(L^4) DFT quadruple loop becomes a single dense
  complex contraction with the precomputed phase tensor — an MXU matmul.
  The reference's k flat-index convention (measurementh5.h:98-99) is only
  self-consistent for L1 == L2; we use the row-major (kidx // L2, kidx % L2)
  mapping, identical for square lattices and correct for rectangular ones.

Both transforms are linear, so they commute with bin averaging; the
measurement manager applies them per measurement inside jit and accumulates
the reduced (L1, L2, S) arrays — O(L^2) memory per observable instead of
the reference's O(ns^2) site-pair accumulators (measurementh5.h:140-141).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dqmc_tpu.measure.context import MeasurementContext


def site_to_r(chi, ctx: MeasurementContext):
    """chi (ns, ns) or (ns, ns, S) site-pair array -> (L1, L2, n_orb^2 * S)
    displacement array, averaged over cells (1/n_cells, measurementh5.h:61).
    """
    nc, no = ctx.n_cells, ctx.n_orb
    squeeze = chi.ndim == 2
    if squeeze:
        chi = chi[..., None]
    S = chi.shape[-1]
    chi = chi.reshape(nc, no, nc, no, S)
    cells = jnp.arange(nc)
    Tf = ctx.disp_table.reshape(-1, nc)                    # (nd, nc)
    # gathered[d, c, a, b, s] = chi[c, a, T[d, c], b, s]
    gathered = chi[cells[None, :], :, Tf, :, :]
    out = gathered.mean(axis=1)                            # (nd, no, no, S)
    # reference flat layout: (a*n_orb + b)*S + s  (measurementh5.h:61)
    return out.reshape(ctx.L1, ctx.L2, no * no * S)


def r_to_k(chi_r, ctx: MeasurementContext):
    """(L1, L2, S) real displacement data -> (L1, L2, S) complex k-space via
    the dense DFT: chi_k[k] = sum_r chi_r[r] exp(-i k . r).

    Computed as two real contractions (phases stored as a re/im pair so the
    context needs no complex device arrays)."""
    chi_r = chi_r.astype(ctx.phases_re.dtype)
    re = jnp.tensordot(ctx.phases_re, chi_r, axes=((2, 3), (0, 1)))
    im = jnp.tensordot(ctx.phases_im, chi_r, axes=((2, 3), (0, 1)))
    return jax.lax.complex(re, im)
