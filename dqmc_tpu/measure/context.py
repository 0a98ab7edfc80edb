"""Device-side lattice tables for measurement kernels.

The Lattice object is host-side numpy; observables and transforms run
inside jit.  ``MeasurementContext`` packages the index tables and DFT
phases they need as a pytree of device constants.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dqmc_tpu.lattice import Lattice


def _static():
    return dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MeasurementContext:
    # static dims
    L1: int = _static()
    L2: int = _static()
    n_orb: int = _static()
    n_cells: int = _static()
    n_sites: int = _static()

    # tables (DFT phases stored as a real (re, im) pair: some TPU runtimes
    # cannot device-transfer complex arrays, and the k-space transform only
    # runs host-side in the manager anyway)
    disp_table: jax.Array      # (L1, L2, n_cells) int32 — lattice translations
    phases_re: jax.Array       # (L1, L2, L1, L2) — Re exp(-i k . r)
    phases_im: jax.Array       # (L1, L2, L1, L2) — Im exp(-i k . r)
    nbr_x: jax.Array           # (n_sites,) int32 — +x neighbor map (currxx)
    # one-hot cyclic-shift tensors for the separable site->r contraction:
    # shift1[x, dxi, x'] = 1 iff x' = (x + dxi - off1) mod L1, and the L2
    # analogue — XLA:TPU gathers are element-at-a-time, so the displacement
    # reduction runs as two MXU einsums instead (see transforms.site_to_r)
    shift1: jax.Array          # (L1, L1, L1)
    shift2: jax.Array          # (L2, L2, L2)

    @property
    def phases(self):
        return np.asarray(self.phases_re) + 1j * np.asarray(self.phases_im)


def _shift_onehot(L: int, off: int, dtype) -> np.ndarray:
    S = np.zeros((L, L, L))
    for x in range(L):
        for d in range(L):
            S[x, d, (x + d - off) % L] = 1.0
    return S


def make_context(lat: Lattice, dtype=jnp.float64) -> MeasurementContext:
    from dqmc_tpu.lattice import _half_offset
    phases = lat.kspace_phases()
    return MeasurementContext(
        L1=lat.L1, L2=lat.L2, n_orb=lat.n_orb, n_cells=lat.n_cells,
        n_sites=lat.n_sites,
        disp_table=jnp.asarray(lat.displacement_table()),
        phases_re=jnp.asarray(phases.real, dtype),
        phases_im=jnp.asarray(phases.imag, dtype),
        nbr_x=jnp.asarray(lat.neighbor_map((1, 0), orb=0)),
        shift1=jnp.asarray(_shift_onehot(lat.L1, _half_offset(lat.L1), dtype),
                           dtype),
        shift2=jnp.asarray(_shift_onehot(lat.L2, _half_offset(lat.L2), dtype),
                           dtype),
    )
