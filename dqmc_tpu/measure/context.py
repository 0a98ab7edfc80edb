"""Device-side lattice tables for measurement kernels.

The Lattice object is host-side numpy; observables and transforms run
inside jit.  ``MeasurementContext`` packages the index tables and DFT
phases they need as a pytree of device constants.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

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

    # tables
    disp_table: jax.Array      # (L1, L2, n_cells) int32 — lattice translations
    phases: jax.Array          # (L1, L2, L1, L2) complex — exp(-i k . r)
    nbr_x: jax.Array           # (n_sites,) int32 — +x neighbor map (currxx)


def make_context(lat: Lattice, dtype=jnp.float64) -> MeasurementContext:
    cplx = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    return MeasurementContext(
        L1=lat.L1, L2=lat.L2, n_orb=lat.n_orb, n_cells=lat.n_cells,
        n_sites=lat.n_sites,
        disp_table=jnp.asarray(lat.displacement_table()),
        phases=jnp.asarray(lat.kspace_phases(), cplx),
        nbr_x=jnp.asarray(lat.neighbor_map((1, 0), orb=0)),
    )
