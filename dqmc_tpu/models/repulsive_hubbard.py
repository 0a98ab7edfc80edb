"""Repulsive Hubbard model (2-flavor DQMC).

    H = -t sum_<ij> c†_i c_j - mu sum_i n_i + U sum_i (n_iu - 1/2)(n_id - 1/2)

The reference anticipates but does not implement this model — its engine
signatures carry flavor indices throughout (model.h:36-57: ``expV(l, flv)``,
``n_flavor()``, per-flavor det ratios) with the attractive model hardcoding
``n_flavor == 1``.  This class exercises the multi-flavor path end-to-end.

HS decoupling (spin channel): with y = n_u - n_d,
    exp(-dtau U (n_u-1/2)(n_d-1/2)) = const * exp(dtau U/2 * y^2)
    exp(dtau U/2 y^2) ~= sum_s gamma(s) exp(g eta(s) y),   g = sqrt(dtau U/2)
so the two flavors see OPPOSITE couplings exp(+-g eta s) and there is no
per-field bosonic factor (alpha = 0).  The determinant ratio is the product
over the two flavors (det_power = 1), not a square; away from half filling
it may go negative — the engine tracks the Metropolis sign
(WalkerState.sign) and the measurement layer records <sign> for
reweighting.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from dqmc_tpu import hsfield
from dqmc_tpu.config import Parameters
from dqmc_tpu.lattice import Lattice
from dqmc_tpu.models.attractive_hubbard import build_kinetic_matrix


def _static():
    return dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RepulsiveHubbard:
    n_sites: int = _static()
    nt: int = _static()
    n_flavor: int = _static()    # 2 stored flavors (up, down)
    det_power: int = _static()   # ratio enters once per flavor

    expK: jax.Array
    invexpK: jax.Array
    expK_half: jax.Array
    invexpK_half: jax.Array
    g: jax.Array
    alpha: jax.Array             # 0: no bosonic weight in the spin channel
    eta: jax.Array
    gamma: jax.Array
    beta: jax.Array

    @classmethod
    def build(cls, lat: Lattice, *, U: float, t: float, mu: float,
              beta: float, nt: int, dtype=jnp.float64,
              bonds=None) -> "RepulsiveHubbard":
        dtau = beta / nt
        K = build_kinetic_matrix(lat, t, mu, bonds=bonds)
        return cls(
            n_sites=lat.n_sites, nt=int(nt), n_flavor=2, det_power=1,
            expK=jnp.asarray(scipy.linalg.expm(-dtau * K), dtype),
            invexpK=jnp.asarray(scipy.linalg.expm(dtau * K), dtype),
            expK_half=jnp.asarray(scipy.linalg.expm(-0.5 * dtau * K), dtype),
            invexpK_half=jnp.asarray(scipy.linalg.expm(0.5 * dtau * K), dtype),
            g=jnp.asarray(np.sqrt(0.5 * abs(U) * dtau), dtype),
            alpha=jnp.asarray(0.0, dtype),
            eta=jnp.asarray(hsfield.ETA, dtype),
            gamma=jnp.asarray(hsfield.GAMMA, dtype),
            beta=jnp.asarray(beta, dtype),
        )

    @classmethod
    def from_params(cls, params: Parameters, lat: Lattice, *,
                    beta: float | None = None, dtype=jnp.float64):
        from dqmc_tpu.lattice import bonds_with_tp
        geometry = params.get_str("Lattice", "geometry", "square")
        bonds = bonds_with_tp(geometry,
                              params.get_float("hubbard", "tp", 0.0))
        return cls.build(
            lat,
            U=params.get_float("hubbard", "U"),
            t=params.get_float("hubbard", "t"),
            mu=params.get_float("hubbard", "mu"),
            beta=params.get_float("simulation", "beta") if beta is None else beta,
            nt=params.get_int("simulation", "nt"),
            dtype=dtype,
            bonds=bonds,
        )

    @property
    def dtype(self):
        return self.expK.dtype

    # ------------------------------------------------------------------

    def expV_diag(self, fields_l: jax.Array) -> jax.Array:
        """(2, ns): up sees exp(+g eta), down sees exp(-g eta).

        Table lookup as a select chain — see AttractiveHubbard.expV_diag."""
        from dqmc_tpu.hsfield import select4
        v = self.g * select4(self.eta, fields_l)
        return jnp.stack([jnp.exp(v), jnp.exp(-v)])

    def B_mats(self, fields_l: jax.Array):
        expV = self.expV_diag(fields_l)
        B = expV[..., :, None] * self.expK
        invB = self.invexpK * (1.0 / expV)[..., None, :]
        return B, invB

    def B_of(self, fields_l: jax.Array) -> jax.Array:
        expV = self.expV_diag(fields_l)
        return expV[..., :, None] * self.expK

    def update_factors(self, old: jax.Array, new: jax.Array):
        """(gammaR, bosonR=1, delta (2,)) with opposite flavor couplings."""
        d_eta = self.eta[new] - self.eta[old]
        gammaR = self.gamma[new] / self.gamma[old]
        bosonR = jnp.exp(self.alpha * self.g * d_eta)  # == 1 (alpha = 0)
        x = self.g * d_eta
        delta = jnp.stack([jnp.expm1(x), jnp.expm1(-x)])
        return gammaR, bosonR, delta

    def det_ratio(self, G_ii: jax.Array, delta: jax.Array) -> jax.Array:
        r_flv = 1.0 + (1.0 - G_ii) * delta
        return jnp.prod(r_flv) ** self.det_power

    def global_action(self, fields: jax.Array, log_det_M: jax.Array) -> jax.Array:
        # exact state-count form of the bosonic sum (see AttractiveHubbard)
        s_ferm = -self.det_power * jnp.sum(log_det_M)
        counts = jnp.stack(
            [jnp.count_nonzero(fields == v)
             for v in range(4)]).astype(self.gamma.dtype)
        log_gamma = jnp.sum(counts * jnp.log(self.gamma))
        return s_ferm - log_gamma
