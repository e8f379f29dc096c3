"""Special-relativistic (hydro) variable conversions.

Reference: src/convert_var.c SR-HYDRO sections —
  Cons1D_to_Prim1D (:504-590): the conserved->primitive inversion reduces
  to a quartic in |v| solved analytically (no Newton iteration), vectorized
  here over whole grids.
  Prim1D_to_Cons1D (:949-985): D = gamma rho, M = rho h gamma^2 v,
  E = rho h gamma^2 - P  (total energy INCLUDES rest mass).

Conventions: stacked arrays (d, Vx, Vy, Vz, P) / (D, Mx, My, Mz, E);
units with c = 1.
"""

from __future__ import annotations

import jax.numpy as jnp

from .config import SimConfig
from .defs import TINY_NUMBER


def sr_prim1d_to_cons1d(W, sim: SimConfig):
    d, Vx, Vy, Vz, P = W[0], W[1], W[2], W[3], W[4]
    vsq = Vx ** 2 + Vy ** 2 + Vz ** 2
    U0 = 1.0 / (1.0 - vsq)
    wU0sq = (d + sim.gamma / sim.gamma_1 * P) * U0
    return jnp.stack([jnp.sqrt(U0) * d,
                      wU0sq * Vx, wU0sq * Vy, wU0sq * Vz,
                      wU0sq - P])


def sr_cons1d_to_prim1d(U, sim: SimConfig):
    """Analytic quartic inversion (convert_var.c:514-586)."""
    D, Mx, My, Mz, E = U[0], U[1], U[2], U[3], U[4]
    g = sim.gamma
    g1 = sim.gamma_1

    Msq = Mx ** 2 + My ** 2 + Mz ** 2
    M = jnp.sqrt(Msq)
    small = jnp.abs(M) < TINY_NUMBER
    Msafe = jnp.where(small, 1.0, M)

    ME = Msafe * E
    Dsq = D ** 2
    g1sq = g1 ** 2
    denom = 1.0 / (g1sq * (Msq + Dsq))
    a3 = (-2.0 * g * g1 * ME) * denom
    a2 = (g ** 2 * E ** 2 + 2.0 * g1 * Msq - g1sq * Dsq) * denom
    a1 = (-2.0 * g * ME) * denom
    a0 = Msq * denom

    i1 = -a2
    i2 = a3 * a1 - 4.0 * a0
    i3 = 4.0 * a2 * a0 - a1 ** 2 - a3 ** 2 * a0
    iR = (9.0 * i1 * i2 - 27.0 * i3 - 2.0 * i1 ** 3) / 54.0
    iS = (3.0 * i2 - a2 ** 2) / 9.0
    iT = iR ** 2 + iS ** 2 * iS

    # complex-root branch (iT < 0): the conjugate pair sums to a real value
    sT = jnp.sqrt(jnp.abs(iT))
    ix_neg = 2.0 * jnp.cbrt(jnp.sqrt(iR * iR + iT * (iT < 0))) * \
        jnp.cos(jnp.arctan2(sT, iR) / 3.0) - i1 / 3.0
    # real branch; cbrt handles a negative radicand with the real root
    ix_pos = jnp.cbrt(iR + sT) + jnp.cbrt(iR - sT) - i1 / 3.0
    ix1 = jnp.where(iT < 0.0, ix_neg, ix_pos)

    iB = 0.5 * (a3 + jnp.sqrt(jnp.maximum(a3 ** 2 - 4.0 * a2 + 4.0 * ix1,
                                          0.0)))
    iC = 0.5 * (ix1 - jnp.sqrt(jnp.maximum(ix1 ** 2 - 4.0 * a0, 0.0)))
    v = 0.5 * (-iB + jnp.sqrt(jnp.maximum(iB ** 2 - 4.0 * iC, 0.0)))
    v = jnp.where(small, 0.0, v)
    v = jnp.clip(v, 0.0, 1.0 - 1.0e-15)

    vOverM = jnp.where(small, 0.0, v / Msafe)
    d = jnp.sqrt(1.0 - v ** 2) * D
    Vx = Mx * vOverM
    Vy = My * vOverM
    Vz = Mz * vOverM
    P = g1 * ((E - Mx * Vx - My * Vy - Mz * Vz) - d)
    return jnp.stack([d, Vx, Vy, Vz, P])
