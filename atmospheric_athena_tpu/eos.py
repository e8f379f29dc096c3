"""Equation of state and variable conversions (reference: src/convert_var.c).

All functions operate on *stacked* arrays: the leading axis enumerates the
1D-slice variable ordering of Cons1DS/Prim1DS (src/athena.h:146-188):

  cons: (d, Mx, My, Mz, [E], [By, Bz], s...)
  prim: (d, Vx, Vy, Vz, [P], [By, Bz], r...)   with r = s/d

Bx is passed separately, exactly like the reference.  Everything is shape-
polymorphic over the trailing axes, so the same code serves single pencils,
whole 3D grids, and sharded shards.
"""

from __future__ import annotations

import jax.numpy as jnp

from .defs import TINY_NUMBER
from .config import SimConfig


def _split(q, sim: SimConfig):
    """Split a stacked 1D-slice array into (vec5, byz, s) components."""
    ne = 5 if sim.adiabatic else 4
    nb = 2 if sim.mhd else 0
    return q[:ne], q[ne:ne + nb], q[ne + nb:]


def cons1d_to_prim1d(U, Bx, sim: SimConfig):
    """Cons1D→Prim1D with the reference's pressure floor
    P = MAX(P, TINY_NUMBER) (src/convert_var.c:389-421, floor at :408)."""
    core, byz, s = _split(U, sim)
    d = core[0]
    di = 1.0 / d
    V = core[1:4] * di
    out = [d, V[0], V[1], V[2]]
    if sim.adiabatic:
        E = core[4]
        P = E - 0.5 * (core[1] ** 2 + core[2] ** 2 + core[3] ** 2) * di
        if sim.mhd:
            P = P - 0.5 * (Bx ** 2 + byz[0] ** 2 + byz[1] ** 2)
        P = P * sim.gamma_1
        P = jnp.maximum(P, TINY_NUMBER)
        out.append(P)
    if sim.mhd:
        out.extend([byz[0], byz[1]])
    for n in range(sim.nscalars):
        out.append(s[n] * di)
    return jnp.stack(out)


def prim1d_to_cons1d(W, Bx, sim: SimConfig):
    """Prim1D→Cons1D; no floor applied (src/convert_var.c:424-461)."""
    core, byz, r = _split(W, sim)
    d, Vx, Vy, Vz = core[0], core[1], core[2], core[3]
    out = [d, d * Vx, d * Vy, d * Vz]
    if sim.adiabatic:
        P = core[4]
        E = P / sim.gamma_1 + 0.5 * d * (Vx ** 2 + Vy ** 2 + Vz ** 2)
        if sim.mhd:
            E = E + 0.5 * (Bx ** 2 + byz[0] ** 2 + byz[1] ** 2)
        out.append(E)
    if sim.mhd:
        out.extend([byz[0], byz[1]])
    for n in range(sim.nscalars):
        out.append(r[n] * d)
    return jnp.stack(out)


def cfast(U, Bx, sim: SimConfig):
    """Fast magnetosonic speed from conserved 1D-slice variables
    (src/convert_var.c:466-508).  Note: no pressure floor here, matching the
    reference exactly."""
    core, byz, _ = _split(U, sim)
    d = core[0]
    di = 1.0 / d
    if sim.adiabatic:
        pb = 0.0
        if sim.mhd:
            pb = 0.5 * (Bx ** 2 + byz[0] ** 2 + byz[1] ** 2)
        p = sim.gamma_1 * (core[4] - pb - 0.5 *
                           (core[1] ** 2 + core[2] ** 2 + core[3] ** 2) * di)
        asq = sim.gamma * p * di
    else:
        asq = sim.iso_csound2
    if not sim.mhd:
        return jnp.sqrt(asq)
    ctsq = (byz[0] ** 2 + byz[1] ** 2) * di
    casq = Bx ** 2 * di
    tmp = casq + ctsq - asq
    cfsq = 0.5 * ((asq + ctsq + casq) + jnp.sqrt(tmp * tmp + 4.0 * asq * ctsq))
    return jnp.sqrt(cfsq)
