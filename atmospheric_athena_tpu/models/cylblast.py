"""Blast wave in cylindrical coordinates (reference: src/prob/cylblast.c).

Uniform ambient medium (rho0, pamb) with an over-pressured circular region
of radius `radius` centered at Cartesian (r0 cos(phi0), r0 sin(phi0), z0)
(cylblast.c:91-135); optional rigid azimuthal flow M2 = d·r·omega0.  The
tst/cylindrical decks enroll do_nothing_bc on every face (cylblast.c:
137-140) via BC flag 3 — ghosts keep the ambient initial values.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .. import state as state_mod
from ..config import GridConfig, SimConfig
from ..defs import ID, IEN, IM1
from . import register


@register("cylblast")
class CylBlast:
    coord = "cylindrical"
    sim_overrides = {"flux": "hllc"}

    def __init__(self, par, sim: SimConfig, grid: GridConfig):
        assert grid.cylindrical
        self.par = par

    def init(self, par, sim: SimConfig, grid: GridConfig):
        dtype = sim.jnp_dtype()
        st = state_mod.zeros(sim, grid)
        radius = par.getd("problem", "radius")
        pamb = par.getd("problem", "pamb")
        prat = par.getd("problem", "prat")
        rho0 = par.getd("problem", "rho0")
        omega0 = par.getd("problem", "omega0")
        r0 = par.getd("problem", "r0")
        phi0 = par.getd("problem", "phi0")
        z0 = par.getd("problem", "z0")
        x0 = r0 * math.cos(phi0)
        y0 = r0 * math.sin(phi0)

        xs = [np.asarray(grid.cc_coords(a), dtype) for a in range(3)]
        x1 = jnp.asarray(xs[0]).reshape(1, 1, -1)
        x2 = jnp.asarray(xs[1]).reshape(1, -1, 1)
        x3 = jnp.asarray(xs[2]).reshape(-1, 1, 1)
        # Cartesian position of the cell center (cylblast.c:116-119)
        x = x1 * jnp.cos(x2)
        y = x1 * jnp.sin(x2)
        z = x3
        inside = jnp.broadcast_to(
            (x - x0) ** 2 + (y - y0) ** 2 + (z - z0) ** 2 < radius ** 2,
            grid.padded_shape())

        d = jnp.full(grid.padded_shape(), rho0, dtype)
        M2 = d * x1 * omega0
        U = st.U.at[ID].set(d)
        U = U.at[IM1 + 1].set(jnp.broadcast_to(M2, grid.padded_shape()))
        kw = {}
        Emag = 0.0
        if sim.mhd:
            # planar field in the x-y (R,phi) plane at `angle` from the
            # x-axis (cylblast.c:105-112); B2i uses the left phi face
            b0 = par.getd("problem", "b0")
            ang = math.pi / 180.0 * par.getd("problem", "angle")
            x2i = x2 - 0.5 * grid.dx[1]
            shp = grid.padded_shape()
            B1 = jnp.broadcast_to(
                b0 * (math.cos(ang) * jnp.cos(x2)
                      + math.sin(ang) * jnp.sin(x2)), shp)
            B2c = jnp.broadcast_to(
                b0 * (-math.cos(ang) * jnp.sin(x2)
                      + math.sin(ang) * jnp.cos(x2)), shp)
            B2i = jnp.broadcast_to(
                b0 * (-math.cos(ang) * jnp.sin(x2i)
                      + math.sin(ang) * jnp.cos(x2i)), shp)
            Z = jnp.zeros(shp, dtype)
            kw["Bcc"] = jnp.stack([B1, B2c, Z])
            kw["B1i"] = B1
            kw["B2i"] = B2i
            kw["B3i"] = Z
            Emag = 0.5 * (B1 ** 2 + B2c ** 2)
        if sim.adiabatic:
            Eint = jnp.where(inside, prat * pamb, pamb) / sim.gamma_1
            Ekin = 0.5 * U[IM1 + 1] ** 2 / d
            U = U.at[IEN].set(Eint + Ekin + Emag)
        return st.replace(U=U, **kw)
