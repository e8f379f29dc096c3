"""Orszag-Tang vortex (reference: src/prob/orszag-tang.c).

2D MHD vortex initialized from a vector potential so ∇·B = 0 to roundoff:
Az = B0/(4π)·cos(4πx) + B0/(2π)·cos(2πy), B = ∇×Az ẑ, with
B0 = 1/√4π, d0 = 25/36π, v0 = 1, p0 = 5/12π (orszag-tang.c:45-49).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .. import state as state_mod
from ..config import GridConfig, SimConfig
from ..defs import ID, IEN, IM1
from . import register


@register("orszag-tang")
@register("orszag_tang")
class OrszagTang:
    sim_overrides = dict(gas="mhd")

    def __init__(self, par, sim: SimConfig, grid: GridConfig):
        if grid.ndim != 2:
            raise ValueError("orszag-tang is 2D only (orszag-tang.c:39-41)")

    def init(self, par, sim: SimConfig, grid: GridConfig):
        st = state_mod.zeros(sim, grid)
        PI = math.pi
        B0 = 1.0 / math.sqrt(4.0 * PI)
        d0 = 25.0 / (36.0 * PI)
        v0 = 1.0
        p0 = 5.0 / (12.0 * PI)
        dx1, dx2 = grid.dx[0], grid.dx[1]

        # face-corner vector potential Az over the whole padded grid
        xf = np.asarray(grid.cc_coords(0)) - 0.5 * dx1
        yf = np.asarray(grid.cc_coords(1)) - 0.5 * dx2
        az = (B0 / (4.0 * PI) * np.cos(4.0 * PI * xf)[None, :]
              + B0 / (2.0 * PI) * np.cos(2.0 * PI * yf)[:, None])
        az = jnp.asarray(az, st.U.dtype)

        # B from the curl of Az (exactly divergence-free on faces)
        B1i = (jnp.roll(az, -1, 0) - az) / dx2   # (az[j+1,i]-az[j,i])/dx2
        B2i = -(jnp.roll(az, -1, 1) - az) / dx1
        B1i3 = jnp.broadcast_to(B1i[None], grid.padded_shape())
        B2i3 = jnp.broadcast_to(B2i[None], grid.padded_shape())

        xc = jnp.asarray(np.asarray(grid.cc_coords(0)), st.U.dtype)
        yc = jnp.asarray(np.asarray(grid.cc_coords(1)), st.U.dtype)
        M1 = -d0 * v0 * jnp.sin(2.0 * PI * yc)[None, :, None]
        M2 = d0 * v0 * jnp.sin(2.0 * PI * xc)[None, None, :]
        shape = grid.padded_shape()

        U = st.U
        U = U.at[ID].set(d0)
        U = U.at[IM1].set(jnp.broadcast_to(M1, shape))
        U = U.at[IM1 + 1].set(jnp.broadcast_to(M2, shape))
        B1c = 0.5 * (B1i3 + jnp.roll(B1i3, -1, 2))
        B2c = 0.5 * (B2i3 + jnp.roll(B2i3, -1, 1))
        Bcc = st.Bcc.at[0].set(B1c).at[1].set(B2c)
        E = (p0 / sim.gamma_1 + 0.5 * (B1c ** 2 + B2c ** 2)
             + 0.5 * (U[IM1] ** 2 + U[IM1 + 1] ** 2) / d0)
        U = U.at[IEN].set(E)
        return st.replace(U=U, Bcc=Bcc, B1i=B1i3, B2i=B2i3,
                          B3i=jnp.zeros(shape, st.U.dtype))
