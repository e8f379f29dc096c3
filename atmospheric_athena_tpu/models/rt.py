"""Rayleigh-Taylor instability, 2D (reference: src/prob/rt.c:115-165).

Heavy fluid (d=2) over light (d=1) with gravity g=0.1 in −y via the
enrolled potential φ=0.1·x2 (rt.c:664-672) and reflecting x2 walls;
pressure profile keeps the interface in hydrostatic balance.  iprob=1
single-mode velocity perturbation.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .. import state as state_mod
from ..config import GridConfig, SimConfig
from ..defs import ID, IEN, IM1
from . import register


@register("rt")
class RayleighTaylor:
    def __init__(self, par, sim: SimConfig, grid: GridConfig):
        self.amp = par.getd("problem", "amp")
        self.iprob = par.geti_def("problem", "iprob", 1)
        self.b0 = par.getd_def("problem", "b0", 0.0)
        self.lx = grid.xmax[0] - grid.xmin[0]
        self.ly = grid.xmax[1] - grid.xmin[1]
        if grid.ndim != 2:
            raise NotImplementedError("3D RT pending")

    def static_grav_pot(self, x1, x2, x3):
        return 0.1 * x2

    def init(self, par, sim: SimConfig, grid: GridConfig):
        st = state_mod.zeros(sim, grid)
        shape = grid.padded_shape()
        x1 = jnp.asarray(np.asarray(grid.cc_coords(0)),
                         st.U.dtype)[None, None, :]
        x2 = jnp.asarray(np.asarray(grid.cc_coords(1)),
                         st.U.dtype)[None, :, None]
        heavy = jnp.broadcast_to(x2 > 0.0, shape)
        d = jnp.where(heavy, 2.0, 1.0)
        M2 = (self.amp / 4.0 * (1.0 + jnp.cos(2 * math.pi * x1 / self.lx))
              * (1.0 + jnp.cos(2 * math.pi * x2 / self.ly)))
        M2 = jnp.broadcast_to(M2, shape)
        M2 = jnp.where(heavy, 2.0 * M2, M2)
        E = jnp.where(heavy,
                      (1.0 / sim.gamma - 0.2 * x2) / sim.gamma_1,
                      (1.0 / sim.gamma - 0.1 * x2) / sim.gamma_1)
        E = jnp.broadcast_to(E, shape) + 0.5 * M2 ** 2 / d
        U = st.U.at[ID].set(d).at[IM1 + 1].set(M2)
        kw = {}
        if sim.mhd:
            Bcc = st.Bcc.at[0].set(self.b0)
            E = E + 0.5 * self.b0 ** 2
            kw = dict(Bcc=Bcc, B1i=Bcc[0], B2i=Bcc[1], B3i=Bcc[2])
        U = U.at[IEN].set(E)
        return st.replace(U=U, **kw)
