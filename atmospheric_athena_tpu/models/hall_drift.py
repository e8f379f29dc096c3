"""Hall drift test (reference: src/prob/hall_drift.c).

2D isothermal MHD: Bz = B0 + dB cos(k1 x), rho = d0/(1 - drho cos(k2 y)),
zero velocity.  With the Hall effect (Q_Hall = problem/Q_H, d_ind = 1,
hall_drift.c:133-136) the Bz profile drifts at the Hall speed while the
density stripe modulates it — exercises EField_Hall's split
Bcor/Jcor corrector and the hyper-diffusion stabiliser.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .. import state as state_mod
from ..config import GridConfig, SimConfig
from ..defs import ID
from . import register


@register("hall_drift")
class HallDrift:
    def __init__(self, par, sim: SimConfig, grid: GridConfig):
        self.par = par
        if not sim.mhd or sim.adiabatic:
            raise ValueError("[hall_drift]: isothermal MHD only")
        if grid.Nx[0] == 1 or grid.Nx[1] == 1:
            raise ValueError("[hall_drift]: needs Nx1, Nx2 > 1")
        # the reference problem sets the resistivity globals in code
        # (hall_drift.c:133-136)
        if not par.exist("problem", "Q_Hall"):
            par.set("problem", "Q_Hall", par.getd("problem", "Q_H"))
        if not par.exist("problem", "d_ind"):
            par.set("problem", "d_ind", 1.0)

    def init(self, par, sim: SimConfig, grid: GridConfig):
        dtype = sim.jnp_dtype()
        st = state_mod.zeros(sim, grid)
        B0 = par.getd_def("problem", "B0", 1.0)
        dB = par.getd_def("problem", "dB", 0.1)
        d0 = 1.0
        dden = par.getd_def("problem", "drho", 0.1)
        k1 = 2.0 * math.pi / (grid.xmax[0] - grid.xmin[0])
        k2 = 2.0 * math.pi / (grid.xmax[1] - grid.xmin[1])
        x1 = np.asarray(grid.cc_coords(0))[None, None, :]
        x2 = np.asarray(grid.cc_coords(1))[None, :, None]
        nz, ny, nx = grid.padded_shape()
        b3 = np.broadcast_to(B0 + dB * np.cos(k1 * x1), (nz, ny, nx))
        d = np.broadcast_to(d0 / (1.0 - dden * np.cos(k2 * x2) / d0),
                            (nz, ny, nx))
        U = st.U.at[ID].set(jnp.asarray(d, dtype))
        Bcc = st.Bcc.at[2].set(jnp.asarray(b3, dtype))
        B3i = st.B3i.at[...].set(jnp.asarray(b3, dtype))
        return st.replace(U=U, Bcc=Bcc, B1i=st.B1i, B2i=st.B2i, B3i=B3i)
