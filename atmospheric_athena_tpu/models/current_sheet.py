"""Current sheet test (reference: src/prob/current_sheet.c).

2D adiabatic MHD in a doubly-periodic box: uniform d=1, P=beta, By=+1
except By=−1 in the strip 0.5 < x1 < 1.5 (two current sheets), perturbed
by Vx = uflow·cos(π x2) (current_sheet.c:38-77).  Magnetic islands grow
on the sheets by reconnection; total energy decays monotonically.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .. import state as state_mod
from ..config import GridConfig, SimConfig
from ..defs import ID, IEN, IM1
from . import register


@register("current_sheet")
class CurrentSheet:
    sim_overrides = dict(gas="mhd")

    def __init__(self, par, sim: SimConfig, grid: GridConfig):
        if grid.ndim != 2:
            raise ValueError("[current_sheet]: 2D only")

    def init(self, par, sim: SimConfig, grid: GridConfig):
        dtype = sim.jnp_dtype()
        st = state_mod.zeros(sim, grid)
        uflow = par.getd("problem", "uflow")
        beta = par.getd("problem", "beta")

        x1 = np.asarray(grid.cc_coords(0))[None, None, :]
        x2 = np.asarray(grid.cc_coords(1))[None, :, None]
        shape = grid.padded_shape()
        x1, x2 = (np.broadcast_to(a, shape) for a in (x1, x2))

        By = np.where((x1 > 0.5) & (x1 < 1.5), -1.0, 1.0)
        vx = uflow * np.cos(math.pi * x2)
        E = (beta / sim.gamma_1 if sim.adiabatic else 0.0) \
            + 0.5 * By * By + 0.5 * vx * vx

        bb = lambda a: jnp.asarray(a, dtype)
        U = st.U
        U = U.at[ID].set(1.0)
        U = U.at[IM1].set(bb(vx))
        if sim.adiabatic:
            U = U.at[IEN].set(bb(E))
        Bcc = st.Bcc.at[1].set(bb(By))
        return st.replace(
            U=U, Bcc=Bcc,
            B1i=jnp.zeros(shape, dtype),
            B2i=bb(By),
            B3i=jnp.zeros(shape, dtype))
