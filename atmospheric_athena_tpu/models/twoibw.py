"""Two interacting blast waves (reference: src/prob/twoibw.c).

Woodward & Colella (1984): d=1, v=0, with P=1e3 for x<0.1, P=1e2 for
x>0.9, P=0.01 between, along shk_dir; reflecting walls.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import state as state_mod
from ..config import GridConfig, SimConfig
from ..defs import ID, IEN
from . import register


@register("twoibw")
class TwoIBW:
    def __init__(self, par, sim: SimConfig, grid: GridConfig):
        self.par = par

    def init(self, par, sim: SimConfig, grid: GridConfig):
        dtype = sim.jnp_dtype()
        st = state_mod.zeros(sim, grid)
        shk_dir = par.geti("problem", "shk_dir")
        if shk_dir < 1 or shk_dir > 3:
            raise ValueError(f"[twoibw]: shk_dir = {shk_dir}")
        axis = shk_dir - 1
        x = np.asarray(grid.cc_coords(axis))
        E = np.where(x < 0.1, 1.0e3 / sim.gamma_1,
                     np.where(x > 0.9, 1.0e2 / sim.gamma_1,
                              0.01 / sim.gamma_1))
        shape = grid.padded_shape()
        E = jnp.asarray(E, dtype).reshape(
            [-1 if d == 2 - axis else 1 for d in range(3)])
        U = st.U
        U = U.at[ID].set(jnp.ones(shape, dtype))
        U = U.at[IEN].set(jnp.broadcast_to(E, shape))
        return st.replace(U=U)
