"""Shock-tube problem generator (reference: src/prob/shkset1d.c).

Left/right primitive states from <problem>, discontinuity at x=0 along
shk_dir, permuting vector components so the shock normal maps onto the
requested axis (shkset1d.c:104-230).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import state as state_mod
from ..config import GridConfig, SimConfig
from ..defs import ID, IEN, IM1
from ..eos import prim1d_to_cons1d
from . import register


@register("shkset1d")
class Shkset1D:
    def __init__(self, par, sim: SimConfig, grid: GridConfig):
        self.par = par

    def init(self, par, sim: SimConfig, grid: GridConfig):
        dtype = sim.jnp_dtype()
        st = state_mod.zeros(sim, grid)

        def prim_side(side):
            vals = [par.getd("problem", f"d{side}"),
                    par.getd("problem", f"v1{side}"),
                    par.getd("problem", f"v2{side}"),
                    par.getd("problem", f"v3{side}")]
            if sim.adiabatic:
                vals.append(par.getd("problem", f"p{side}"))
            Bx = 0.0
            if sim.mhd:
                Bx = par.getd("problem", f"b1{side}")
                vals.append(par.getd("problem", f"b2{side}"))
                vals.append(par.getd("problem", f"b3{side}"))
            for n in range(sim.nscalars):
                # deck convention r[0]l / s0l both appear; accept either
                if par.exist("problem", f"r[{n}]{side}"):
                    vals.append(par.getd("problem", f"r[{n}]{side}"))
                else:
                    vals.append(par.getd("problem", f"s{n}{side}"))
            return jnp.asarray(vals, dtype), Bx

        Wl, Bxl = prim_side("l")
        Wr, Bxr = prim_side("r")
        if sim.special_relativity and sim.mhd:
            from ..eos_sr import sr_mhd_prim1d_to_cons1d
            Ul = sr_mhd_prim1d_to_cons1d(Wl, jnp.asarray(Bxl, dtype), sim)
            Ur = sr_mhd_prim1d_to_cons1d(Wr, jnp.asarray(Bxr, dtype), sim)
        elif sim.special_relativity:
            from ..eos_sr import sr_prim1d_to_cons1d
            Ul = sr_prim1d_to_cons1d(Wl, sim)
            Ur = sr_prim1d_to_cons1d(Wr, sim)
        else:
            Ul = prim1d_to_cons1d(Wl, jnp.asarray(Bxl, dtype), sim)
            Ur = prim1d_to_cons1d(Wr, jnp.asarray(Bxr, dtype), sim)

        shk_dir = par.geti("problem", "shk_dir")
        axis = shk_dir - 1
        x = np.asarray(grid.cc_coords(axis))
        # broadcast mask over [Nz,Ny,Nx]
        shape = grid.padded_shape()
        mask = jnp.asarray(x <= 0.0).reshape(
            [-1 if d == 2 - axis else 1 for d in range(3)])
        mask = jnp.broadcast_to(mask, shape)

        # scatter 1D-slice components onto the state with the cyclic
        # permutation of shkset1d.c:104-230: Mx->M[axis] etc.
        a1, a2, a3 = axis, (axis + 1) % 3, (axis + 2) % 3
        U = st.U
        def sel(n):
            return jnp.where(mask, Ul[n], Ur[n])
        U = U.at[ID].set(sel(0))
        U = U.at[IM1 + a1].set(sel(1))
        U = U.at[IM1 + a2].set(sel(2))
        U = U.at[IM1 + a3].set(sel(3))
        if sim.adiabatic:
            U = U.at[IEN].set(sel(4))
        # scalars: U index = ib + n (cell-centered B lives outside U);
        # in the 1D-slice vectors they sit after the optional By/Bz pair
        ib = 5 if sim.adiabatic else 4
        iscal = ib + (2 if sim.mhd else 0)
        for n in range(sim.nscalars):
            U = U.at[ib + n].set(sel(iscal + n))

        kw = {}
        if sim.mhd:
            Bcc = st.Bcc
            Bcc = Bcc.at[a1].set(jnp.where(mask, Bxl, Bxr))
            Bcc = Bcc.at[a2].set(sel(ib))
            Bcc = Bcc.at[a3].set(sel(ib + 1))
            kw = dict(Bcc=Bcc, B1i=Bcc[0], B2i=Bcc[1], B3i=Bcc[2])
        return st.replace(U=U, **kw)
