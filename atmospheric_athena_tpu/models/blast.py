"""Spherical blast wave (reference: src/prob/blast.c).

Uniform ambient medium with an over-pressured (and optionally over-dense)
sphere of radius rin at the origin; MHD adds a uniform field at `angle` in
the x1-x2 plane (blast.c:40-92).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .. import state as state_mod
from ..config import GridConfig, SimConfig
from ..defs import ID, IEN
from . import register


@register("blast")
class Blast:
    def __init__(self, par, sim: SimConfig, grid: GridConfig):
        self.par = par

    def init(self, par, sim: SimConfig, grid: GridConfig):
        dtype = sim.jnp_dtype()
        st = state_mod.zeros(sim, grid)
        rin = par.getd("problem", "radius")
        pa = par.getd_def("problem", "pamb", 1.0)
        prat = par.getd_def("problem", "prat", 1.0)
        da = par.getd_def("problem", "damb", 1.0)
        drat = par.getd_def("problem", "drat", 1.0)

        xs = [np.asarray(grid.cc_coords(a), dtype) for a in range(3)]
        x1 = jnp.asarray(xs[0]).reshape(1, 1, -1)
        x2 = jnp.asarray(xs[1]).reshape(1, -1, 1)
        x3 = jnp.asarray(xs[2]).reshape(-1, 1, 1)
        rad = jnp.sqrt(x1 ** 2 + x2 ** 2 + x3 ** 2)
        rad = jnp.broadcast_to(rad, grid.padded_shape())
        inside = rad < rin

        d = jnp.where(inside, drat * da, da)
        U = st.U.at[ID].set(d)
        kw = {}
        pb = 0.0
        if sim.mhd:
            b0 = par.getd("problem", "b0")
            theta = math.pi / 180.0 * par.getd("problem", "angle")
            Bx = b0 * math.cos(theta)
            By = b0 * math.sin(theta)
            Bcc = st.Bcc.at[0].set(Bx)
            Bcc = Bcc.at[1].set(By)
            kw = dict(Bcc=Bcc, B1i=Bcc[0], B2i=Bcc[1], B3i=Bcc[2])
            pb = 0.5 * (Bx ** 2 + By ** 2)
        if sim.adiabatic:
            P = jnp.where(inside, prat * pa, pa)
            if sim.special_relativity:
                # SR total energy includes rest mass: use the SR
                # conversion (blast.c goes through the SR Prim_to_Cons)
                z = jnp.zeros_like(d)
                if sim.mhd:
                    from ..eos_sr import sr_mhd_prim1d_to_cons1d
                    W7 = jnp.stack([d, z, z, z, P,
                                    jnp.broadcast_to(By, d.shape),
                                    jnp.zeros_like(d)])
                    Usr = sr_mhd_prim1d_to_cons1d(W7, Bx, sim)
                else:
                    from ..eos_sr import sr_prim1d_to_cons1d
                    Usr = sr_prim1d_to_cons1d(
                        jnp.stack([d, z, z, z, P]), sim)
                U = U.at[ID].set(Usr[0])
                U = U.at[IEN].set(Usr[4])
            else:
                U = U.at[IEN].set(P / sim.gamma_1 + pb)
        return st.replace(U=U, **kw)
