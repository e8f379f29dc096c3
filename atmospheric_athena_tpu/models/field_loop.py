"""Field-loop advection problem (reference: src/prob/field_loop.c).

A weak magnetic loop (from the vector potential A3 = A0*(rad - r) inside
r < rad) advected by a uniform flow; the classic CT divergence-preservation
test.  The interface field comes from utils.vecpot_to_b_interface — the
TPU-native vecpot2b*i (utils.c) — so div(B) = 0 to roundoff at t=0 and CT
keeps it there.

<problem>: rad, amp, vflow [, drat=1], iprob=1 (the loop in the x1-x2
plane; other iprob orientations pending).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .. import state as state_mod
from ..config import GridConfig, SimConfig
from ..defs import ID, IEN, IM1
from ..utils.fields import compute_div_b, vecpot_to_b_interface
from . import register


@register("field_loop")
class FieldLoop:
    sim_overrides = {"gas": "mhd"}

    def __init__(self, par, sim: SimConfig, grid: GridConfig):
        self.par = par

    def init(self, par, sim: SimConfig, grid: GridConfig):
        dtype = sim.jnp_dtype()
        st = state_mod.zeros(sim, grid)
        rad = par.getd("problem", "rad")
        amp = par.getd("problem", "amp")
        vflow = par.getd("problem", "vflow")
        iprob = par.geti_def("problem", "iprob", 1)
        assert iprob == 1, "field_loop orientations beyond iprob=1 pending"

        def A3(x1, x2, x3):
            r = np.sqrt(x1 ** 2 + x2 ** 2)
            return amp * np.maximum(rad - r, 0.0)

        B1i, B2i, B3i = vecpot_to_b_interface((None, None, A3), grid)
        B1i = jnp.asarray(B1i, dtype)
        B2i = jnp.asarray(B2i, dtype)
        B3i = jnp.asarray(B3i, dtype)

        def cc(Bi, a):
            return 0.5 * (Bi + jnp.roll(Bi, -1, axis=2 - a)) \
                if grid.active(a) else Bi

        Bcc = jnp.stack([cc(B1i, 0), cc(B2i, 1), cc(B3i, 2)])

        # uniform flow along the domain diagonal (field_loop.c:120-138)
        diag = math.sqrt(sum((grid.xmax[a] - grid.xmin[a]) ** 2
                             for a in range(3) if grid.active(a)))
        sin_a = (grid.xmax[1] - grid.xmin[1]) / diag if grid.active(1) \
            else 0.0
        cos_a = (grid.xmax[0] - grid.xmin[0]) / diag
        d0 = 1.0
        U = st.U.at[ID].set(d0)
        U = U.at[IM1].set(d0 * vflow * cos_a)
        U = U.at[IM1 + 1].set(d0 * vflow * sin_a)
        if sim.adiabatic:
            P0 = 1.0
            ke = 0.5 * d0 * vflow ** 2
            me = 0.5 * (Bcc[0] ** 2 + Bcc[1] ** 2 + Bcc[2] ** 2)
            U = U.at[IEN].set(P0 / sim.gamma_1 + ke + me)
        return st.replace(U=U, Bcc=Bcc, B1i=B1i, B2i=B2i, B3i=B3i)
