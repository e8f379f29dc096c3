"""Linear wave convergence problem (reference: src/prob/linear_wave1d.c).

A sinusoidal perturbation along an eigenvector of the Roe matrix
(d0=1, p0=1/Γ, u0=vflow·cs; MHD adds bx0=1, by0=√2, bz0=0.5,
linear_wave1d.c:82-94) is advected for whole periods; the L1 error against
the initial condition measures the scheme's convergence order — this is
the reference's primary regression harness (tst/1D-hydro/run.linear_wave1d).
Waves along x1 only (the 2d/3d oblique versions are round-2 items).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .. import state as state_mod
from ..config import GridConfig, SimConfig
from ..defs import ID, IEN, IM1
from ..ops import eigen
from . import register


@register("linear_wave")
@register("linear_wave1d")
class LinearWave:
    def __init__(self, par, sim: SimConfig, grid: GridConfig):
        self.wave_flag = par.geti("problem", "wave_flag")
        self.amp = par.getd("problem", "amp")
        self.vflow = par.getd("problem", "vflow")

    def init(self, par, sim: SimConfig, grid: GridConfig):
        st = state_mod.zeros(sim, grid)
        d0 = 1.0
        p0 = 1.0 / sim.gamma if sim.adiabatic else None
        if sim.adiabatic:
            u0 = self.vflow * math.sqrt(sim.gamma * p0 / d0)
        else:
            u0 = self.vflow * sim.iso_csound
        v0 = w0 = 0.0
        bx0, by0, bz0 = 1.0, math.sqrt(2.0), 0.5

        z = jnp.zeros(())
        if sim.gas == "hydro":
            if sim.adiabatic:
                h0 = ((p0 / sim.gamma_1 + 0.5 * d0 * u0 ** 2) + p0) / d0
                ev, rem, _ = eigen.esys_roe_adb_hyd(
                    z + u0, z + v0, z + w0, z + h0, sim)
            else:
                ev, rem, _ = eigen.esys_roe_iso_hyd(
                    z + u0, z + v0, z + w0, sim)
        else:
            from ..ops import eigen_mhd_roe
            pb = 0.5 * (bx0 ** 2 + by0 ** 2 + bz0 ** 2)
            if sim.adiabatic:
                h0 = ((p0 / sim.gamma_1 + pb + 0.5 * d0 * u0 ** 2)
                      + (p0 + pb)) / d0
                ev, rem, _ = eigen_mhd_roe.esys_roe_adb_mhd(
                    z + d0, z + u0, z + v0, z + w0, z + h0, z + bx0,
                    z + by0, z + bz0, z + 0.0, z + 1.0, sim)
            else:
                ev, rem, _ = eigen_mhd_roe.esys_roe_iso_mhd(
                    z + d0, z + u0, z + v0, z + w0, z + bx0, z + by0,
                    z + bz0, z + 0.0, z + 1.0, sim)
        self.ev = [float(e) for e in ev]
        r = [float(rem[n][self.wave_flag])
             if not isinstance(rem[n][self.wave_flag], float)
             else rem[n][self.wave_flag] for n in range(sim.nwave)]

        x1 = jnp.asarray(np.asarray(grid.cc_coords(0)), st.U.dtype)
        sinkx = jnp.broadcast_to(jnp.sin(2.0 * math.pi * x1)[None, None, :],
                                 grid.padded_shape())
        amp = self.amp
        U = st.U
        U = U.at[ID].set(d0 + amp * sinkx * r[0])
        U = U.at[IM1].set(d0 * u0 + amp * sinkx * r[1])
        U = U.at[IM1 + 1].set(amp * sinkx * r[2])
        U = U.at[IM1 + 2].set(amp * sinkx * r[3])
        kw = {}
        if sim.mhd:
            nw = sim.nwave
            B2 = by0 + amp * sinkx * r[nw - 2]
            B3 = bz0 + amp * sinkx * r[nw - 1]
            Bcc = st.Bcc.at[0].set(bx0).at[1].set(B2).at[2].set(B3)
            kw = dict(Bcc=Bcc, B1i=Bcc[0], B2i=Bcc[1], B3i=Bcc[2])
            if sim.adiabatic:
                E0 = (p0 / sim.gamma_1 + 0.5 * d0 * u0 ** 2
                      + 0.5 * (bx0 ** 2 + by0 ** 2 + bz0 ** 2))
                U = U.at[IEN].set(E0 + amp * sinkx * r[4])
        elif sim.adiabatic:
            E0 = p0 / sim.gamma_1 + 0.5 * d0 * u0 ** 2
            U = U.at[IEN].set(E0 + amp * sinkx * r[4])
        iscal = 5 if sim.adiabatic else 4
        for n in range(sim.nscalars):
            U = U.at[iscal + n].set(amp * (1.0 + sinkx))
        self._U0 = U
        return st.replace(U=U, **kw)

    def l1_errors(self, state, sim: SimConfig, grid: GridConfig):
        """L1 error per variable vs the initial condition
        (Userwork_after_loop pattern, linear_wave1d.c)."""
        sl = (slice(None),) + grid.interior()
        diff = jnp.abs(state.U[sl] - self._U0[sl])
        n = diff[0].size
        return [float(jnp.sum(diff[k])) / n for k in range(diff.shape[0])]
