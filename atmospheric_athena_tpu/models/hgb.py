"""Hawley-Gammie-Balbus MRI shearing box (reference: src/prob/hgb.c).

3D unstratified shearing sheet: uniform density/pressure with random
pressure/velocity perturbations (ipert=1, the HGB default) or the
epicyclic/shwave variants, threaded by a zero-net-flux Bz ~ sin(kx x)
(ifield=1) or uniform/toroidal variants; tidal potential
UnstratifiedDisk = -q Omega^2 x^2 (hgb.c:573-581).

The random perturbations use a bit-exact port of the reference's ran2
(Numerical Recipes L'Ecuyer + Bays-Durham, hgb.c:519-552, seeded
iseed = -1 - (ixs + Nx1*(jxs + Nx2*kxs)) = -1 for the serial grid), with
the same per-cell draw order (4 draws per cell in k,j,i loop order), so
initial conditions match the reference bit-for-bit and golden
comparisons are possible despite the randomness.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .. import state as state_mod
from ..config import GridConfig, SimConfig
from ..defs import ID, IEN, IM1
from . import register


class _Ran2:
    """Exact NR ran2 (hgb.c:519-552), double precision."""
    IM1 = 2147483563
    IM2 = 2147483399
    AM = 1.0 / IM1
    IMM1 = IM1 - 1
    IA1 = 40014
    IA2 = 40692
    IQ1 = 53668
    IQ2 = 52774
    IR1 = 12211
    IR2 = 3791
    NTAB = 32
    NDIV = 1 + IMM1 // NTAB
    RNMX = 1.0 - np.finfo(np.float64).eps

    def __init__(self, idum):
        self.idum2 = 123456789
        self.iv = [0] * self.NTAB
        self.idum = max(1, -idum) if idum <= 0 else idum
        self.idum2 = self.idum
        for j in range(self.NTAB + 7, -1, -1):
            k = self.idum // self.IQ1
            self.idum = self.IA1 * (self.idum - k * self.IQ1) - k * self.IR1
            if self.idum < 0:
                self.idum += self.IM1
            if j < self.NTAB:
                self.iv[j] = self.idum
        self.iy = self.iv[0]

    def __call__(self):
        k = self.idum // self.IQ1
        self.idum = self.IA1 * (self.idum - k * self.IQ1) - k * self.IR1
        if self.idum < 0:
            self.idum += self.IM1
        k = self.idum2 // self.IQ2
        self.idum2 = self.IA2 * (self.idum2 - k * self.IQ2) - k * self.IR2
        if self.idum2 < 0:
            self.idum2 += self.IM2
        j = self.iy // self.NDIV
        self.iy = self.iv[j] - self.idum2
        self.iv[j] = self.idum
        if self.iy < 1:
            self.iy += self.IMM1
        t = self.AM * self.iy
        return self.RNMX if t > self.RNMX else t


@register("hgb")
class HGB:
    sim_overrides = dict(shearing_box=True)

    def __init__(self, par, sim: SimConfig, grid: GridConfig):
        self.par = par
        self.omega0 = par.getd_def("problem", "Omega", 1.0e-3)
        self.qshear = par.getd_def("problem", "qshear", 1.5)
        self.fargo = sim.fargo

    # tidal potential (UnstratifiedDisk, hgb.c:573-581); enrolled as the
    # step's static potential — the integrator's shearing branch applies
    # the Crank-Nicolson Coriolis+tidal momentum update instead of the
    # naive gradient for it
    def static_grav_pot(self, x1, x2, x3):
        # under FARGO the tidal potential is absorbed by the orbital
        # scheme: UnstratifiedDisk returns 0 (hgb.c:576-580 #ifndef)
        if self.fargo:
            return 0.0 * x1
        return -self.qshear * self.omega0 ** 2 * x1 ** 2

    def init(self, par, sim: SimConfig, grid: GridConfig):
        assert grid.active(1), "HGB needs a 2D/3D grid (hgb.c:91-93)"
        st = state_mod.zeros(sim, grid)
        den = 1.0
        # isothermal: pres stands in as d*cs^2 for B0 and the rv scale
        # (hgb.c:116-119)
        pres = par.getd("problem", "pres") if sim.adiabatic \
            else sim.iso_csound2
        amp = par.getd("problem", "amp")
        ipert = par.geti_def("problem", "ipert", 1)
        ifield = par.geti_def("problem", "ifield", 1)
        om, qsh = self.omega0, self.qshear
        beta = par.getd("problem", "beta") if sim.mhd else 1.0
        B0 = math.sqrt(2.0 * pres / beta)
        dir_sgn = 1.0 if par.getd_def("problem", "Bdir", 1) > 0 else -1.0

        Lx = grid.xmax[0] - grid.xmin[0]
        kx = 2.0 * math.pi / Lx * par.geti_def("problem", "nwx", 1)

        # amp is in sound-speed units for the epicycle/shwave tests
        # (hgb.c:169-173)
        if ipert in (2, 3):
            amp *= math.sqrt(sim.gamma * pres / den) if sim.adiabatic \
                else sim.iso_csound

        shp = grid.padded_shape()
        NZ, NY, NX = shp
        nz, ny, nx = grid.Nx[2], grid.Nx[1], grid.Nx[0]
        x1 = np.asarray(grid.cc_coords(0))
        lo = [grid.lo(a) for a in range(3)]

        rd = np.full((nz, ny, nx), den)
        rp = np.full((nz, ny, nx), pres)
        rv = np.zeros((3, nz, ny, nx))
        if ipert == 1:
            rng = _Ran2(-1)
            fac = 0.4 * math.sqrt(pres / den)
            for k in range(nz):
                for j in range(ny):
                    for i in range(nx):
                        rval = amp * (rng() - 0.5)
                        if sim.adiabatic:
                            rp[k, j, i] = pres * (1.0 + 2.0 * rval)
                        else:
                            rd[k, j, i] = den * (1.0 + 2.0 * rval)
                        for c in range(3):
                            rval = amp * (rng() - 0.5)
                            rv[c, k, j, i] = fac * rval
        elif ipert == 2:
            rv[0] = amp
        elif ipert == 3:
            Ly = grid.xmax[1] - grid.xmin[1]
            ky = 2.0 * math.pi / Ly * par.geti_def("problem", "nwy", 1)
            x1a = x1[lo[0]:lo[0] + nx].reshape(1, 1, -1)
            x2a = np.asarray(grid.cc_coords(1))[lo[1]:lo[1] + ny] \
                .reshape(1, -1, 1)
            ph = kx * x1a + ky * x2a
            rv[0] = amp * np.sin(ph)
            rv[1] = -amp * (kx / ky) * np.sin(ph)
        else:
            raise NotImplementedError(f"hgb ipert={ipert}")

        # background shear (skipped with FARGO, hgb.c:297-299)
        x1a = x1[lo[0]:lo[0] + nx].reshape(1, 1, -1)
        M1 = rd * rv[0]
        M2 = rd * rv[1]
        if not sim.fargo:
            M2 = M2 - rd * (qsh * om * x1a)
        M3 = rd * rv[2]
        E = rp / sim.gamma_1 + 0.5 * (M1 ** 2 + M2 ** 2 + M3 ** 2) / rd

        inz = slice(lo[2], lo[2] + nz)
        iny = slice(lo[1], lo[1] + ny)
        inx = slice(lo[0], lo[0] + nx)
        U = st.U
        U = U.at[ID, inz, iny, inx].set(rd)
        U = U.at[IM1, inz, iny, inx].set(M1)
        U = U.at[IM1 + 1, inz, iny, inx].set(M2)
        U = U.at[IM1 + 2, inz, iny, inx].set(M3)
        kw = {}
        if sim.mhd:
            b1 = np.zeros(shp)
            b2 = np.zeros(shp)
            b3 = np.zeros(shp)
            x1g = x1.reshape(1, 1, -1)
            if ifield == 1:
                b3 += B0 * np.sin(kx * x1g)
            elif ifield == 2:
                b3 += B0 * dir_sgn
            elif ifield == 3:
                b2 += B0 * np.cos(kx * x1g)
                b3 += B0 * np.sin(kx * x1g)
            elif ifield == 4:
                b2 += B0 / math.sqrt(2.0)
                b3 += B0 / math.sqrt(2.0)
            else:
                raise NotImplementedError(f"hgb ifield={ifield}")
            B1i = jnp.asarray(b1, st.U.dtype)
            B2i = jnp.asarray(b2, st.U.dtype)
            B3i = jnp.asarray(b3, st.U.dtype)
            B1c = 0.5 * (b1 + np.roll(b1, -1, axis=2))
            B2c = 0.5 * (b2 + np.roll(b2, -1, axis=1))
            B3c = 0.5 * (b3 + np.roll(b3, -1, axis=0))
            Bcc = jnp.asarray(np.stack([B1c, B2c, B3c]), st.U.dtype)
            E = E + 0.5 * (np.asarray(Bcc[0])[inz, iny, inx] ** 2 +
                           np.asarray(Bcc[1])[inz, iny, inx] ** 2 +
                           np.asarray(Bcc[2])[inz, iny, inx] ** 2)
            kw = dict(Bcc=Bcc, B1i=B1i, B2i=B2i, B3i=B3i)
        if sim.adiabatic:
            U = U.at[IEN, inz, iny, inx].set(E)
        return st.replace(U=U, **kw)
