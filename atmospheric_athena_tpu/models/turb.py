"""Driven/decaying turbulence (reference: src/prob/turb.c).

The reference's FFT-space forcing (Plimpton fftsrc + ran2 Gaussian
deviates) becomes jnp.fft + jax.random:

  generate — Gaussian complex amplitudes on the k-grid, band-limited to
      klow < |k|/dk < khigh with the ispect=1 power law
      ampl ∝ k^-((expo+2)/2) or the ispect=2 Gammie-Ostriker form
      k^3 exp(-4k/kpeak) (turb.c:140-186), DC zeroed, then the
      solenoidal projection v_k -= (k.v_k) k/k^2 (project, :191-249)
      and inverse FFTs to real dv fields.
  perturb  — density-weighted mean removed (zero net momentum change),
      then the energy normalization: solve (t1/2) s^2 + t2 s = de/dvol
      with t1 = sum d|dv|^2, t2 = sum M.dv, de = dedt*dt, and apply
      M += s*d*dv (turb.c:278-405) — the injected kinetic energy is
      EXACTLY de by construction.

Deviations (documented): the RNG is jax.random (threefry) keyed on the
cycle number, not ran2, so no bitwise goldens exist (the reference's
statistics are matched instead); driving regenerates the spectrum every
cycle (the dtdrive-interval regeneration is a special case with the
same statistics for dtdrive -> 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import state as state_mod
from ..config import GridConfig, SimConfig
from ..defs import ID, IEN, IM1
from . import register


def _solenoidal_field(key, grid: GridConfig, pars, dtype):
    """Real-space solenoidal velocity perturbation (generate + project +
    inverse FFT), unnormalized."""
    N = [grid.Nx[2], grid.Nx[1], grid.Nx[0]]      # (Nz, Ny, Nx)
    klow, khigh, kpeak, expo, ispect = pars
    ks = [np.fft.fftfreq(n, d=1.0 / n) for n in N]  # integer wavenumbers
    KZ = ks[0][:, None, None]
    KY = ks[1][None, :, None]
    KX = ks[2][None, None, :]
    kmag = np.sqrt(KX ** 2 + KY ** 2 + KZ ** 2)
    band = (kmag > klow) & (kmag < khigh)
    dkx = 2.0 * np.pi / (grid.xmax[0] - grid.xmin[0])
    q3 = kmag * dkx
    with np.errstate(divide="ignore", invalid="ignore"):
        if ispect == 1:
            spec = np.where(band, q3 ** (-(expo + 2.0) / 2.0), 0.0)
        else:
            spec = np.where(band, q3 ** 3 * np.exp(-4.0 * q3 /
                                                   (kpeak * dkx)), 0.0)
    spec = jnp.asarray(np.nan_to_num(spec), dtype)

    keys = jax.random.split(key, 6)
    shape = tuple(N)
    v_k = []
    for c in range(3):
        re = jax.random.normal(keys[2 * c], shape, dtype)
        im = jax.random.normal(keys[2 * c + 1], shape, dtype)
        v_k.append((re + 1j * im) * spec)

    # solenoidal projection: v -= (k.v) k/k^2
    k2 = jnp.asarray(np.maximum(kmag ** 2, 1.0), dtype)
    kxj, kyj, kzj = (jnp.asarray(K + 0.0 * kmag, dtype)
                     for K in (KX, KY, KZ))
    kdotv = kxj * v_k[0] + kyj * v_k[1] + kzj * v_k[2]
    v_k = [v - kdotv * kk / k2 for v, kk in zip(v_k, (kxj, kyj, kzj))]

    dv = [jnp.real(jnp.fft.ifftn(v)) for v in v_k]
    return dv            # [dvx, dvy, dvz], each (Nz, Ny, Nx)


def drive(state, sim: SimConfig, grid: GridConfig, dedt, pars, key, dt):
    """One forcing application (perturb, turb.c:278-405)."""
    sl = grid.interior()
    U = state.U
    d = U[(ID,) + sl]
    M = [U[(IM1 + c,) + sl] for c in range(3)]
    dv = _solenoidal_field(key, grid, pars, U.dtype)

    t0 = jnp.sum(d)
    dv = [v - jnp.sum(d * v) / t0 for v in dv]     # zero net momentum

    t1 = jnp.sum(d * (dv[0] ** 2 + dv[1] ** 2 + dv[2] ** 2))
    t2 = jnp.sum(M[0] * dv[0] + M[1] * dv[1] + M[2] * dv[2])
    dvol = float(np.prod([grid.dx[a] for a in range(3)]))
    de = dedt * dt
    aa = jnp.maximum(0.5 * t1, 1.0e-20)
    b = t2
    c = -de / dvol
    disc = jnp.sqrt(b * b - 4.0 * aa * c)
    s = jnp.where(b >= 0.0, (-2.0 * c) / (b + disc),
                  (-b + disc) / (2.0 * aa))

    # like the reference, only the momenta change (perturb touches no E:
    # turb.c:394-402 — the standard build is isothermal)
    Unew = U
    for cc in range(3):
        Unew = Unew.at[(IM1 + cc,) + sl].add(s * d * dv[cc])
    return state.replace(U=Unew)


@register("turb")
class Turb:
    """<problem> keys (turb.c:127-135): dedt, klow, khigh, kpeak, expo,
    ispect, idrive (0 driven / 1 decaying), d0, p0 (ambient state),
    rseed."""

    def __init__(self, par, sim: SimConfig, grid: GridConfig):
        self.par = par
        self.dedt = par.getd("problem", "dedt")
        self.pars = (par.getd_def("problem", "klow", 0.0),
                     par.getd_def("problem", "khigh", 1e30),
                     par.getd_def("problem", "kpeak", 2.0),
                     par.getd_def("problem", "expo", 2.0),
                     par.geti_def("problem", "ispect", 1))
        self.idrive = par.geti_def("problem", "idrive", 0)
        self.seed = par.geti_def("problem", "rseed", 1)

    def init(self, par, sim: SimConfig, grid: GridConfig):
        st = state_mod.zeros(sim, grid)
        d0 = par.getd_def("problem", "d0", 1.0)
        U = st.U.at[ID].set(d0)
        if sim.adiabatic:
            p0 = par.getd_def("problem", "p0", 1.0)
            U = U.at[IEN].set(p0 / sim.gamma_1)
        st = st.replace(U=U)
        if self.idrive == 1:
            # decaying: the whole dedt injected once at t=0
            st = drive(st, sim, grid, self.dedt, self.pars,
                       jax.random.PRNGKey(self.seed), 1.0)
        return st

    def userwork_in_loop(self, state, sim: SimConfig, grid: GridConfig):
        if self.idrive != 0:
            return state
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                 state.nstep)
        return drive(state, sim, grid, self.dedt, self.pars, key,
                     state.dt)
