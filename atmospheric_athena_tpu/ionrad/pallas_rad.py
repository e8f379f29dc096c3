"""Fused Pallas TPU kernels for the radiation sub-cycle.

The jnp sub-cycle body (driver.ion_radtransfer) costs ~5 ms/iteration at
256^3 f32 on a v5e — and the production deck runs up to 10000 sub-iterations
per hydro step (ionrad maxiter), so the per-iteration cost dominates the
whole simulation.  XLA materializes dozens of intermediates per iteration
(attenuation scan passes, chemistry temps); these kernels fuse each
iteration into two VMEM-resident passes separated only by the global
dt = min(dt_chem, dt_therm) reduction the algorithm requires
(ionrad_3d.c:941-954):

  K_rates  — plane attenuation sweep (in-VMEM cumulative product along x),
             chemistry + thermal rates via driver.rates_percell, per-block
             partial minima of the rate timesteps.
  K_update — explicit update + floors via driver.update_percell, the
             check_range violation count, and the compute_dt_hydro CFL
             per-cell maxima, all as per-block partials.

Both kernels call the SAME per-cell physics functions as the jnp path
(driver.rates_percell / update_percell / dti_percell), so the two paths are
formula-identical; the block-wise min/max/sum partials recombine exactly
(min/max associativity) — tests/test_pallas.py asserts bitwise equality in
interpreter mode.

Scope (supported()): single radplane, dir = -1 (the production
configuration, prob/ioniz_sphere.c:143-161), 3D grid, hydro or MHD.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import GridConfig, SimConfig
from .config import MINFLUXFRAC, IonConfig


def _by(NY: int) -> int:
    """Largest row-tile that divides NY and is a multiple of 8 (<= 64)."""
    for b in (64, 32, 16, 8):
        if NY % b == 0:
            return b
    return 0


def supported(sim: SimConfig, grid: GridConfig, ion: IonConfig) -> bool:
    return (sim.pallas_enabled
            and len(ion.radplanes) == 1
            and ion.radplanes[0][0] == -1
            and all(grid.active(a) for a in range(3))
            and grid.Nx[1] % 8 == 0 and _by(grid.Nx[1]) > 0)


def _cumprod_lanes(x):
    """Cumulative product along the last axis via a Hillis-Steele log-step
    scan (Mosaic has no cumprod primitive).  Reassociates the product —
    differs from the sequential scan by O(n·eps) relative rounding, well
    inside the algorithm's tolerance (the attenuation is already a chain
    of rounded exponentials)."""
    n = x.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    k = 1
    while k < n:
        shifted = jnp.roll(x, k, axis=-1)
        x = x * jnp.where(idx >= k, shifted, jnp.ones_like(x))
        k *= 2
    return x


def _sweep_x(s0, Fin, dx1, cell_len, ion: IonConfig):
    """dir=-1 plane sweep on a (by, NX) block — the axis-0 ascending case of
    plane.get_ph_rate_plane, with the cumulative product in VMEM."""
    n_H = s0 / ion.m_H
    tau = ion.sigma_ph * n_H * dx1
    etau = jnp.exp(-tau)
    T_incl = _cumprod_lanes(etau)
    ones = jnp.ones_like(T_incl[..., :1])
    T_faces = jnp.concatenate([ones, T_incl], axis=-1)
    F_faces = Fin * T_faces
    frac = F_faces / (Fin + 1e-12)
    n = s0.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, frac.shape, frac.ndim - 1)
    alive = (idx == 0) | (frac >= MINFLUXFRAC)
    kph = alive[..., :n] * F_faces[..., :n] * (1.0 - etau) / (n_H * cell_len)
    eflux = jnp.where(alive, F_faces, 0.0)
    return kph, eflux


def _rates_kernel(scal_ref, s0_ref, E_ref, d_ref, kebe_ref, lsn_ref,
                  scn_ref, dnlim_ref,
                  kph_ref, nHdot_ref, edot_ref, nsn_ref, ncn_ref,
                  eflux_ref, dtc_ref, dtt_ref, *,
                  sim: SimConfig, ion: IonConfig, dx1, cell_len):
    from . import driver
    Fin = scal_ref[0, 0]
    s0 = s0_ref[...][0]
    E = E_ref[...][0]
    d = d_ref[...][0]
    ke_be = kebe_ref[...][0]
    kph, eflux = _sweep_x(s0, Fin, dx1, cell_len, ion)
    nHdot, nsn, ncn, dtc_cell, edot, dtt_cell = driver.rates_percell(
        s0, E, d, ke_be, lsn_ref[...][0], scn_ref[...][0], kph,
        dnlim_ref[...][0], sim, ion)
    kph_ref[...] = kph[None]
    nHdot_ref[...] = nHdot[None]
    edot_ref[...] = edot[None]
    nsn_ref[...] = nsn[None]
    ncn_ref[...] = ncn[None]
    eflux_ref[...] = eflux[None]
    # per-block partials as broadcast (8,128) tiles — Mosaic's minimum
    # writable block; recombined with exact min/max/sum in the caller
    dtc_ref[...] = jnp.full(dtc_ref.shape, jnp.min(dtc_cell),
                            dtc_cell.dtype)
    dtt_ref[...] = jnp.full(dtt_ref.shape, jnp.min(dtt_cell),
                            dtt_cell.dtype)


def _update_kernel(scal_ref, s0_ref, E_ref, d_ref, kebe_ref, kph_ref,
                   nHdot_ref, edot_ref, dnlim_ref, M1_ref, M2_ref, M3_ref,
                   ei_ref, ethi_ref, xi_ref,
                   E2_ref, s02_ref, viol_ref, dti_ref, *,
                   sim: SimConfig, ion: IonConfig, grid: GridConfig):
    from . import driver
    dt = scal_ref[0, 0]
    d = d_ref[...][0]
    ke_be = kebe_ref[...][0]
    E2, s02, viol = driver.update_percell(
        s0_ref[...][0], E_ref[...][0], d, ke_be, nHdot_ref[...][0],
        edot_ref[...][0], kph_ref[...][0], dt, dnlim_ref[...][0],
        ei_ref[...][0], ethi_ref[...][0], xi_ref[...][0], sim, ion)
    M1, M2, M3 = M1_ref[...][0], M2_ref[...][0], M3_ref[...][0]
    dti = driver.dti_percell(None, E2, d, M1, M2, M3, sim, grid)
    E2_ref[...] = E2[None]
    s02_ref[...] = s02[None]
    viol_ref[...] = jnp.full(viol_ref.shape, jnp.sum(viol), viol.dtype)
    dti_ref[...] = jnp.full(dti_ref.shape, jnp.max(dti), dti.dtype)


def _specs(NX, by, nv_dtype_blocks, extra_lane=0):
    blk = (1, by, NX + extra_lane)
    imap = lambda i, j: (i, j, 0)
    return pl.BlockSpec(blk, imap)


def build(sim: SimConfig, grid: GridConfig, ion: IonConfig, d, ke_be,
          M1, M2, M3, e_init, e_th_init, x_init, d_nlim):
    """Returns (rates_fn, update_fn) closed over the per-step constants.

    rates_fn(s0, E, lsn, scn, Fin) ->
        (kph, nHdot, edot, nsn, ncn, eflux, dt_chem, dt_therm)
    update_fn(s0, E, kph, nHdot, edot, dt) ->
        (E2, s02, cellcount, dti_max)
    """
    NZ, NY, NX = d.shape
    by = _by(NY)
    grid_dims = (NZ, NY // by)
    interp = jax.default_backend() not in ("tpu",)
    dt_f = d.dtype

    smem = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                        memory_space=pltpu.SMEM)
    fld = _specs(NX, by, None)
    efl = _specs(NX, by, None, extra_lane=1)
    part = pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0))
    pshape = jax.ShapeDtypeStruct(grid_dims + (8, 128), dt_f)
    fshape = jax.ShapeDtypeStruct((NZ, NY, NX), dt_f)
    ishape = jax.ShapeDtypeStruct((NZ, NY, NX), jnp.int32)
    eshape = jax.ShapeDtypeStruct((NZ, NY, NX + 1), dt_f)

    rates_call = pl.pallas_call(
        functools.partial(_rates_kernel, sim=sim, ion=ion,
                          dx1=grid.dx[0], cell_len=grid.dx[0]),
        grid=grid_dims,
        in_specs=[smem] + [fld] * 4 + [fld] * 2 + [fld],
        out_specs=(fld, fld, fld, fld, fld, efl, part, part),
        out_shape=(fshape, fshape, fshape, ishape, ishape, eshape,
                   pshape, pshape),
        interpret=interp,
    )

    update_call = pl.pallas_call(
        functools.partial(_update_kernel, sim=sim, ion=ion, grid=grid),
        grid=grid_dims,
        in_specs=[smem] + [fld] * 14,
        out_specs=(fld, fld, part, part),
        out_shape=(fshape, fshape, pshape, pshape),
        interpret=interp,
    )

    def rates_fn(s0, E, lsn, scn, Fin):
        out = rates_call(jnp.asarray(Fin, dt_f).reshape(1, 1),
                         s0, E, d, ke_be, lsn, scn, d_nlim)
        kph, nHdot, edot, nsn, ncn, eflux, dtc_p, dtt_p = out
        return (kph, nHdot, edot, nsn, ncn, eflux,
                jnp.min(dtc_p[..., 0, 0]), jnp.min(dtt_p[..., 0, 0]))

    def update_fn(s0, E, kph, nHdot, edot, dt):
        out = update_call(jnp.asarray(dt, dt_f).reshape(1, 1),
                          s0, E, d, ke_be, kph, nHdot, edot, d_nlim,
                          M1, M2, M3, e_init, e_th_init, x_init)
        E2, s02, viol_p, dti_p = out
        return (E2, s02, jnp.sum(viol_p[..., 0, 0]),
                jnp.max(dti_p[..., 0, 0]))

    return rates_fn, update_fn
