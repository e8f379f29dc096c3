"""Fused Pallas TPU kernels for the radiation sub-cycle.

The jnp sub-cycle body (driver.ion_radtransfer) materializes dozens of
intermediates per iteration at 256^3 f32 — and the production deck runs up
to 10000 sub-iterations per hydro step (ionrad maxiter), so per-iteration
HBM traffic dominates the whole simulation.  Each iteration becomes two
VMEM-resident passes separated only by the global dt = min(dt_chem,
dt_therm) reduction the algorithm requires (ionrad_3d.c:941-954):

  K_rates  — plane attenuation sweep (in-VMEM cumulative product along x),
             chemistry + thermal rates via driver.rates_percell, per-block
             partial minima of the rate timesteps.
  K_update — explicit update + floors via driver.update_percell, the
             check_range violation count, and the compute_dt_hydro CFL
             per-cell maxima as per-block partials.  (The chemistry is
             transcendental-heavy — pow/exp per cell — so the kernels are
             VPU-bound, and recomputing the rates here instead of passing
             kph/nHdot/edot through HBM was measured SLOWER: +0.7 ms/iter
             of recompute vs ~0.5 ms/iter of field round-trips at 256^3.)

Traffic-shaving details:
  - the oscillation-damping state (last_sign, sign_count) rides the carry
    as ONE packed int32 (count*4 + sign+1) instead of two fields;
  - the per-cell CFL needs only max_a|M_a| and M^2 (precomputed once per
    hydro step as Mmax/Msq), not the three momentum fields, when all
    active dx are equal (the production cubic-cell case) — the values are
    bitwise identical to dti_percell's because x*di is monotone in x.

Both kernels call the SAME per-cell physics functions as the jnp path
(driver.rates_percell / update_percell / dti_percell), so the two paths
are formula-identical; the block-wise min/max/sum partials recombine
exactly (min/max associativity) — tests/test_pallas.py asserts bitwise
equality in interpreter mode.

Scope (supported()): single radplane, dir = -1 (the production
configuration, prob/ioniz_sphere.c:143-161), 3D hydro grid.  SMR fine
levels are covered too: the per-column parent-EdgeFlux inlet
(smr.child_inlet_flux) enters as a lane-broadcast (Nz, Ny, 128) field
instead of the scalar ramped flux.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import GridConfig, SimConfig
from ..defs import TINY_NUMBER
from .config import MINFLUXFRAC, IonConfig



def _cparams():
    """Raise the scoped-VMEM soft limit: v5e has 128MiB of VMEM and the
    hires-level tiles (NX=328 pads to 384 lanes) need ~18-30MB of scoped
    scratch in the sweep kernels (the default soft limit is 16MB)."""
    if jax.default_backend() not in ("tpu",):
        return None
    from jax.experimental.pallas import tpu as _pltpu
    return _pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

def _by(NY: int) -> int:
    """Largest row-tile that divides NY and is a multiple of 8 (<= 64)."""
    for b in (64, 32, 16, 8):
        if NY % b == 0:
            return b
    return 0


def supported(sim: SimConfig, grid: GridConfig, ion: IonConfig) -> bool:
    return (sim.pallas_enabled
            and not sim.mhd
            and len(ion.radplanes) == 1
            and ion.radplanes[0][0] == -1
            and all(grid.active(a) for a in range(3))
            and grid.dx[0] == grid.dx[1] == grid.dx[2]
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


def _unpack(code):
    return code % 4 - 1, code // 4


def _pack(sign, count):
    return count * 4 + (sign + 1)


def _aux(d, Msq, sim, ion):
    """Recompute the per-cell constants from d and Msq = M1^2+M2^2+M3^2 —
    bitwise equal to the driver's (hydro) ke_be and _d_nlim expressions,
    trading a VPU op for an HBM field read each."""
    from .config import IONFRACFLOOR
    ke_be = 0.5 * Msq / d
    d_nlim = jnp.minimum(d * IONFRACFLOOR, ion.d_nlo)
    return ke_be, d_nlim


def _rates_core(s0, E, code, d, Msq, Fin, sim, ion, dx1):
    """Shared by both kernels: sweep + chemistry/thermal rates."""
    from . import driver
    ke_be, d_nlim = _aux(d, Msq, sim, ion)
    lsn, scn = _unpack(code)
    kph, eflux = _sweep_x(s0, Fin, dx1, dx1, ion)
    nHdot, nsn, ncn, dtc_cell, edot, dtt_cell = driver.rates_percell(
        s0, E, d, ke_be, lsn, scn, kph, d_nlim, sim, ion)
    return kph, eflux, nHdot, edot, nsn, ncn, dtc_cell, dtt_cell


def _rates_kernel(scal_ref, s0_ref, E_ref, code_ref, d_ref, Msq_ref,
                  *refs, sim: SimConfig, ion: IonConfig, dx1,
                  with_inlet: bool):
    if with_inlet:
        inlet_ref = refs[0]
        refs = refs[1:]
        Fin = inlet_ref[...][0][..., :1]   # (by, 1) per-column inlet
    else:
        Fin = scal_ref[0, 0]
    (ncode_ref, eflux_ref, kph_ref, nHdot_ref, edot_ref,
     dtc_ref, dtt_ref) = refs
    (kph, eflux, nHdot, edot, nsn, ncn, dtc_cell,
     dtt_cell) = _rates_core(s0_ref[...][0], E_ref[...][0],
                             code_ref[...][0], d_ref[...][0],
                             Msq_ref[...][0], Fin, sim, ion, dx1)
    ncode_ref[...] = _pack(nsn, ncn)[None]
    eflux_ref[...] = eflux[None]
    kph_ref[...] = kph[None]
    nHdot_ref[...] = nHdot[None]
    edot_ref[...] = edot[None]
    # per-block partials as broadcast (8,128) tiles — Mosaic's minimum
    # writable block; recombined with exact min/max in the caller
    dtc_ref[...] = jnp.full(dtc_ref.shape, jnp.min(dtc_cell),
                            dtc_cell.dtype)
    dtt_ref[...] = jnp.full(dtt_ref.shape, jnp.min(dtt_cell),
                            dtt_cell.dtype)


def _update_kernel(scal_ref, s0_ref, E_ref, d_ref, Msq_ref, Mmax_ref,
                   kph_ref, nHdot_ref, edot_ref, ei_ref, xi_ref,
                   E2_ref, s02_ref, viol_ref, dti_ref, *,
                   sim: SimConfig, ion: IonConfig, dx1):
    from . import driver
    dt = scal_ref[0, 0]
    s0 = s0_ref[...][0]
    E = E_ref[...][0]
    d = d_ref[...][0]
    Msq = Msq_ref[...][0]
    ke_be, d_nlim = _aux(d, Msq, sim, ion)
    ei = ei_ref[...][0]
    ethi = ei - ke_be   # bitwise: driver._temp's e_th = E0_floored - ke_be
    E2, s02, viol = driver.update_percell(
        s0, E, d, ke_be, nHdot_ref[...][0], edot_ref[...][0],
        kph_ref[...][0], dt, d_nlim, ei, ethi, xi_ref[...][0], sim, ion)

    # compute_dt_hydro with precomputed max_a|M_a| / M^2: bitwise equal to
    # dti_percell for equal dx (driver docstring / module docstring)
    di = 1.0 / d
    qsq = Msq * di * di
    if sim.adiabatic:
        p = jnp.maximum(sim.gamma_1 * (E2 - 0.5 * d * qsq), TINY_NUMBER)
        asq = sim.gamma * p * di
    else:
        asq = jnp.full_like(E2, sim.iso_csound ** 2)
    dti = (Mmax_ref[...][0] * di + jnp.sqrt(asq)) / dx1

    E2_ref[...] = E2[None]
    s02_ref[...] = s02[None]
    viol_ref[...] = jnp.full(viol_ref.shape, jnp.sum(viol), viol.dtype)
    dti_ref[...] = jnp.full(dti_ref.shape, jnp.max(dti), dti.dtype)


def build(sim: SimConfig, grid: GridConfig, ion: IonConfig, d, ke_be,
          M1, M2, M3, e_init, e_th_init, x_init, d_nlim, inlet=None):
    """Returns (rates_fn, update_fn) closed over the per-step constants.

    rates_fn(s0, E, code, Fin) ->
        (ncode, eflux, kph, nHdot, edot, dt_chem, dt_therm)
    update_fn(s0, E, kph, nHdot, edot, dt) -> (E2, s02, cellcount, dti_max)
    with `code` the packed (last_sign, sign_count) int32 carry.  With
    `inlet` (an (Nz, Ny) per-column array, the SMR fine-level mode) the
    scalar Fin argument of rates_fn is ignored.
    """
    NZ, NY, NX = d.shape
    by = _by(NY)
    grid_dims = (NZ, NY // by)
    interp = jax.default_backend() not in ("tpu",)
    dt_f = d.dtype
    dx1 = grid.dx[0]

    # per-step precomputes for the CFL stop criterion (see module doc)
    Mmax = jnp.maximum(jnp.abs(M1), jnp.maximum(jnp.abs(M2), jnp.abs(M3)))
    Msq = M1 ** 2 + M2 ** 2 + M3 ** 2

    blk = (1, by, NX)
    imap = lambda i, j: (i, j, 0)
    fld = pl.BlockSpec(blk, imap)
    efl = pl.BlockSpec((1, by, NX + 1), imap)
    part = pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0))
    pshape = jax.ShapeDtypeStruct(grid_dims + (8, 128), dt_f)
    fshape = jax.ShapeDtypeStruct((NZ, NY, NX), dt_f)
    ishape = jax.ShapeDtypeStruct((NZ, NY, NX), jnp.int32)
    eshape = jax.ShapeDtypeStruct((NZ, NY, NX + 1), dt_f)

    def smem(n):
        return pl.BlockSpec((1, n), lambda i, j: (0, 0),
                            memory_space=pltpu.SMEM)

    with_inlet = inlet is not None
    if with_inlet:
        # per-column inlet broadcast over 128 lanes so the block tiles
        # (child_inlet_flux carries a trailing singleton sweep axis)
        inlet_b = jnp.broadcast_to(
            jnp.asarray(inlet, dt_f).reshape(NZ, NY)[..., None],
            (NZ, NY, 128))
        inl_spec = [pl.BlockSpec((1, by, 128), imap)]
    else:
        inl_spec = []
    rates_call = pl.pallas_call(
        functools.partial(_rates_kernel, sim=sim, ion=ion, dx1=dx1,
                          with_inlet=with_inlet),
        grid=grid_dims,
        in_specs=[smem(1)] + [fld] * 5 + inl_spec,
        out_specs=(fld, efl, fld, fld, fld, part, part),
        out_shape=(ishape, eshape, fshape, fshape, fshape, pshape,
                   pshape),
        interpret=interp,
        compiler_params=_cparams(),
    )

    update_call = pl.pallas_call(
        functools.partial(_update_kernel, sim=sim, ion=ion, dx1=dx1),
        grid=grid_dims,
        in_specs=[smem(1)] + [fld] * 10,
        out_specs=(fld, fld, part, part),
        out_shape=(fshape, fshape, pshape, pshape),
        interpret=interp,
        compiler_params=_cparams(),
    )

    def rates_fn(s0, E, code, Fin):
        extra = (inlet_b,) if with_inlet else ()
        ncode, eflux, kph, nHdot, edot, dtc_p, dtt_p = rates_call(
            jnp.asarray(0.0 if Fin is None else Fin,
                        dt_f).reshape(1, 1),
            s0, E, code, d, Msq, *extra)
        return (ncode, eflux, kph, nHdot, edot,
                jnp.min(dtc_p[..., 0, 0]), jnp.min(dtt_p[..., 0, 0]))

    def update_fn(s0, E, kph, nHdot, edot, dt):
        E2, s02, viol_p, dti_p = update_call(
            jnp.asarray(dt, dt_f).reshape(1, 1),
            s0, E, d, Msq, Mmax, kph, nHdot, edot, e_init, x_init)
        return (E2, s02, jnp.sum(viol_p[..., 0, 0]),
                jnp.max(dti_p[..., 0, 0]))

    return rates_fn, update_fn
