"""Small fused Pallas utilities: whole-grid reductions.

max_dti_hydro — the CFL reduction (dt.py:max_dti, new_dt.c:32-198) as one
pass over U instead of XLA's materialized primitive-variable temps.  Per
(bz, by, NX) block it computes the per-axis per-block maxima of
|v_a| + c_s on interior cells; the caller combines them with exact
jnp.max (max is associative, so the result is bitwise equal to the jnp
path's global per-axis maxima)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..config import GridConfig, SimConfig
from ..defs import ID, IEN, IM1, TINY_NUMBER

_BZ, _BY = 8, 8



def _cparams():
    """Raise the scoped-VMEM soft limit: v5e has 128MiB of VMEM and the
    hires-level tiles (NX=328 pads to 384 lanes) need ~18-30MB of scoped
    scratch in the sweep kernels (the default soft limit is 16MB)."""
    if jax.default_backend() not in ("tpu",):
        return None
    from jax.experimental.pallas import tpu as _pltpu
    return _pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

def supported(sim: SimConfig, grid: GridConfig) -> bool:
    NZ, NY, NX = grid.padded_shape()
    return (sim.pallas_enabled and sim.gas == "hydro"
            and not sim.special_relativity
            and all(grid.active(a) for a in range(3))
            and NZ % _BZ == 0 and NY % _BY == 0)


def _kernel(U_ref, m0_ref, m1_ref, m2_ref, *, sim: SimConfig, lo, hi):
    U = U_ref[...]
    d = U[ID]
    di = 1.0 / d
    v = [U[IM1 + a] * di for a in range(3)]
    qsq = v[0] ** 2 + v[1] ** 2 + v[2] ** 2
    if sim.adiabatic:
        p = jnp.maximum(sim.gamma_1 * (U[IEN] - 0.5 * d * qsq),
                        TINY_NUMBER)
        asq = sim.gamma * p * di
    else:
        asq = sim.iso_csound2 * jnp.ones_like(di)
    cs = jnp.sqrt(asq)

    i = pl.program_id(0)
    j = pl.program_id(1)
    sh = d.shape
    zid = i * _BZ + jax.lax.broadcasted_iota(jnp.int32, sh, 0)
    yid = j * _BY + jax.lax.broadcasted_iota(jnp.int32, sh, 1)
    xid = jax.lax.broadcasted_iota(jnp.int32, sh, 2)
    interior = ((zid >= lo[2]) & (zid <= hi[2]) &
                (yid >= lo[1]) & (yid <= hi[1]) &
                (xid >= lo[0]) & (xid <= hi[0]))

    for a, ref in ((0, m0_ref), (1, m1_ref), (2, m2_ref)):
        mv = jnp.where(interior, jnp.abs(v[a]) + cs, 0.0)
        ref[...] = jnp.full(ref.shape, jnp.max(mv), mv.dtype)


def max_dti_hydro(U, sim: SimConfig, grid: GridConfig):
    """Returns max over interior cells and axes of (|v_a| + c_s)/dx_a,
    bitwise equal to dt.max_dti's jnp formulation."""
    nv, NZ, NY, NX = U.shape
    gz, gy = NZ // _BZ, NY // _BY
    blk = (nv, _BZ, _BY, NX)
    imap = lambda i, j: (0, i, j, 0)
    part = pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0))
    pshape = jax.ShapeDtypeStruct((gz, gy, 8, 128), U.dtype)
    lo = tuple(grid.lo(a) for a in range(3))
    hi = tuple(grid.hi(a) for a in range(3))
    m0, m1, m2 = pl.pallas_call(
        functools.partial(_kernel, sim=sim, lo=lo, hi=hi),
        grid=(gz, gy),
        in_specs=[pl.BlockSpec(blk, imap)],
        out_specs=(part, part, part),
        out_shape=(pshape,) * 3,
        interpret=jax.default_backend() not in ("tpu",),
        compiler_params=_cparams(),
    )(U)
    dti = jnp.zeros((), U.dtype)
    for a, m in ((0, m0), (1, m1), (2, m2)):
        dti = jnp.maximum(dti, jnp.max(m[..., 0, 0]) / grid.dx[a])
    return dti
