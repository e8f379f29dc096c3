"""Pallas TPU kernels for the hot hydro CTU path.

The whole-grid JAX formulation of the CTU step (integrators/ctu3d.py)
materializes ~50 stacked intermediates per step in HBM; XLA's cost analysis
shows ~25 KB/cell moved at 256^3 against a ~1 KB/cell roofline.  These
kernels fuse the two bandwidth-dominant phases into single VMEM-resident
pipelines:

  sweep_lrflux  — steps 1-3 of integrate_3d_ctu.c (:202-524): EOS,
                  PLM/PPM characteristic reconstruction + CTU tracing,
                  dt/2 gravity kick, and the first-pass Riemann solve.
                  Reads U (+phi), writes (Ul, Ur, F): ~20 field-arrays of
                  HBM traffic instead of the hundreds XLA materializes.
  flux_pointwise — step 9 (:2292-2438): EOS + Riemann solve on the
                  transverse-corrected states, with the H-correction etah.
                  Pure pointwise: reads 13, writes 6.

Tiling strategy (TPU v5e, f32): each kernel instance holds the FULL sweep
axis in VMEM so every reconstruction/tracing stencil shift stays on-chip
(jnp.roll along a block-resident axis), and tiles the transverse dims.
The sweep axis is mapped to lanes (x-sweep) or sublanes (y/z-sweep); the
x dimension is always kept in the block's lane dim so HBM reads stay
contiguous.  Rolls wrap at the array edge, contaminating only cells whose
stencil leaves the grid — all inside the nghost=4 ghost region, which the
integrator never uses (same argument as the jnp path, ctu3d.py:16-23).

The kernels call the SAME reconstruction/EOS/Riemann modules as the jnp
path (ops/reconstruct.py, eos.py, ops/riemann.py) so there is one numerics
implementation; only the Roe HLLE-fallback `lax.cond` is replaced by a
branchless where-blend (identical values; riemann.roe(branchless=True)).
Equivalence is asserted by tests/test_pallas.py in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimConfig
from ..defs import ID
from ..eos import cons1d_to_prim1d, prim1d_to_cons1d
from . import reconstruct, riemann
from ..integrators.sweep import inv_perm, var_perm



def _cparams():
    """Raise the scoped-VMEM soft limit: v5e has 128MiB of VMEM and the
    hires-level tiles (NX=328 pads to 384 lanes) need ~18-30MB of scoped
    scratch in the sweep kernels (the default soft limit is 16MB)."""
    if jax.default_backend() not in ("tpu",):
        return None
    from jax.experimental.pallas import tpu as _pltpu
    return _pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

def _cdiv(a, b):
    return -(-a // b)


def _restack(X, perm):
    """Reorder the leading (variable) axis with static indices."""
    return jnp.stack([X[p] for p in perm])


def _add_at1(X, delta):
    """X.at[1].add(delta) via concatenate (robust under Mosaic)."""
    return jnp.concatenate([X[:1], (X[1] + delta)[None], X[2:]], axis=0)


def _sweep_spec(axis, shape, nv, by, bx):
    """(block_shape, index_map, grid) for a [nv, NZ, NY, NX] array so the
    full `axis` extent is in-block and x stays in lanes.

    Mosaic requires the last two block dims to be (mult of 8, mult of 128)
    or equal to the array dims; the z-sweep satisfies this by flattening
    (y, x) into a single lane dimension (layout no-op on the contiguous
    array) so z sits in sublanes at full extent."""
    NZ, NY, NX = shape
    if axis == 0:    # sweep along x: tile (z, y).  (A flattened-lane
        # variant — (nv, 1, 1, NY*NX) blocks like flux_sweep_df — hits a
        # Mosaic layout-offset assertion inside the PLM reconstruction
        # rolls on this toolchain, so the x-sweep keeps x-major tiles
        # and their 264->384 lane padding.)
        blk = (nv, 1, by, NX)
        grid = (NZ, _cdiv(NY, by))
        imap = lambda i, j: (0, i, j, 0)
    elif axis == 1:  # sweep along y: tile (z, x)
        blk = (nv, 1, NY, bx)
        grid = (NZ, _cdiv(NX, bx))
        imap = lambda i, j: (0, i, 0, j)
    else:            # sweep along z on [nv, NZ, NY*NX]: tile lanes
        blk = (nv, NZ, bx)
        grid = (_cdiv(NY * NX, bx),)
        imap = lambda j: (0, 0, j)
    return blk, imap, grid


def _squeeze_in(X, axis):
    """Drop the unit spatial dim of a sweep block; sweep ends at -1 (x) or
    -2 (y/z sweeps; z blocks are already 3D [nv, NZ, bx])."""
    if axis == 0:
        return X[:, 0], -1
    if axis == 1:
        return X[:, 0], -2
    return X, -2


def _unsqueeze_out(X, axis):
    if axis in (0, 1):
        return X[:, None]
    return X


def _sweep_kernel(dtodx_ref, U_ref, *refs, sim: SimConfig, axis: int,
                  with_grav: bool, with_df: bool = False):
    """steps 1-3: U -> (Ul, Ur, F), all in PHYSICAL variable order.

    with_df: emit (Ul, Ur, F_ID, dF) instead — the sweep axis is fully
    in-block, so the downstream consumers' flux difference
    dF = F(+1_axis) - F costs one in-VMEM roll here versus a
    block-neighbor view pair (a full extra HBM read of F) in EVERY
    consumer; only the density component F_ID is needed whole (gravity
    glue), so the other five F components never round-trip HBM."""
    if with_grav:
        phic_ref, phif_ref, *orefs = refs
    else:
        orefs = refs
    if with_df:
        Ul_ref, Ur_ref, Fid_ref, dF_ref = orefs
    else:
        Ul_ref, Ur_ref, F_ref = orefs
    dtodx = dtodx_ref[0, 0]
    perm = var_perm(axis, sim)
    ipm = inv_perm(perm)

    U, sdim = _squeeze_in(U_ref[...], axis)
    Up = _restack(U, perm)
    W = cons1d_to_prim1d(Up, None, sim)
    Wm, Wp_ = reconstruct.lr_states(W, None, dtodx, sim, axis=sdim)
    Wl = jnp.roll(Wp_, 1, axis=sdim)   # Wl[f] = Wplus[f-1]
    Wr = Wm

    if with_grav:
        phic = _squeeze_in(phic_ref[...][None], axis)[0][0]
        phif = _squeeze_in(phif_ref[...][None], axis)[0][0]
        # dt/2 kick (integrate_3d_ctu.c:318-342); sh(phic,-1) = roll +1
        dVl = dtodx * (phif - jnp.roll(phic, 1, axis=sdim))
        dVr = dtodx * (phic - phif)
        Wl = _add_at1(Wl, -dVl)
        Wr = _add_at1(Wr, -dVr)

    Ul = prim1d_to_cons1d(Wl, None, sim)
    Ur = prim1d_to_cons1d(Wr, None, sim)
    F = riemann.fluxes(Ul, Ur, Wl, Wr, None, sim, branchless=True)

    Ul_ref[...] = _unsqueeze_out(_restack(Ul, ipm), axis)
    Ur_ref[...] = _unsqueeze_out(_restack(Ur, ipm), axis)
    if with_df:
        Fphys = _restack(F, ipm)
        # dF[c] = F[c+1] - F[c]; the roll wraps at the block edge, so the
        # outermost cell holds garbage — inside the ghost region, never
        # read by interior updates (ctu3d.py:16-23 argument)
        dF = jnp.roll(Fphys, -1, axis=sdim) - Fphys
        Fid_ref[...] = _unsqueeze_out(Fphys[ID:ID + 1], axis)
        dF_ref[...] = _unsqueeze_out(dF, axis)
    else:
        F_ref[...] = _unsqueeze_out(_restack(F, ipm), axis)


def sweep_lrflux(U, phic, phif_a, dtodx, sim: SimConfig, axis: int,
                 by=None, bx=128, with_df=False):
    """Fused steps 1-3 along `axis`.  U, outputs: [nv, NZ, NY, NX] physical
    order.  phic/phif_a: [NZ, NY, NX] static-potential fields or None.
    Returns (Ul, Ur, F), or (Ul, Ur, F_ID, dF) with with_df (F_ID the
    density flux [NZ, NY, NX]; dF the in-sweep flux difference — see
    _sweep_kernel)."""
    shape = U.shape
    nv, NZ, NY, NX = shape
    with_grav = phic is not None
    if by is None:
        # scoped VMEM is 16MB: halve the row tile once the lane dim
        # paddings exceed two 128-lane tiles (NX>272 pads to 384+)
        by = 64 if NX <= 272 else 32
    by = min(by, NY)
    # z-sweep flattens (y,x) into lanes: bx tiles NY*NX, not NX (partial
    # last blocks are fine; bx itself must stay a multiple of 128)
    bx = min(bx, NX) if axis != 2 else min(bx, NY * NX)
    if axis == 2:  # flatten (y, x) into lanes — contiguous, no-op
        U = U.reshape(nv, NZ, NY * NX)
        if with_grav:
            phic = phic.reshape(NZ, NY * NX)
            phif_a = phif_a.reshape(NZ, NY * NX)
    blk, imap, grid = _sweep_spec(axis, (NZ, NY, NX), nv, by, bx)
    sblk = blk[1:]
    simap = (lambda j: imap(j)[1:]) if axis == 2 else \
        (lambda i, j: imap(i, j)[1:])
    smem = pl.BlockSpec((1, 1),
                        (lambda j: (0, 0)) if axis == 2 else
                        (lambda i, j: (0, 0)),
                        memory_space=pltpu.SMEM)

    in_specs = [smem, pl.BlockSpec(blk, imap)]
    args = [jnp.asarray(dtodx, U.dtype).reshape(1, 1), U]
    if with_grav:
        in_specs += [pl.BlockSpec(sblk, simap), pl.BlockSpec(sblk, simap)]
        args += [phic, phif_a]

    kern = functools.partial(_sweep_kernel, sim=sim, axis=axis,
                             with_grav=with_grav, with_df=with_df)
    if with_df:
        # outputs: Ul, Ur (nv blocks), F_ID (1-var block), dF (nv block)
        blk1 = (1,) + blk[1:]
        shape1 = (1,) + U.shape[1:]
        out_specs = (pl.BlockSpec(blk, imap), pl.BlockSpec(blk, imap),
                     pl.BlockSpec(blk1, imap), pl.BlockSpec(blk, imap))
        out_shape = (jax.ShapeDtypeStruct(U.shape, U.dtype),
                     jax.ShapeDtypeStruct(U.shape, U.dtype),
                     jax.ShapeDtypeStruct(shape1, U.dtype),
                     jax.ShapeDtypeStruct(U.shape, U.dtype))
    else:
        out_specs = tuple(pl.BlockSpec(blk, imap) for _ in range(3))
        out_shape = tuple(jax.ShapeDtypeStruct(U.shape, U.dtype)
                          for _ in range(3))
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
        compiler_params=_cparams(),
    )(*args)
    if with_df:
        Ul, Ur, Fid, dF = out
        if axis == 2:
            Ul = Ul.reshape(shape)
            Ur = Ur.reshape(shape)
            Fid = Fid.reshape((1,) + shape[1:])
            dF = dF.reshape(shape)
        return Ul, Ur, Fid[0], dF
    if axis == 2:
        out = tuple(o.reshape(shape) for o in out)
    return out


def _flux_kernel(Ul_ref, Ur_ref, *refs, sim: SimConfig,
                 axis: int, with_eta: bool):
    """step 9: (Ulc, Urc, etah) -> F2, physical order, pointwise."""
    if with_eta:
        eta_ref, F_ref = refs
    else:
        (F_ref,) = refs
    perm = var_perm(axis, sim)
    ipm = inv_perm(perm)

    Ul = _restack(Ul_ref[...][:, 0], perm)
    Ur = _restack(Ur_ref[...][:, 0], perm)
    Wl = cons1d_to_prim1d(Ul, None, sim)
    Wr = cons1d_to_prim1d(Ur, None, sim)
    etah = eta_ref[...][0] if with_eta else None
    F = riemann.fluxes(Ul, Ur, Wl, Wr, None, sim, etah=etah,
                       branchless=True)
    F_ref[...] = _restack(F, ipm)[:, None]


def flux_pointwise(Ulc, Urc, etah, sim: SimConfig, axis: int, by=None):
    """Fused step 9 Riemann solve on corrected states (pointwise)."""
    nv, NZ, NY, NX = Ulc.shape
    with_eta = etah is not None
    if by is None:
        by = 64 if NX <= 272 else 32
    by = min(by, NY)
    blk = (nv, 1, by, NX)
    sblk = (1, by, NX)
    grid = (NZ, _cdiv(NY, by))
    imap = lambda i, j: (0, i, j, 0)
    simap = lambda i, j: (i, j, 0)

    in_specs = [pl.BlockSpec(blk, imap), pl.BlockSpec(blk, imap)]
    args = [Ulc, Urc]
    if with_eta:
        in_specs.append(pl.BlockSpec(sblk, simap))
        args.append(etah)

    kern = functools.partial(_flux_kernel, sim=sim, axis=axis,
                             with_eta=with_eta)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(blk, imap),
        out_shape=jax.ShapeDtypeStruct(Ulc.shape, Ulc.dtype),
        interpret=_interpret(),
        compiler_params=_cparams(),
    )(*args)


def _fluxdf_kernel(Ul_ref, Ur_ref, dF_ref, Fid_ref, Fidr_ref, *,
                   sim: SimConfig, axis: int):
    """step 9 Riemann solve with sweep-axis-resident blocks, emitting the
    flux DIFFERENCE dF2 = F2(+1_axis) - F2 plus the density flux and its
    +1 shift (the only whole-F2 consumers downstream are the
    flux-difference update and the gravity glue's F2_ID terms, so F2
    itself never round-trips HBM; the in-block roll replaces a
    block-neighbor view pair in final_update)."""
    perm = var_perm(axis, sim)
    ipm = inv_perm(perm)
    Ulq, sdim = _squeeze_in(Ul_ref[...], axis)
    Urq, _ = _squeeze_in(Ur_ref[...], axis)
    Ul = _restack(Ulq, perm)
    Ur = _restack(Urq, perm)
    Wl = cons1d_to_prim1d(Ul, None, sim)
    Wr = cons1d_to_prim1d(Ur, None, sim)
    F = riemann.fluxes(Ul, Ur, Wl, Wr, None, sim, branchless=True)
    Fphys = _restack(F, ipm)
    dF = jnp.roll(Fphys, -1, axis=sdim) - Fphys
    dF_ref[...] = _unsqueeze_out(dF, axis)
    Fid_ref[...] = _unsqueeze_out(Fphys[ID:ID + 1], axis)
    Fidr_ref[...] = _unsqueeze_out(
        jnp.roll(Fphys[ID:ID + 1], -1, axis=sdim), axis)


def flux_sweep_df(Ulc, Urc, sim: SimConfig, axis: int, by=None, bx=128):
    """Fused step 9 on corrected states, sweep-style blocks (full `axis`
    extent in VMEM).  Returns (dF2, F2_ID, F2_IDr): the conservative
    flux difference along `axis`, the density flux, and its +1_axis
    shift.  No H-correction (caller falls back to flux_corrected)."""
    shape = Ulc.shape
    nv, NZ, NY, NX = shape
    if by is None:
        by = 64 if NX <= 272 else 32
    by = min(by, NY)
    bx = min(bx, NX) if axis != 2 else min(bx, NY * NX)
    if axis == 0:
        Ulc = Ulc.reshape(nv, NZ, 1, NY * NX)
        Urc = Urc.reshape(nv, NZ, 1, NY * NX)
    elif axis == 2:
        Ulc = Ulc.reshape(nv, NZ, NY * NX)
        Urc = Urc.reshape(nv, NZ, NY * NX)
    blk, imap, grid = _sweep_spec(axis, (NZ, NY, NX), nv, by, bx)
    blk1 = (1,) + blk[1:]
    shape1 = (1,) + Ulc.shape[1:]

    kern = functools.partial(_fluxdf_kernel, sim=sim, axis=axis)
    dF, Fid, Fidr = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(blk, imap), pl.BlockSpec(blk, imap)],
        out_specs=(pl.BlockSpec(blk, imap), pl.BlockSpec(blk1, imap),
                   pl.BlockSpec(blk1, imap)),
        out_shape=(jax.ShapeDtypeStruct(Ulc.shape, Ulc.dtype),
                   jax.ShapeDtypeStruct(shape1, Ulc.dtype),
                   jax.ShapeDtypeStruct(shape1, Ulc.dtype)),
        interpret=_interpret(),
        compiler_params=_cparams(),
    )(Ulc, Urc)
    if axis in (0, 2):
        dF = dF.reshape(shape)
        Fid = Fid.reshape((1,) + shape[1:])
        Fidr = Fidr.reshape((1,) + shape[1:])
    return dF, Fid[0], Fidr[0]


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (tests, CPU dry-runs)."""
    import jax
    return jax.default_backend() not in ("tpu",)


def supported(sim: SimConfig, grid) -> bool:
    """Pallas fast path covers the production configuration: 3D adiabatic
    hydro, characteristic PLM/PPM, Roe/HLLE/HLLC fluxes."""
    NZ, NY, NX = grid.padded_shape()
    return (sim.gas == "hydro"
            and all(grid.active(a) for a in range(3))
            and sim.order in ("1", "2", "3", "2p", "3p")
            and sim.flux in ("roe", "hlle", "hllc")
            and NY % 8 == 0)
