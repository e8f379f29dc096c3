"""Pallas kernels for the CTU middle phases: transverse flux corrections
(steps 5-7) and the final conservative update (steps 11-12).

These are the two phases left in whole-grid JAX after pallas_hydro fused
steps 1-3 and 9; XLA materializes every jnp.roll of the [nvar, 264^3]
stacked arrays, which dominates the remaining step time.  Both phases have
only ±1-cell stencils, so they tile as (1, by, NX) blocks (x fully
in-block) with cell shifts along y and z assembled from *block-neighbor
operands*: for each shifted input the kernel receives the aligned block
plus the ±1-block along that axis and concatenates the boundary row.
Block indices are clamped at the array edge, so the only contaminated
cells are the outermost row/plane — inside the nghost=4 ghost region the
interior update never reads.

transverse_correct — per axis a (integrate_3d_ctu.c:971-1065 + the
    static-gravity cross terms :1160-1222):
        Ulc[a] = Ulp[a] - sum_b q_b·sh(dF_b, -1, a) - grav_l
        Urc[a] = Urp[a] - sum_b q_b·dF_b            - grav_r
    The Ul-side terms are exactly the Ur-side terms shifted -1 along a,
    so the kernel evaluates the same contribution expression on two
    offset views (0 and -1_a).

final_update — steps 11-12 (:2741-2782, :2975-3069): full-dt static
    gravity source at n+1/2 (mass-flux-weighted energy form) plus the
    conservative flux-difference update, with the active-interior splice
    applied in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import GridConfig, SimConfig
from ..defs import ID, IEN, IM1


def _by_of(NY: int) -> int:
    """Row tile: a multiple of 8 dividing NY (NY = N + 2*nghost = 8k+...).
    Kept small — these kernels take ~15 block operands, and VMEM must hold
    2x (double-buffered) copies of each.  Returns 0 if none exists (caller
    falls back to the jnp path)."""
    for b in (24, 16, 8):
        if NY % b == 0:
            return b
    return 0


def supported(grid: GridConfig) -> bool:
    """Opt-in (ATHENA_TPU_PALLAS_MID=1): these kernels are numerically
    validated (tests/test_pallas.py) and cut the remaining JAX-middle HBM
    traffic, but their ~15-operand block pipelines currently take Mosaic
    tens of minutes to compile on the remote TPU toolchain — unusable as a
    default until the block-neighbor operands are restructured (fewer
    operands via fused halo loads)."""
    import os
    if os.environ.get("ATHENA_TPU_PALLAS_MID", "0").lower() not in (
            "1", "on", "true"):
        return False
    NZ, NY, NX = grid.padded_shape()
    return _by_of(NY) > 0


def _mkspec(nv, by, NX, dzb, dyb, gz, gy, scalar=False):
    """BlockSpec for a (nv,1,by,NX) tile at block offset (dzb, dyb), clamped
    at the grid edge (garbage lands only in the outermost ghost row)."""
    def om(i, j):
        ii = jnp.clip(i + dzb, 0, gz - 1) if dzb else i
        jj = jnp.clip(j + dyb, 0, gy - 1) if dyb else j
        return (ii, jj, 0) if scalar else (0, ii, jj, 0)
    blk = (1, by, NX) if scalar else (nv, 1, by, NX)
    return pl.BlockSpec(blk, om)


def _shy(A, Bp):
    """sh(X, +1, y) on a (..., by, NX) tile: rows from A[1:] + Bp[0]."""
    return jnp.concatenate([A[..., 1:, :], Bp[..., :1, :]], axis=-2)


def _shym(A, Bm):
    """sh(X, -1, y): Bm[-1] + A[:-1]."""
    return jnp.concatenate([Bm[..., -1:, :], A[..., :-1, :]], axis=-2)


def _shx(X, k):
    """sh(X, k, x) in-block (wrap garbage stays in x ghosts)."""
    return jnp.roll(X, -k, axis=-1)


class _View:
    """Accessor giving per-cell-aligned tiles of each input at a fixed
    offset along the correction axis `a` (0 or -1), with optional +1 shifts
    along a transverse axis b.  Operand tiles are passed in as a dict
    keyed by (name, dz_cells, dy_cells)."""

    def __init__(self, ops, a, off):
        self.ops = ops   # dict[(name, dz, dy)] -> tile
        self.a = a
        self.off = off   # 0 or -1 along axis a

    def _get(self, name, dz, dy, shift_x=0):
        t = self.ops[(name, dz, dy)]
        return _shx(t, shift_x) if shift_x else t

    def at(self, name, plus_b=None):
        """Tile of `name` at offset self.off along a, +1 along plus_b."""
        dz = dy = sx = 0
        if self.off == -1:
            if self.a == 1:
                dy -= 1
            elif self.a == 2:
                dz -= 1
            else:
                sx -= 1
        if plus_b == 2:
            dz += 1
        elif plus_b == 1:
            dy += 1
        elif plus_b == 0:
            sx += 1
        # y shifts are cell-level: assemble from block neighbors
        if dy == 0:
            return self._get(name, dz, 0, sx)
        A = self._get(name, dz, 0, sx)
        B = self._get(name, dz, dy, sx)
        return _shy(A, B) if dy > 0 else _shym(A, B)


def _contrib(view: _View, a, axes, q, adiabatic, with_grav, nv):
    """Ur-side correction arrays (list per variable) evaluated on `view`
    (integrate_3d_ctu.c:984-1065, 1160-1222 in physical order)."""
    corr = None
    for b in axes:
        if b == a:
            continue
        Fb = view.at(f"F{b}")
        Fb1 = view.at(f"F{b}", plus_b=b)
        dFb = Fb1 - Fb
        c = q[b] * dFb
        corr = c if corr is None else corr + c
    extra = {}
    if with_grav:
        Ud = view.at("Ud")
        phic = view.at("phic")
        for b in axes:
            if b == a:
                continue
            phil = view.at(f"phif{b}")
            phir = view.at(f"phif{b}", plus_b=b)
            FbID = view.at(f"F{b}")[ID]
            FbID1 = view.at(f"F{b}", plus_b=b)[ID]
            dMb = q[b] * (phir - phil) * Ud
            extra[IM1 + b] = extra.get(IM1 + b, 0.0) + dMb
            if adiabatic:
                dE = q[b] * (FbID * (phic - phil) + FbID1 * (phir - phic))
                extra[IEN] = extra.get(IEN, 0.0) + dE
    return corr, extra


def _trans_kernel(q_ref, *refs, sim: SimConfig, a: int, axes, keys,
                  with_grav: bool):
    q = {b: q_ref[0, b] for b in axes}
    nops = len(keys)
    in_refs = refs[:nops]
    Ulc_ref, Urc_ref = refs[nops:]
    ops = {}
    for k, r in zip(keys, in_refs):
        t = r[...]
        ops[k] = t[:, 0] if t.ndim == 4 else t[0]
    Ulp = ops[("Ulp", 0, 0)]
    Urp = ops[("Urp", 0, 0)]

    v0 = _View(ops, a, 0)
    vm = _View(ops, a, -1)
    corr_r, extra_r = _contrib(v0, a, axes, q, sim.adiabatic, with_grav,
                               Ulp.shape[0])
    corr_l, extra_l = _contrib(vm, a, axes, q, sim.adiabatic, with_grav,
                               Ulp.shape[0])
    Urc = Urp - corr_r
    Ulc = Ulp - corr_l
    for idx, vr in extra_r.items():
        Urc = jnp.concatenate([Urc[:idx], (Urc[idx] - vr)[None],
                               Urc[idx + 1:]], axis=0)
    for idx, vl in extra_l.items():
        Ulc = jnp.concatenate([Ulc[:idx], (Ulc[idx] - vl)[None],
                               Ulc[idx + 1:]], axis=0)
    Ulc_ref[...] = Ulc[:, None]
    Urc_ref[...] = Urc[:, None]


def transverse_correct(Ulp, Urp, Fp, U, phic, phif, q, sim: SimConfig,
                       grid: GridConfig, a: int, axes):
    """Fused steps 5-7 for axis a.  Fp: dict axis->flux array; phic/phif:
    static-potential fields or None.  Returns (Ulc, Urc)."""
    nv, NZ, NY, NX = Ulp.shape
    by = _by_of(NY)
    gz, gy = NZ, NY // by
    with_grav = phic is not None

    # operand list: (name, dz_blocks, dy_blocks) -> array; z blocks are
    # 1-thick so a z block offset IS a z cell offset
    need = {("Ulp", 0, 0): Ulp, ("Urp", 0, 0): Urp, ("Ud", 0, 0): U[ID]}

    def add(name, arr, dz, dy):
        need.setdefault((name, dz, dy), arr)

    offs_a = [(0, 0)]
    if a == 1:
        offs_a.append((0, -1))
    elif a == 2:
        offs_a.append((-1, 0))
    for b in axes:
        if b == a:
            continue
        for (dz, dy) in offs_a:
            add(f"F{b}", Fp[b], dz, dy)
            if b == 1:
                add(f"F{b}", Fp[b], dz, dy + 1)
            elif b == 2:
                add(f"F{b}", Fp[b], dz + 1, dy)
    if with_grav:
        for (dz, dy) in offs_a:
            add("phic", phic, dz, dy)
            add("Ud", U[ID], dz, dy)
            for b in axes:
                if b == a:
                    continue
                add(f"phif{b}", phif[b], dz, dy)
                if b == 1:
                    add(f"phif{b}", phif[b], dz, dy + 1)
                elif b == 2:
                    add(f"phif{b}", phif[b], dz + 1, dy)

    keys = list(need.keys())
    args = [need[k] for k in keys]
    in_specs = [pl.BlockSpec((1, 4), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM)]
    for (name, dz, dy), arr in zip(keys, args):
        in_specs.append(_mkspec(nv, by, NX, dz, dy, gz, gy,
                                scalar=(arr.ndim == 3)))
    qarr = jnp.stack([q.get(b, jnp.zeros((), Ulp.dtype))
                      for b in range(3)] +
                     [jnp.zeros((), Ulp.dtype)]).reshape(1, 4)

    out_spec = _mkspec(nv, by, NX, 0, 0, gz, gy)
    kern = functools.partial(_trans_kernel, sim=sim, a=a, axes=tuple(axes),
                             keys=tuple(keys), with_grav=with_grav)
    return pl.pallas_call(
        kern,
        grid=(gz, gy),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct(Ulp.shape, Ulp.dtype),) * 2,
        interpret=_interpret(),
    )(qarr, *args)


# ---------------------------------------------------------------------------
# steps 11-12: gravity source + conservative update + interior splice
# ---------------------------------------------------------------------------


def _update_kernel(q_ref, *refs, sim: SimConfig, axes, keys,
                   with_grav: bool, lo, hi, by):
    dtodx = {b: q_ref[0, b] for b in axes}
    nops = len(keys)
    in_refs = refs[:nops]
    (out_ref,) = refs[nops:]
    ops = {}
    for k, r in zip(keys, in_refs):
        t = r[...]
        ops[k] = t[:, 0] if t.ndim == 4 else t[0]
    U = ops[("U", 0, 0)]

    def at(name, dz=0, dy=0, sx=0):
        if dy == 0:
            t = ops[(name, dz, 0)]
            return _shx(t, sx) if sx else t
        A = ops[(name, dz, 0)]
        B = ops[(name, dz, dy)]
        A = _shx(A, sx) if sx else A
        B = _shx(B, sx) if sx else B
        return _shy(A, B)

    def sh1(name, b):
        if b == 0:
            return at(name, sx=1)
        if b == 1:
            return at(name, dy=1)
        return at(name, dz=1)

    Unew = U
    if with_grav:
        dhalf = at("dhalf")
        phic = at("phic")
        for a in axes:
            phil = at(f"phif{a}")
            phir = sh1(f"phif{a}", a)
            FID = at(f"F{a}")[ID]
            FID1 = sh1(f"F{a}", a)[ID]
            dMa = dtodx[a] * (phir - phil) * dhalf
            Unew = jnp.concatenate(
                [Unew[:IM1 + a], (Unew[IM1 + a] - dMa)[None],
                 Unew[IM1 + a + 1:]], axis=0)
            if sim.adiabatic:
                dE = dtodx[a] * (FID * (phic - phil) + FID1 * (phir - phic))
                Unew = jnp.concatenate(
                    [Unew[:IEN], (Unew[IEN] - dE)[None], Unew[IEN + 1:]],
                    axis=0)
    for a in axes:
        Unew = Unew - dtodx[a] * (sh1(f"F{a}", a) - at(f"F{a}"))

    # interior splice: ghosts keep U (ctu3d.py step-12 splice)
    i = pl.program_id(0)
    j = pl.program_id(1)
    sh = U.shape[-2:]
    yid = j * by + jax.lax.broadcasted_iota(jnp.int32, sh, 0)
    xid = jax.lax.broadcasted_iota(jnp.int32, sh, 1)
    interior = ((i >= lo[2]) & (i <= hi[2]) &
                (yid >= lo[1]) & (yid <= hi[1]) &
                (xid >= lo[0]) & (xid <= hi[0]))
    out_ref[...] = jnp.where(interior, Unew, U)[:, None]


def final_update(U, Fp2, dhalf, phic, phif, dtodx, sim: SimConfig,
                 grid: GridConfig, axes):
    """Fused steps 11-12 + splice.  Fp2: dict axis->final flux; returns the
    new padded U."""
    nv, NZ, NY, NX = U.shape
    by = _by_of(NY)
    gz, gy = NZ, NY // by
    with_grav = phic is not None

    need = {("U", 0, 0): U}

    def add(name, arr, dz, dy):
        need.setdefault((name, dz, dy), arr)

    for a in axes:
        add(f"F{a}", Fp2[a], 0, 0)
        if a == 1:
            add(f"F{a}", Fp2[a], 0, 1)
        elif a == 2:
            add(f"F{a}", Fp2[a], 1, 0)
    if with_grav:
        add("dhalf", dhalf, 0, 0)
        add("phic", phic, 0, 0)
        for a in axes:
            add(f"phif{a}", phif[a], 0, 0)
            if a == 1:
                add(f"phif{a}", phif[a], 0, 1)
            elif a == 2:
                add(f"phif{a}", phif[a], 1, 0)

    keys = list(need.keys())
    args = [need[k] for k in keys]
    in_specs = [pl.BlockSpec((1, 4), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM)]
    in_specs += [_mkspec(nv, by, NX, dz, dy, gz, gy,
                         scalar=(arr.ndim == 3))
                 for (name, dz, dy), arr in zip(keys, args)]
    qarr = jnp.stack([dtodx.get(b, jnp.zeros((), U.dtype))
                      for b in range(3)] +
                     [jnp.zeros((), U.dtype)]).reshape(1, 4)
    lo = tuple(grid.lo(a) for a in range(3))
    hi = tuple(grid.hi(a) for a in range(3))
    kern = functools.partial(_update_kernel, sim=sim, axes=tuple(axes),
                             keys=tuple(keys),
                             with_grav=with_grav, lo=lo, hi=hi, by=by)
    return pl.pallas_call(
        kern,
        grid=(gz, gy),
        in_specs=in_specs,
        out_specs=_mkspec(nv, by, NX, 0, 0, gz, gy),
        out_shape=jax.ShapeDtypeStruct(U.shape, U.dtype),
        interpret=_interpret(),
    )(qarr, *args)


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu",)
