"""Pallas kernels for the CTU middle phases: transverse flux corrections
(steps 5-7), the H-correction + final Riemann solve (step 9), and the
full-dt source + conservative update (steps 11-12).

These phases were left in whole-grid JAX after pallas_hydro fused steps 1-3;
XLA materializes every jnp.roll of the [nvar, 264^3] stacked arrays, which
put the measured traffic at ~8.5 KB/cell (cost_analysis) against a ~2 KB/cell
budget for this pipeline.  All stencils here are +/-1 cell, so arrays tile as
(nvar, bz, by, NX) blocks (x fully in-block; bz=4, by=8) and cell shifts
along z/y are assembled from *block-neighbor operands*: for each shifted
input the kernel receives the aligned block plus the +/-1-block view along
that axis (and the corner view for combined shifts) and concatenates the
boundary plane/row.  Block indices are clamped at the array edge, so the
only contaminated cells are the outermost plane — inside the nghost=4 ghost
region, which the interior update never reads (ctu3d.py:16-23).

Operand-count control (the round-2 version's ~17-operand pipelines took
Mosaic minutes to compile): the static-gravity cross terms are factored out
into per-axis 2-field arrays G[b] = (dM_b, dE_b) precomputed by one fused
jnp pass (gcross/grav_source below), so the transverse kernel reads G
instead of (phic, phif, U_d) and their shifted views.

Numerical contract: every kernel mirrors the jnp formulation in
integrators/ctu3d.py op-for-op (same accumulation order, same component
update order), so the two paths are bitwise identical — asserted by
tests/test_pallas.py in interpreter mode.

Reference provenance: transverse corrections integrate_3d_ctu.c:971-1065
(+ gravity cross terms :1160-1222), H-correction + final fluxes :2292-2438,
full-dt gravity source :2741-2782, conservative update :2975-3069.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import GridConfig, SimConfig
from ..defs import ID, IEN, IM1
from ..eos import cons1d_to_prim1d
from ..integrators.sweep import inv_perm, var_perm
from . import riemann

import os as _os

_BZ = int(_os.environ.get("ATHENA_TPU_MID_BZ", "8"))
_BY = int(_os.environ.get("ATHENA_TPU_MID_BY", "8"))



def _cparams():
    """Raise the scoped-VMEM soft limit: v5e has 128MiB of VMEM and the
    hires-level tiles (NX=328 pads to 384 lanes) need ~18-30MB of scoped
    scratch in the sweep kernels (the default soft limit is 16MB)."""
    if jax.default_backend() not in ("tpu",):
        return None
    from jax.experimental.pallas import tpu as _pltpu
    return _pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

def _tiles(NZ, NY, NX):
    """(bz, by) fitting the 16MB scoped-VMEM budget: the ~15-operand
    pipelines hold 2x(bz*by) rows of padded lanes per operand, so halve
    bz once NX pads past two 128-lane tiles."""
    bz = _BZ if NX <= 272 else max(_BZ // 2, 2)
    return bz, _BY


def supported(grid: GridConfig) -> bool:
    """Default-on for 3D grids whose padded shape tiles evenly.
    ATHENA_TPU_PALLAS_MID=0 forces the jnp fallback."""
    import os
    if os.environ.get("ATHENA_TPU_PALLAS_MID", "1").lower() in (
            "0", "off", "false"):
        return False
    NZ, NY, NX = grid.padded_shape()
    bz, by = _tiles(NZ, NY, NX)
    return NZ % bz == 0 and NY % by == 0


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


def _restack(X, perm):
    return jnp.stack([X[p] for p in perm])


def _sub_at(X, i, delta):
    """X.at[i].add(-delta) via concatenate (robust under Mosaic)."""
    return jnp.concatenate([X[:i], (X[i] - delta)[None], X[i + 1:]], axis=0)


# ---------------------------------------------------------------------------
# block-neighbor views: specs + kernel-side cell-shift assembly
# ---------------------------------------------------------------------------


def _mkspec(blk, dzb, dyb, gz, gy):
    """BlockSpec for a block at block offset (dzb, dyb), clamped at the grid
    edge (garbage lands only in the outermost ghost plane/row)."""
    nd = len(blk)

    def om(i, j):
        ii = jnp.clip(i + dzb, 0, gz - 1) if dzb else i
        jj = jnp.clip(j + dyb, 0, gy - 1) if dyb else j
        return (ii, jj, 0) if nd == 3 else (0, ii, jj, 0)
    return pl.BlockSpec(blk, om)


class _Operands:
    """Collects (name, dzb, dyb) -> array views at call time; hands the
    kernel an assembler for arbitrary +/-1 cell shifts."""

    def __init__(self):
        self.keys = []
        self.args = []
        self._set = {}

    def add(self, name, arr, dzb=0, dyb=0):
        k = (name, dzb, dyb)
        if k not in self._set:
            self._set[k] = arr
            self.keys.append(k)
            self.args.append(arr)

    def need_shift(self, name, arr, dz, dy):
        """Register the views needed for a (dz, dy) cell shift."""
        self.add(name, arr, 0, 0)
        if dz:
            self.add(name, arr, dz, 0)
        if dy:
            self.add(name, arr, 0, dy)
        if dz and dy:
            self.add(name, arr, dz, dy)

    def specs(self, nv, gz, gy, NX, bz, by):
        out = []
        for (name, dzb, dyb), arr in zip(self.keys, self.args):
            blk = ((bz, by, NX) if arr.ndim == 3 else
                   (arr.shape[0], bz, by, NX))
            out.append(_mkspec(blk, dzb, dyb, gz, gy))
        return out


def _cat(A, B, d, axdim):
    """Cell shift by d in {-1,+1} along axdim, boundary from neighbor B."""
    sl = [slice(None)] * A.ndim
    sr = [slice(None)] * A.ndim
    if d > 0:
        sl[axdim] = slice(1, None)
        sr[axdim] = slice(0, 1)
        return jnp.concatenate([A[tuple(sl)], B[tuple(sr)]], axis=axdim)
    sl[axdim] = slice(0, -1)
    sr[axdim] = slice(-1, None)
    return jnp.concatenate([B[tuple(sr)], A[tuple(sl)]], axis=axdim)


class _Tiles:
    """Kernel-side view of the operand tiles; sh(name, axis, d) returns the
    tile shifted by d cells along Athena axis (0=x in-block roll, 1=y,
    2=z block-assembled).  Combined shifts via sh2."""

    def __init__(self, keys, tiles):
        self.t = dict(zip(keys, tiles))

    def at(self, name, dzb=0, dyb=0):
        return self.t[(name, dzb, dyb)]

    def sh(self, name, axis, d, dzb=0, dyb=0):
        A = self.at(name, dzb, dyb)
        if d == 0:
            return A
        if axis == 0:
            return jnp.roll(A, -d, axis=-1)
        if axis == 1:
            return _cat(A, self.at(name, dzb, d), d, A.ndim - 2)
        return _cat(A, self.at(name, d, dyb), d, A.ndim - 3)

    def sh2(self, name, a1, d1, a2, d2):
        """Shift d1 along a1 then d2 along a2 (both nonzero, a1 != a2,
        neither may be x if the other is a block axis... x handled last)."""
        if a1 == 0:
            return jnp.roll(self.sh(name, a2, d2), -d1, axis=-1)
        if a2 == 0:
            return jnp.roll(self.sh(name, a1, d1), -d2, axis=-1)
        # both block axes (y,z): shift A and its a1-neighbor along a2 first
        dzb1 = d1 if a1 == 2 else 0
        dyb1 = d1 if a1 == 1 else 0
        A2 = self.sh(name, a2, d2)
        B2 = self.sh(name, a2, d2, dzb=dzb1, dyb=dyb1)
        return _cat(A2, B2, d1, A2.ndim - 1 - a1)


# ---------------------------------------------------------------------------
# fused jnp precomputes (single-pass elementwise; XLA fuses these)
# ---------------------------------------------------------------------------


def _shf(q, k, axis):
    return jnp.roll(q, -k, axis=2 - axis)


def gcross(U, phic, phif, Fp, q, axes):
    """Static-gravity transverse cross terms (integrate_3d_ctu.c:1160-1222)
    as per-axis stacked (2, Nz, Ny, Nx) arrays [dM_b, dE_b]."""
    out = {}
    for b in axes:
        phir = _shf(phif[b], 1, b)
        phil = phif[b]
        dMb = q[b] * (phir - phil) * U[ID]
        dE = q[b] * (Fp[b][ID] * (phic - phil) +
                     _shf(Fp[b][ID], 1, b) * (phir - phic))
        out[b] = jnp.stack([dMb, dE])
    return out


def grav_source(Fp2, dhalf, phic, phif, dtodx, axes):
    """Full-dt gravity source terms (:2741-2782) as a stacked (6, ...)
    array [dM_0..2, dE_0..2] (inactive axes zero-filled)."""
    dM, dE = [], []
    for a in range(3):
        if a in axes:
            phir = _shf(phif[a], 1, a)
            phil = phif[a]
            dM.append(dtodx[a] * (phir - phil) * dhalf)
            dE.append(dtodx[a] * (Fp2[a][ID] * (phic - phil) +
                                  _shf(Fp2[a][ID], 1, a) * (phir - phic)))
        else:
            dM.append(jnp.zeros_like(dhalf))
            dE.append(jnp.zeros_like(dhalf))
    return jnp.stack(dM + dE)


# ---------------------------------------------------------------------------
# Pallas versions of the two jnp precompute passes above.  XLA materializes
# every roll of the whole-grid formulation (measured 10.9 ms for gcross and
# 17.4 ms for dhalf+grav_source at 256^3 f32 — vs ~1 ms each fused); these
# single-field-operand kernels mirror the jnp op order exactly, so the
# values are bitwise identical on every cell whose stencil stays in-grid
# (the outermost ghost plane differs: block-clamped vs wrapped, never read).
# ---------------------------------------------------------------------------


def _idfield(arr):
    """Accept either a full [nvar, ...] stacked flux or its 3-D density
    component (sweep_lrflux with_df emits the latter directly)."""
    return arr if arr.ndim == 3 else arr[ID]


def _gcross_kernel(q_ref, *refs, axes, keys, adiabatic):
    q = {b: q_ref[0, b] for b in axes}
    nops = len(keys)
    outs = refs[nops:]
    tl = _Tiles(keys, [r[...] for r in refs[:nops]])
    d = tl.at("d")
    phic = tl.at("phic")
    out_iter = iter(outs)
    for b in axes:
        phil = tl.at(f"phif{b}")
        phir = tl.sh(f"phif{b}", b, 1)
        FpID = tl.at(f"FpID{b}")
        FpIDr = tl.sh(f"FpID{b}", b, 1)
        dMb = q[b] * (phir - phil) * d
        dE = q[b] * (FpID * (phic - phil) + FpIDr * (phir - phic))
        next(out_iter)[...] = jnp.stack([dMb, dE])


def gcross_pl(U, phic, phif, Fp, q, axes, grid: GridConfig):
    """Pallas gcross: same output dict {b: (2, Nz, Ny, Nx)}."""
    NZ, NY, NX = U.shape[1:]
    bz, by = _tiles(NZ, NY, NX)
    gz, gy = NZ // bz, NY // by
    ops = _Operands()
    ops.add("d", U[ID])
    ops.add("phic", phic)
    for b in axes:
        dzb = 1 if b == 2 else 0
        dyb = 1 if b == 1 else 0
        ops.need_shift(f"phif{b}", phif[b], dzb, dyb)
        ops.need_shift(f"FpID{b}", _idfield(Fp[b]), dzb, dyb)
    qarr = jnp.stack([q.get(b, jnp.zeros((), U.dtype)) for b in range(3)]
                     + [jnp.zeros((), U.dtype)]).reshape(1, 4)
    smem = pl.BlockSpec((1, 4), lambda i, j: (0, 0),
                        memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_gcross_kernel, axes=tuple(axes),
                          keys=tuple(ops.keys), adiabatic=True),
        grid=(gz, gy),
        in_specs=[smem] + ops.specs(None, gz, gy, NX, bz, by),
        out_specs=tuple(_mkspec((2, bz, by, NX), 0, 0, gz, gy)
                        for _ in axes),
        out_shape=tuple(jax.ShapeDtypeStruct((2, NZ, NY, NX), U.dtype)
                        for _ in axes),
        interpret=_interpret(),
        compiler_params=_cparams(),
    )(qarr, *ops.args)
    return {b: out[i] for i, b in enumerate(axes)}


def _sg_kernel(q_ref, *refs, axes, keys, with_f2r=False):
    # q_ref row 0: q (dhalf), row 1: dtodx
    nops = len(keys)
    (out_ref,) = refs[nops:]
    tl = _Tiles(keys, [r[...] for r in refs[:nops]])
    d = tl.at("d")
    phic = tl.at("phic")
    dhalf = d
    for a in axes:
        dFID = tl.sh(f"FpID{a}", a, 1) - tl.at(f"FpID{a}")
        dhalf = dhalf - q_ref[0, a] * dFID
    dM, dE = [], []
    for a in range(3):
        if a in axes:
            phil = tl.at(f"phif{a}")
            phir = tl.sh(f"phif{a}", a, 1)
            F2 = tl.at(f"Fp2ID{a}")
            F2r = (tl.at(f"Fp2IDr{a}") if with_f2r
                   else tl.sh(f"Fp2ID{a}", a, 1))
            dM.append(q_ref[1, a] * (phir - phil) * dhalf)
            dE.append(q_ref[1, a] * (F2 * (phic - phil) +
                                     F2r * (phir - phic)))
        else:
            dM.append(jnp.zeros_like(dhalf))
            dE.append(jnp.zeros_like(dhalf))
    out_ref[...] = jnp.stack(dM + dE)


def grav_source_pl(U, Fp, Fp2, phic, phif, q, dtodx, axes,
                   grid: GridConfig, Fp2IDr=None):
    """Pallas dhalf + grav_source: returns the stacked (6, ...) Sg.

    Fp2IDr: optional {a: F2_ID(+1_a)} pre-shifted density fluxes
    (pallas_hydro.flux_sweep_df) — aligned operands instead of
    block-neighbor view pairs."""
    NZ, NY, NX = U.shape[1:]
    bz, by = _tiles(NZ, NY, NX)
    gz, gy = NZ // bz, NY // by
    ops = _Operands()
    ops.add("d", U[ID])
    ops.add("phic", phic)
    for a in axes:
        dzb = 1 if a == 2 else 0
        dyb = 1 if a == 1 else 0
        ops.need_shift(f"phif{a}", phif[a], dzb, dyb)
        ops.need_shift(f"FpID{a}", _idfield(Fp[a]), dzb, dyb)
        if Fp2IDr is not None:
            ops.add(f"Fp2ID{a}", _idfield(Fp2[a]))
            ops.add(f"Fp2IDr{a}", Fp2IDr[a])
        else:
            ops.need_shift(f"Fp2ID{a}", _idfield(Fp2[a]), dzb, dyb)
    qarr = jnp.stack(
        [q.get(b, jnp.zeros((), U.dtype)) for b in range(3)]
        + [jnp.zeros((), U.dtype)]
        + [dtodx.get(b, jnp.zeros((), U.dtype)) for b in range(3)]
        + [jnp.zeros((), U.dtype)]).reshape(2, 4)
    smem = pl.BlockSpec((2, 4), lambda i, j: (0, 0),
                        memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_sg_kernel, axes=tuple(axes),
                          keys=tuple(ops.keys),
                          with_f2r=Fp2IDr is not None),
        grid=(gz, gy),
        in_specs=[smem] + ops.specs(None, gz, gy, NX, bz, by),
        out_specs=_mkspec((6, bz, by, NX), 0, 0, gz, gy),
        out_shape=jax.ShapeDtypeStruct((6, NZ, NY, NX), U.dtype),
        interpret=_interpret(),
        compiler_params=_cparams(),
    )(qarr, *ops.args)


# ---------------------------------------------------------------------------
# steps 5-7 (+ H-correction eta): transverse corrections
# ---------------------------------------------------------------------------


def _cfast_tile(Uc, sim: SimConfig):
    d = Uc[ID]
    di = 1.0 / d
    if sim.adiabatic:
        p = sim.gamma_1 * (Uc[IEN] - 0.5 * (
            Uc[IM1] ** 2 + Uc[IM1 + 1] ** 2 + Uc[IM1 + 2] ** 2) * di)
        return jnp.sqrt(sim.gamma * p * di)
    return jnp.sqrt(sim.iso_csound2) * jnp.ones_like(d)


def _trans_kernel(q_ref, *refs, sim: SimConfig, a: int, axes, keys,
                  with_grav: bool, with_eta: bool, with_df: bool):
    q = {b: q_ref[0, b] for b in axes}
    nops = len(keys)
    outs = refs[nops:]
    tl = _Tiles(keys, [r[...] for r in refs[:nops]])

    Ulp = tl.at("Ulp")
    Urp = tl.at("Urp")

    # Ur side: corr = sum_b q_b * (F_b(+1_b) - F_b)   (ascending b)
    corr_r = None
    corr_l = None
    for b in axes:
        if b == a:
            continue
        if with_df:
            # sweep-emitted flux difference: one aligned + one shifted
            # view instead of four views of the full flux array
            dF_r = tl.at(f"dF{b}")
            dF_l = tl.sh(f"dF{b}", a, -1)
        else:
            dF_r = tl.sh(f"F{b}", b, 1) - tl.at(f"F{b}")
            dF_l = tl.sh2(f"F{b}", b, 1, a, -1) - tl.sh(f"F{b}", a, -1)
        cr = q[b] * dF_r
        cl = q[b] * dF_l
        corr_r = cr if corr_r is None else corr_r + cr
        corr_l = cl if corr_l is None else corr_l + cl
    Urc = Urp - corr_r
    Ulc = Ulp - corr_l

    # gravity cross terms, mirroring ctu3d.py's per-b order:
    # Urc[M_b] -= dMb ; Ulc[M_b] -= sh(dMb,-1,a) ; then IEN for both
    if with_grav:
        for b in axes:
            if b == a:
                continue
            Gb = tl.at(f"G{b}")
            Gbm = tl.sh(f"G{b}", a, -1)
            Urc = _sub_at(Urc, IM1 + b, Gb[0])
            Ulc = _sub_at(Ulc, IM1 + b, Gbm[0])
            if sim.adiabatic:
                Urc = _sub_at(Urc, IEN, Gb[1])
                Ulc = _sub_at(Ulc, IEN, Gbm[1])

    out_iter = iter(outs)
    next(out_iter)[...] = Ulc
    next(out_iter)[...] = Urc
    if with_eta:
        cfl = _cfast_tile(Ulc, sim)
        cfr = _cfast_tile(Urc, sim)
        lam_r = Urc[IM1 + a] / Urc[ID] + cfr
        lam_l = Ulc[IM1 + a] / Ulc[ID] - cfl
        next(out_iter)[...] = 0.5 * jnp.abs(lam_r - lam_l)


def transverse_correct(Ulp, Urp, Fp, G, q, sim: SimConfig,
                       grid: GridConfig, a: int, axes, dFp=None):
    """Fused steps 5-7 for axis a.  Returns (Ulc, Urc, eta) with eta the
    H-correction interface jump (or None without h_correction).

    dFp: optional {b: dF_b} sweep-emitted flux differences
    (pallas_hydro.sweep_lrflux with_df) — replaces the four
    block-neighbor views of each transverse flux with two views of its
    difference (values bitwise identical: same f32 subtraction)."""
    nv, NZ, NY, NX = Ulp.shape
    bz, by = _tiles(NZ, NY, NX)
    gz, gy = NZ // bz, NY // by
    with_grav = G is not None
    with_eta = sim.h_correction
    with_df = dFp is not None

    ops = _Operands()
    ops.add("Ulp", Ulp)
    ops.add("Urp", Urp)
    dza = -1 if a == 2 else 0
    dya = -1 if a == 1 else 0
    for b in axes:
        if b == a:
            continue
        dzb = 1 if b == 2 else 0
        dyb = 1 if b == 1 else 0
        if with_df:
            # views for dF_b, dF_b(-1_a)
            ops.need_shift(f"dF{b}", dFp[b], dza, dya)
        else:
            # views for F_b, F_b(+1_b), F_b(-1_a), F_b(+1_b,-1_a)
            ops.need_shift(f"F{b}", Fp[b], dzb, dyb)
            ops.need_shift(f"F{b}", Fp[b], dza, dya)
            ops.need_shift(f"F{b}", Fp[b], dzb + dza, dyb + dya)
        if with_grav:
            ops.need_shift(f"G{b}", G[b], dza, dya)

    qarr = jnp.stack([q.get(b, jnp.zeros((), Ulp.dtype)) for b in range(3)]
                     + [jnp.zeros((), Ulp.dtype)]).reshape(1, 4)
    smem = pl.BlockSpec((1, 4), lambda i, j: (0, 0),
                        memory_space=pltpu.SMEM)
    in_specs = [smem] + ops.specs(nv, gz, gy, NX, bz, by)

    out_spec4 = _mkspec((nv, bz, by, NX), 0, 0, gz, gy)
    out_specs = [out_spec4, out_spec4]
    out_shape = [jax.ShapeDtypeStruct(Ulp.shape, Ulp.dtype)] * 2
    if with_eta:
        out_specs.append(_mkspec((bz, by, NX), 0, 0, gz, gy))
        out_shape.append(jax.ShapeDtypeStruct((NZ, NY, NX), Ulp.dtype))

    kern = functools.partial(_trans_kernel, sim=sim, a=a, axes=tuple(axes),
                             keys=tuple(ops.keys), with_grav=with_grav,
                             with_eta=with_eta, with_df=with_df)
    out = pl.pallas_call(
        kern,
        grid=(gz, gy),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interpret(),
        compiler_params=_cparams(),
    )(qarr, *ops.args)
    if with_eta:
        return out
    return out[0], out[1], None


# ---------------------------------------------------------------------------
# step 9: H-correction etah gather + final Riemann solve
# ---------------------------------------------------------------------------


def _fluxh_kernel(*refs, sim: SimConfig, a: int, axes, keys,
                  with_eta: bool):
    nops = len(keys)
    (F_ref,) = refs[nops:]
    tl = _Tiles(keys, [r[...] for r in refs[:nops]])
    Ul = tl.at("Ulc")
    Ur = tl.at("Urc")

    etah = None
    if with_eta:
        # etah = max over (eta_a; per b: eta_b, sh(eta_b,-1,a),
        # sh(eta_b,+1,b), sh(sh(eta_b,+1,b),-1,a))  (ctu3d.py step 9)
        etah = tl.at("eta")[a]
        for b in axes:
            if b == a:
                continue
            for cand in (tl.at("eta")[b],
                         tl.sh("eta", a, -1)[b],
                         tl.sh("eta", b, 1)[b],
                         tl.sh2("eta", b, 1, a, -1)[b]):
                etah = jnp.maximum(etah, cand)

    perm = var_perm(a, sim)
    ipm = inv_perm(perm)
    Uls = _restack(Ul, perm)
    Urs = _restack(Ur, perm)
    Wl = cons1d_to_prim1d(Uls, None, sim)
    Wr = cons1d_to_prim1d(Urs, None, sim)
    F = riemann.fluxes(Uls, Urs, Wl, Wr, None, sim, etah=etah,
                       branchless=True)
    F_ref[...] = _restack(F, ipm)


def flux_corrected(Ulc, Urc, etaS, sim: SimConfig, grid: GridConfig,
                   a: int, axes):
    """Fused step 9: etah gather + Riemann solve on corrected states."""
    nv, NZ, NY, NX = Ulc.shape
    bz, by = _tiles(NZ, NY, NX)
    gz, gy = NZ // bz, NY // by
    with_eta = etaS is not None

    ops = _Operands()
    ops.add("Ulc", Ulc)
    ops.add("Urc", Urc)
    if with_eta:
        dza = -1 if a == 2 else 0
        dya = -1 if a == 1 else 0
        ops.need_shift("eta", etaS, dza, dya)
        for b in axes:
            if b == a:
                continue
            dzb = 1 if b == 2 else 0
            dyb = 1 if b == 1 else 0
            ops.need_shift("eta", etaS, dzb, dyb)
            ops.need_shift("eta", etaS, dzb + dza, dyb + dya)

    in_specs = ops.specs(nv, gz, gy, NX, bz, by)
    kern = functools.partial(_fluxh_kernel, sim=sim, a=a, axes=tuple(axes),
                             keys=tuple(ops.keys), with_eta=with_eta)
    return pl.pallas_call(
        kern,
        grid=(gz, gy),
        in_specs=in_specs,
        out_specs=_mkspec((nv, bz, by, NX), 0, 0, gz, gy),
        out_shape=jax.ShapeDtypeStruct(Ulc.shape, Ulc.dtype),
        interpret=_interpret(),
        compiler_params=_cparams(),
    )(*ops.args)


# ---------------------------------------------------------------------------
# steps 11-12: gravity source + conservative update + interior splice
# ---------------------------------------------------------------------------


def _final_kernel(q_ref, *refs, sim: SimConfig, axes, keys,
                  with_grav: bool, lo, hi, bz, by, with_df=False):
    dtodx = {b: q_ref[0, b] for b in axes}
    nops = len(keys)
    (out_ref,) = refs[nops:]
    tl = _Tiles(keys, [r[...] for r in refs[:nops]])
    U = tl.at("U")

    Unew = U
    if with_grav:
        Sg = tl.at("Sg")
        for a in axes:
            Unew = _sub_at(Unew, IM1 + a, Sg[a])
            if sim.adiabatic:
                Unew = _sub_at(Unew, IEN, Sg[3 + a])
    for a in axes:
        dFa = (tl.at(f"dF{a}") if with_df
               else tl.sh(f"F{a}", a, 1) - tl.at(f"F{a}"))
        Unew = Unew - dtodx[a] * dFa

    # interior splice: ghosts keep U (ctu3d.py step-12 splice)
    i = pl.program_id(0)
    j = pl.program_id(1)
    sh = U.shape[-3:]
    zid = i * bz + jax.lax.broadcasted_iota(jnp.int32, sh, 0)
    yid = j * by + jax.lax.broadcasted_iota(jnp.int32, sh, 1)
    xid = jax.lax.broadcasted_iota(jnp.int32, sh, 2)
    interior = ((zid >= lo[2]) & (zid <= hi[2]) &
                (yid >= lo[1]) & (yid <= hi[1]) &
                (xid >= lo[0]) & (xid <= hi[0]))
    out_ref[...] = jnp.where(interior[None], Unew, U)


def final_update(U, Fp2, Sg, dtodx, sim: SimConfig, grid: GridConfig,
                 axes, dF2=None):
    """Fused steps 11-12 + splice.  Sg: grav_source() output or None.
    dF2: optional {a: F2(+1_a) - F2} flux differences
    (pallas_hydro.flux_sweep_df) — aligned operands replacing the
    block-neighbor view pairs of the full fluxes."""
    nv, NZ, NY, NX = U.shape
    bz, by = _tiles(NZ, NY, NX)
    gz, gy = NZ // bz, NY // by
    with_grav = Sg is not None
    with_df = dF2 is not None

    ops = _Operands()
    ops.add("U", U)
    if with_grav:
        ops.add("Sg", Sg)
    for a in axes:
        if with_df:
            ops.add(f"dF{a}", dF2[a])
            continue
        dzb = 1 if a == 2 else 0
        dyb = 1 if a == 1 else 0
        ops.need_shift(f"F{a}", Fp2[a], dzb, dyb)

    qarr = jnp.stack([dtodx.get(b, jnp.zeros((), U.dtype))
                      for b in range(3)]
                     + [jnp.zeros((), U.dtype)]).reshape(1, 4)
    smem = pl.BlockSpec((1, 4), lambda i, j: (0, 0),
                        memory_space=pltpu.SMEM)
    in_specs = [smem] + ops.specs(nv, gz, gy, NX, bz, by)
    lo = tuple(grid.lo(a) for a in range(3))
    hi = tuple(grid.hi(a) for a in range(3))
    kern = functools.partial(_final_kernel, sim=sim, axes=tuple(axes),
                             keys=tuple(ops.keys), with_grav=with_grav,
                             lo=lo, hi=hi, bz=bz, by=by, with_df=with_df)
    return pl.pallas_call(
        kern,
        grid=(gz, gy),
        in_specs=in_specs,
        out_specs=_mkspec((nv, bz, by, NX), 0, 0, gz, gy),
        out_shape=jax.ShapeDtypeStruct(U.shape, U.dtype),
        interpret=_interpret(),
        compiler_params=_cparams(),
    )(qarr, *ops.args)
