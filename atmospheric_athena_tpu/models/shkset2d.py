"""Oblique 2D shock (reference: src/prob/shkset2d.c).

A 1D Riemann problem rotated by angle alpha = atan(Lx/Ly) to the grid,
testing the multidimensional algorithm: the initial interface runs
corner-to-corner, mixed cells get volume-fraction-averaged states
(shkset2d.c:225-317), and all four boundaries remap ghost zones onto the
equivalent interior cells one (r1, r2) unit cell inward
(shkset2d_iib/oib/ijb/ojb, :374-532) so the oblique shock propagates as
if on an infinite periodic-in-the-shock-frame domain.

The reference indexes the interface line in PADDED grid coordinates
(ix1 = i + Disp with Disp = 0 for the root domain, :204-208); replicated
verbatim so cell assignment matches cell-for-cell.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .. import state as state_mod
from ..config import GridConfig, SimConfig
from ..defs import ID, IEN, IM1
from ..eos import prim1d_to_cons1d
from . import register


def _gcd(a, b):
    while b:
        a, b = b, a % b
    return a


@register("shkset2d")
class Shkset2D:
    def __init__(self, par, sim: SimConfig, grid: GridConfig):
        self.par = par
        if grid.Nx[1] == 1:
            raise ValueError("[shkset2d]: 2D/3D only")
        nx1, nx2 = grid.Nx[0], grid.Nx[1]
        gcd = _gcd(nx1, nx2)
        if gcd < 10:
            raise ValueError(f"[shkset2d]: gcd(nx1,nx2) = {gcd} < 10")
        self.r1 = nx1 // gcd
        self.r2 = nx2 // gcd
        self.gcd = gcd

    def init(self, par, sim: SimConfig, grid: GridConfig):
        dtype = sim.jnp_dtype()
        st = state_mod.zeros(sim, grid)
        r1, r2, gcd = self.r1, self.r2, self.gcd

        Lx = grid.xmax[0] - grid.xmin[0]
        Ly = grid.xmax[1] - grid.xmin[1]
        if Lx == Ly:
            cos_a = sin_a = math.sqrt(0.5)
        else:
            angle = math.atan(Lx / Ly)
            sin_a, cos_a = math.sin(angle), math.cos(angle)

        def side(sfx):
            vals = [par.getd("problem", f"d{sfx}"),
                    par.getd("problem", f"v1{sfx}"),
                    par.getd("problem", f"v2{sfx}"),
                    par.getd("problem", f"v3{sfx}")]
            if sim.adiabatic:
                vals.append(par.getd("problem", f"p{sfx}"))
            Bx = 0.0
            if sim.mhd:
                Bx = par.getd("problem", f"b1{sfx}")
                vals.append(par.getd("problem", f"b2{sfx}"))
                vals.append(par.getd("problem", f"b3{sfx}"))
            W = jnp.asarray(vals, dtype)
            U = np.asarray(prim1d_to_cons1d(W, jnp.asarray(Bx, dtype),
                                            sim))
            # rotate (Mx,My) -> (M1,M2), (Bx,By) -> (B1,B2)
            q = {}
            q["d"] = U[0]
            q["M1"] = U[1] * cos_a - U[2] * sin_a
            q["M2"] = U[1] * sin_a + U[2] * cos_a
            q["M3"] = U[3]
            if sim.adiabatic:
                q["E"] = U[4]
            if sim.mhd:
                ib = 5 if sim.adiabatic else 4
                q["B1"] = Bx * cos_a - U[ib] * sin_a
                q["B2"] = Bx * sin_a + U[ib] * cos_a
                q["B3"] = U[ib + 1]
            return q

        ql = side("l")
        qr = side("r")

        nz, ny, nx = grid.padded_shape()
        ix1 = np.arange(nx)[None, :]          # padded indices, Disp = 0
        ix2 = np.arange(ny)[:, None]

        drr = r2 * ix1 + r1 * ix2 - gcd * r1 * r2
        dll = r2 * (ix1 - 1) + r1 * (ix2 - 1) - gcd * r1 * r2
        dlr = r2 * (ix1 - 1) + r1 * ix2 - gcd * r1 * r2
        drl = r2 * ix1 + r1 * (ix2 - 1) - gcd * r1 * r2

        left = drr <= 0
        right = dll >= 0
        mixed = ~left & ~right

        # face fractions for cells split by the interface (:227-290)
        afl_lx = np.where(dlr < 0, 1.0,
                          np.where(dlr > 0, -dll / r1, 1.0))
        afl_ry = np.where(dlr < 0, -dlr / r2,
                          np.where(dlr > 0, 0.0, 0.0))
        afr_lx = 1.0 - afl_lx
        afr_ry = np.where(dlr == 0, 1.0, 1.0 - afl_ry)

        afl_rx = np.where(drl < 0, -drl / r1, 0.0)
        afl_ly = np.where(drl < 0, 1.0,
                          np.where(drl > 0, -dll / r2, 1.0))
        afr_rx = 1.0 - afl_rx
        afr_ly = np.where(drl == 0, 0.0, 1.0 - afl_ly)
        # drl == 0: boundary hits the corner (:262-267)
        afl_ly = np.where(drl == 0, 1.0, afl_ly)

        vfl = np.where(
            (dlr > 0) & (drl < 0), 0.5 * (afl_lx + afl_rx),
            np.where((dlr < 0) & (drl > 0), 0.5 * (afl_ly + afl_ry),
                     np.where((dlr == 0) & (drl == 0), 0.5,
                              np.where((dlr > 0) & (drl > 0),
                                       0.5 * afl_lx * afl_ly,
                                       1.0 - 0.5 * afr_rx * afr_ry))))
        vfr = 1.0 - vfl

        def mix(name):
            return np.where(left, ql[name],
                            np.where(right, qr[name],
                                     vfl * ql[name] + vfr * qr[name]))

        U = st.U
        fields = [("d", ID), ("M1", IM1), ("M2", IM1 + 1), ("M3", IM1 + 2)]
        if sim.adiabatic:
            fields.append(("E", IEN))
        for name, idx in fields:
            arr = jnp.asarray(np.broadcast_to(mix(name)[None],
                                              (nz, ny, nx)), dtype)
            U = U.at[idx].set(arr)

        kw = {}
        if sim.mhd:
            b1i = np.where(left, ql["B1"],
                           np.where(right, qr["B1"],
                                    afl_lx * ql["B1"] + afr_lx * qr["B1"]))
            b1r = np.where(left, ql["B1"],
                           np.where(right, qr["B1"],
                                    afl_rx * ql["B1"] + afr_rx * qr["B1"]))
            b2i = np.where(left, ql["B2"],
                           np.where(right, qr["B2"],
                                    afl_ly * ql["B2"] + afr_ly * qr["B2"]))
            b2r = np.where(left, ql["B2"],
                           np.where(right, qr["B2"],
                                    afl_ry * ql["B2"] + afr_ry * qr["B2"]))
            b3 = mix("B3")
            bcast = lambda a: jnp.asarray(
                np.broadcast_to(a[None], (nz, ny, nx)), dtype)
            Bcc = st.Bcc
            Bcc = Bcc.at[0].set(bcast(0.5 * (b1i + b1r)))
            Bcc = Bcc.at[1].set(bcast(0.5 * (b2i + b2r)))
            Bcc = Bcc.at[2].set(bcast(b3))
            kw = dict(Bcc=Bcc, B1i=bcast(b1i), B2i=bcast(b2i),
                      B3i=bcast(b3))
        return st.replace(U=U, **kw)

    # --- unit-cell remap BCs (shkset2d_iib/oib/ijb/ojb) --------------------
    # Sequential per-ghost-layer fills: layer i may read a ghost written by
    # an earlier layer (the reference's "Do NOT Change this loop ordering").

    def _remap(self, state, grid, sim, side, axis):
        ng = grid.nghost
        r1, r2 = self.r1, self.r2
        U, Bcc = state.U, state.Bcc
        Bi = [state.B1i, state.B2i, state.B3i] if sim.mhd else None
        isl = grid.lo(0)
        iel = grid.hi(0)
        jsl = grid.lo(1)
        jel = grid.hi(1)

        for g in range(1, ng + 1):
            if axis == 0 and side == "lo":
                i_dst = isl - g
                jlo, jhi = jsl - ng + r2, jel + ng
                src_j = slice(jlo - r2, jhi + 1 - r2)
                dst_j = slice(jlo, jhi + 1)
                i_src = i_dst + r1
                U = U.at[:, :, dst_j, i_dst].set(U[:, :, src_j, i_src])
                if sim.mhd:
                    Bcc = Bcc.at[:, :, dst_j, i_dst].set(
                        Bcc[:, :, src_j, i_src])
                    for b in range(3):
                        Bi[b] = Bi[b].at[:, dst_j, i_dst].set(
                            Bi[b][:, src_j, i_src])
            elif axis == 0 and side == "hi":
                i_dst = iel + g
                jlo, jhi = jsl - ng, jel + ng - r2
                src_j = slice(jlo + r2, jhi + 1 + r2)
                dst_j = slice(jlo, jhi + 1)
                i_src = i_dst - r1
                U = U.at[:, :, dst_j, i_dst].set(U[:, :, src_j, i_src])
                if sim.mhd:
                    Bcc = Bcc.at[:, :, dst_j, i_dst].set(
                        Bcc[:, :, src_j, i_src])
                    for b in range(3):
                        if b == 0 and g == 1:
                            continue   # ie+1 face is active, not a BC
                        Bi[b] = Bi[b].at[:, dst_j, i_dst].set(
                            Bi[b][:, src_j, i_src])
            elif axis == 1 and side == "lo":
                j_dst = jsl - g
                ilo, ihi = isl - ng + r1, iel + ng
                src_i = slice(ilo - r1, ihi + 1 - r1)
                dst_i = slice(ilo, ihi + 1)
                j_src = j_dst + r2
                U = U.at[:, :, j_dst, dst_i].set(U[:, :, j_src, src_i])
                if sim.mhd:
                    Bcc = Bcc.at[:, :, j_dst, dst_i].set(
                        Bcc[:, :, j_src, src_i])
                    for b in range(3):
                        Bi[b] = Bi[b].at[:, j_dst, dst_i].set(
                            Bi[b][:, j_src, src_i])
            else:
                j_dst = jel + g
                ilo, ihi = isl - ng, iel + ng - r1
                src_i = slice(ilo + r1, ihi + 1 + r1)
                dst_i = slice(ilo, ihi + 1)
                j_src = j_dst - r2
                U = U.at[:, :, j_dst, dst_i].set(U[:, :, j_src, src_i])
                if sim.mhd:
                    Bcc = Bcc.at[:, :, j_dst, dst_i].set(
                        Bcc[:, :, j_src, src_i])
                    for b in range(3):
                        if b == 1 and g == 1:
                            continue   # je+1 face is active, not a BC
                        Bi[b] = Bi[b].at[:, j_dst, dst_i].set(
                            Bi[b][:, j_src, src_i])
        kw = dict(U=U)
        if sim.mhd:
            kw.update(Bcc=Bcc, B1i=Bi[0], B2i=Bi[1], B3i=Bi[2])
        return state.replace(**kw)

    def bc_ix1(self, state, grid, sim):
        return self._remap(state, grid, sim, "lo", 0)

    def bc_ox1(self, state, grid, sim):
        return self._remap(state, grid, sim, "hi", 0)

    def bc_ix2(self, state, grid, sim):
        return self._remap(state, grid, sim, "lo", 1)

    def bc_ox2(self, state, grid, sim):
        return self._remap(state, grid, sim, "hi", 1)
