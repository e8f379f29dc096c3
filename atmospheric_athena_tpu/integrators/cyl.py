"""Cylindrical-coordinate CTU integrator — hydrodynamics (x1=R, x2=phi,
x3=z).

Re-implementation of the CYLINDRICAL code paths of
/root/reference/src/integrators/integrate_{1,2,3}d_ctu.c (geometric
scale factors, curvature-corrected PLM, geometric source terms) as
whole-grid stacked-array arithmetic.  The step ordering follows the
reference exactly:

  1. x1 sweep: curvature-weighted PLM (lr_states_plm.c:123-141,214-236,
     272-301), dt/2 geometric primitive sources (integrate_1d_ctu.c:
     228-288), dt/2 gravity via x1GravAcc at x1vc (:156-161); fluxes
     with the interface pressure Pflux (hllc.c:219-246).
  2. x2 (phi) sweep: per-cell dtodx2 = dt/(r dphi) (integrate_2d_ctu.c:
     461-464); gravity by potential differences (:512-522).
  3. x3 (z) sweep: standard Cartesian form.
  5-7. transverse corrections with rsf/lsf = ri/r area factors on
     x1-flux differences (SQR on the angular momentum component,
     integrate_2d_ctu.c:804-837) and r-scaled x2 gradients (:638-676);
     gravity cross terms (:732-776, x1 side in acceleration form
     :894-925); the t^n geometric source (d Vphi^2 [+P])/x1vc applied to
     the M1 component of the x2/x3-face states (:211-222, 1032-1041).
  9. final fluxes (+ Pflux on x1).
  11. full-dt time-centered geometric source from n+1/2 dhalf/M2h/Pavgh
     (integrate_2d_ctu.c:1294-1360), then gravity with the acceleration
     form on M1 and area-weighted energy terms (:1494-1520).
  12. conservative update with rsf/lsf (and SQR(rsf) on M2 — angular
     momentum, :1560-1600).

Supported: hydro (the reference's configure forbids cylindrical with
self-gravity/particles/scalars, configure.ac:602-612), CTU, PLM
(orders 1/2/2p), flux hllc (the tst/cylindrical suite's configuration;
Pavgh needs the solver's interface pressure).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config import GridConfig, SimConfig
from ..defs import ID, IEN, IM1
from ..eos import cons1d_to_prim1d, prim1d_to_cons1d
from ..ops import reconstruct, riemann
from ..state import State
from .sweep import vperm_from_sweep, vperm_to_sweep


def _adim(axis: int) -> int:
    return 3 - axis


def _sh(q, k, axis):
    return jnp.roll(q, -k, axis=_adim(axis))


def _shf(q, k, axis):
    return jnp.roll(q, -k, axis=2 - axis)


def plm_geom(grid: GridConfig, dtype):
    """Cylindrical R-sweep reconstruction geometry (lr_states_plm.c:
    123-128, 214-216, 272-301) as trailing-axis broadcast arrays."""
    r = np.asarray(grid.r_coords(), dtype)
    ri = np.asarray(grid.ri_coords(), dtype)
    dx = grid.dx[0]
    rp = np.roll(r, -1)
    rm = np.roll(r, 1)
    return {
        "zc": jnp.asarray(1.0 / (1.0 - dx * dx / (12.0 * rp * rm))),
        "zl": jnp.asarray(1.0 / (1.0 - dx * dx / (12.0 * r * rm))),
        "zr": jnp.asarray(1.0 / (1.0 - dx * dx / (12.0 * rp * r))),
        "gcurv": jnp.asarray(dx / (6.0 * r)),
        "ril": jnp.asarray(ri[:-1]),        # left face radius of cell i
        "rir": jnp.asarray(ri[1:]),         # right face radius of cell i
        "dx": dx,
    }


def _geometry(grid: GridConfig, dtype):
    """(r, lsf, rsf, x1vc, inv_rdphi) broadcast over [Nz,Ny,Nx]."""
    r = np.asarray(grid.r_coords(), dtype)
    ri = np.asarray(grid.ri_coords(), dtype)
    x1vc = np.asarray(grid.x1vc_coords(), dtype)
    lsf = jnp.asarray(ri[:-1] / r)
    rsf = jnp.asarray(ri[1:] / r)
    inv_rdphi = (jnp.asarray(1.0 / (r * grid.dx[1]))
                 if grid.active(1) else None)
    return (jnp.asarray(r), lsf, rsf, jnp.asarray(x1vc), inv_rdphi)


def _phi_arrays(problem, grid: GridConfig, dtype):
    """phi at cell centers + the three left-face families (like
    ctu3d._phi_arrays) plus the x1GravAcc field at x1vc."""
    phi_fn = getattr(problem, "static_grav_pot", None) if problem else None
    acc_fn = getattr(problem, "x1_grav_acc", None) if problem else None
    if phi_fn is None:
        return None, None, None
    coords = [np.asarray(grid.cc_coords(a), dtype) for a in range(3)]

    def mesh(xs):
        return [jnp.asarray(x).reshape(
            [-1 if d == 2 - a else 1 for d in range(3)])
            for a, x in enumerate(xs)]

    x1, x2, x3 = mesh(coords)
    phic = phi_fn(x1, x2, x3)
    phif = []
    for a in range(3):
        xs = [x1, x2, x3]
        xs[a] = xs[a] - 0.5 * grid.dx[a]
        phif.append(phi_fn(*xs))
    x1v = jnp.asarray(np.asarray(grid.x1vc_coords(), dtype)).reshape(
        1, 1, -1)
    gvc = acc_fn(x1v, x2, x3) if acc_fn is not None else None
    return phic, phif, gvc


def _geom_src_prim(W, x1vc, sim: SimConfig):
    """dt/2 geometric source on the primitive state of ONE cell
    (integrate_1d_ctu.c:230-247), returned as per-variable increments
    in sweep order (d, Vx, Vy, Vz, [P])."""
    rinv = 1.0 / x1vc
    gd = -W[0] * W[1] * rinv
    gVx = W[2] * W[2] * rinv
    gVy = -W[1] * W[2] * rinv
    out = [gd, gVx, gVy, jnp.zeros_like(gd)]
    if sim.adiabatic:
        out.append(-sim.gamma * W[4] * W[1] * rinv)
    return out


def step(state: State, dt, sim: SimConfig, grid: GridConfig, problem=None,
         phi=None, return_fluxes=False):
    """One cylindrical CTU step over the active axes (MHD: 1D only)."""
    if sim.mhd:
        assert not return_fluxes
        return step_mhd1d(state, dt, sim, grid, problem, phi=phi)
    assert not sim.h_correction, "cylindrical decks do not use etah"
    assert sim.nscalars == 0, \
        "cylindrical + passive scalars unsupported (configure.ac:603)"
    if sim.flux != "hllc":
        raise NotImplementedError(
            "cylindrical integrator requires flux=hllc (interface "
            "pressure Pflux, hllc.c:219-246)")
    axes = [a for a in range(3) if grid.active(a)]
    assert 0 in axes, "cylindrical requires an active R axis"
    U = state.U
    dtype = U.dtype
    hdt = 0.5 * dt
    r, lsf, rsf, x1vc, inv_rdphi = _geometry(grid, dtype)
    dtodx1 = dt / grid.dx[0]
    q1 = 0.5 * dtodx1
    # per-cell phi-direction dt/dx (dx2 = r dphi, integrate_2d_ctu.c:461)
    dtodx2 = dt * inv_rdphi if 1 in axes else None
    q2 = 0.5 * dtodx2 if 1 in axes else None
    dtodx3 = dt / grid.dx[2] if 2 in axes else None
    q3 = 0.5 * dtodx3 if 2 in axes else None

    phic, phif, gvc = (phi if phi is not None
                       else _phi_arrays(problem, grid, dtype))
    geom = plm_geom(grid, dtype)

    # t^n geometric source for the transverse phases
    # (integrate_2d_ctu.c:211-222): (d Vphi^2 [+ P | + cs^2 d])/x1vc
    d_n = U[ID]
    vphi = U[IM1 + 1] / d_n
    gsrc_n = d_n * vphi * vphi
    if sim.adiabatic:
        ke = 0.5 * (U[IM1] ** 2 + U[IM1 + 1] ** 2 + U[IM1 + 2] ** 2) / d_n
        p_n = jnp.maximum(sim.gamma_1 * (U[IEN] - ke), 0.0)
        gsrc_n = gsrc_n + p_n
    else:
        gsrc_n = gsrc_n + sim.iso_csound2 * d_n
    gsrc_n = gsrc_n / x1vc

    # === STEPS 1-3: per-axis L/R states + first-pass fluxes ================
    Ulp, Urp, Fp = {}, {}, {}
    for a in axes:
        U1d = vperm_to_sweep(U, a, sim)
        W = cons1d_to_prim1d(U1d, None, sim)
        dtdx = dtodx1 if a == 0 else (dtodx2 if a == 1 else dtodx3)
        Wm, Wp_ = reconstruct.lr_states(W, None, dtdx, sim, axis=2 - a,
                                        geom=geom if a == 0 else None)
        Wl = _sh(Wp_, -1, a)
        Wr = Wm

        if a == 0:
            # dt/2 geometric source on the states (1d_ctu.c:228-288)
            src_r = _geom_src_prim(W, x1vc, sim)
            src_l = [_shf(s, -1, 0) for s in src_r]
            for n, (sl_, sr_) in enumerate(zip(src_l, src_r)):
                Wl = Wl.at[n].add(hdt * sl_)
                Wr = Wr.at[n].add(hdt * sr_)
            if gvc is not None:
                # gravity dt/2 in acceleration form at x1vc (:156-161)
                Wl = Wl.at[1].add(-hdt * _shf(gvc, -1, 0))
                Wr = Wr.at[1].add(-hdt * gvc)
        elif phic is not None:
            # potential-difference gravity (2d_ctu.c:512-522 for x2)
            dVl = dtdx * (phif[a] - _shf(phic, -1, a))
            dVr = dtdx * (phic - phif[a])
            Wl = Wl.at[1].add(-dVl)
            Wr = Wr.at[1].add(-dVr)

        Ul = prim1d_to_cons1d(Wl, None, sim)
        Ur = prim1d_to_cons1d(Wr, None, sim)
        F = riemann.hllc(Ul, Ur, Wl, Wr, None, sim)
        Ulp[a] = vperm_from_sweep(Ul, a, sim)
        Urp[a] = vperm_from_sweep(Ur, a, sim)
        Fp[a] = vperm_from_sweep(F, a, sim)

    # === STEPS 5-7: transverse corrections =================================
    def dflux1_scaled(F1):
        """rsf·F(i+1) − lsf·F(i) per component, SQR factors on M2
        (angular momentum; integrate_2d_ctu.c:804-837)."""
        Fr = _sh(F1, 1, 0)
        out = []
        for n in range(F1.shape[0]):
            if n == IM1 + 1:
                out.append(rsf * rsf * Fr[n] - lsf * lsf * F1[n])
            else:
                out.append(rsf * Fr[n] - lsf * F1[n])
        return jnp.stack(out)

    # every transverse term below is a PER-CELL field (the r-dependent
    # factors ride along), so the Ul side is always the same field
    # shifted by -1 along the face axis — including the a==0 faces where
    # the shift moves to the r[i-1] factors, exactly like the reference
    dF1s = dflux1_scaled(Fp[0]) if len(axes) > 1 else None
    Ulc, Urc = {}, {}
    for a in axes:
        dUl = jnp.zeros_like(Ulp[a])
        dUr = jnp.zeros_like(Urp[a])
        for b in axes:
            if b == a:
                continue
            if b == 0:
                corr = q1 * dF1s
            elif b == 1:
                corr = q2 * (_sh(Fp[1], 1, 1) - Fp[1])
            else:
                corr = q3 * (_sh(Fp[2], 1, 2) - Fp[2])
            dUr = dUr + corr
            dUl = dUl + _sh(corr, -1, a)
        Ulc[a] = Ulp[a] - dUl
        Urc[a] = Urp[a] - dUr

        # gravity cross terms + geometric source on the face states
        for b in axes:
            if b == a:
                continue
            if b == 0:
                # x1 gravity in acceleration form (2d_ctu.c:894-925)
                if gvc is not None:
                    dM = hdt * U[ID] * gvc
                    Urc[a] = Urc[a].at[IM1].add(-dM)
                    Ulc[a] = Ulc[a].at[IM1].add(-_shf(dM, -1, a))
                if phic is not None and sim.adiabatic:
                    phir = _shf(phif[0], 1, 0)
                    phil = phif[0]
                    dE = q1 * (lsf * Fp[0][ID] * (phic - phil) +
                               rsf * _shf(Fp[0][ID], 1, 0) *
                               (phir - phic))
                    Urc[a] = Urc[a].at[IEN].add(-dE)
                    Ulc[a] = Ulc[a].at[IEN].add(-_shf(dE, -1, a))
                # geometric source (2d_ctu.c:1032-1041)
                dgeo = hdt * gsrc_n
                Urc[a] = Urc[a].at[IM1].add(dgeo)
                Ulc[a] = Ulc[a].at[IM1].add(_shf(dgeo, -1, a))
            elif phic is not None:
                qb = q2 if b == 1 else q3
                phir = _shf(phif[b], 1, b)
                phil = phif[b]
                dMb = qb * (phir - phil) * U[ID]
                dE = qb * (Fp[b][ID] * (phic - phil) +
                           _shf(Fp[b][ID], 1, b) * (phir - phic))
                Urc[a] = Urc[a].at[IM1 + b].add(-dMb)
                Ulc[a] = Ulc[a].at[IM1 + b].add(-_shf(dMb, -1, a))
                if sim.adiabatic:
                    Urc[a] = Urc[a].at[IEN].add(-dE)
                    Ulc[a] = Ulc[a].at[IEN].add(-_shf(dE, -1, a))

    # === STEP 9: final fluxes ===============================================
    # (in 1D Ulc == Ulp so this reproduces the step-1 fluxes bit-for-bit,
    # like integrate_1d_ctu.c which computes them once)
    Fp2 = {}
    pflux1 = None
    for a in axes:
        Ul = vperm_to_sweep(Ulc[a], a, sim)
        Ur = vperm_to_sweep(Urc[a], a, sim)
        Wl = cons1d_to_prim1d(Ul, None, sim)
        Wr = cons1d_to_prim1d(Ur, None, sim)
        if a == 0:
            F, pflux1 = riemann.hllc(Ul, Ur, Wl, Wr, None, sim,
                                     return_pflux=True)
        else:
            F = riemann.hllc(Ul, Ur, Wl, Wr, None, sim)
        Fp2[a] = vperm_from_sweep(F, a, sim)

    # === STEP 11a (cyl): time-centered geometric source ====================
    # (integrate_2d_ctu.c:1294-1360 — dhalf/M2h from the FINAL fluxes)
    F1 = Fp2[0]
    F1r = _sh(F1, 1, 0)
    dhalf = U[ID] - q1 * (rsf * F1r[ID] - lsf * F1[ID])
    M2h = U[IM1 + 1] - q1 * (rsf * rsf * F1r[IM1 + 1] -
                             lsf * lsf * F1[IM1 + 1])
    if 1 in axes:
        dhalf = dhalf - q2 * (_shf(Fp2[1][ID], 1, 1) - Fp2[1][ID])
        M2h = M2h - q2 * (_shf(Fp2[1][IM1 + 1], 1, 1) - Fp2[1][IM1 + 1])
        if phic is not None:
            phir = _shf(phif[1], 1, 1)
            M2h = M2h - q2 * (phir - phif[1]) * U[ID]
    if 2 in axes:
        dhalf = dhalf - q3 * (_shf(Fp2[2][ID], 1, 2) - Fp2[2][ID])
        M2h = M2h - q3 * (_shf(Fp2[2][IM1 + 1], 1, 2) - Fp2[2][IM1 + 1])

    gsrc_h = M2h * M2h / dhalf
    if sim.adiabatic:
        pavgh = 0.5 * (lsf * pflux1 + rsf * _shf(pflux1, 1, 0))
        gsrc_h = gsrc_h + pavgh
    else:
        gsrc_h = gsrc_h + sim.iso_csound2 * dhalf
    gsrc_h = gsrc_h / x1vc

    Unew = U.at[IM1].add(dt * gsrc_h)

    # === STEP 11b: gravity at n+1/2 =========================================
    if phic is not None:
        if gvc is not None:
            Unew = Unew.at[IM1].add(-dt * dhalf * gvc)
        if sim.adiabatic:
            phir = _shf(phif[0], 1, 0)
            phil = phif[0]
            dE = dtodx1 * (lsf * F1[ID] * (phic - phil) +
                           rsf * F1r[ID] * (phir - phic))
            Unew = Unew.at[IEN].add(-dE)
        if 1 in axes:
            phir = _shf(phif[1], 1, 1)
            phil = phif[1]
            Unew = Unew.at[IM1 + 1].add(
                -dtodx2 * (phir - phil) * dhalf)
            if sim.adiabatic:
                dE = dtodx2 * (Fp2[1][ID] * (phic - phil) +
                               _shf(Fp2[1][ID], 1, 1) * (phir - phic))
                Unew = Unew.at[IEN].add(-dE)
        if 2 in axes:
            phir = _shf(phif[2], 1, 2)
            phil = phif[2]
            Unew = Unew.at[IM1 + 2].add(
                -dtodx3 * (phir - phil) * dhalf)
            if sim.adiabatic:
                dE = dtodx3 * (Fp2[2][ID] * (phic - phil) +
                               _shf(Fp2[2][ID], 1, 2) * (phir - phic))
                Unew = Unew.at[IEN].add(-dE)

    # === STEP 12: conservative update =======================================
    for n in range(U.shape[0]):
        if n == IM1 + 1:
            Unew = Unew.at[n].add(-dtodx1 * (rsf * rsf * F1r[n] -
                                             lsf * lsf * F1[n]))
        else:
            Unew = Unew.at[n].add(-dtodx1 * (rsf * F1r[n] - lsf * F1[n]))
    if 1 in axes:
        Unew = Unew - dtodx2 * (_sh(Fp2[1], 1, 1) - Fp2[1])
    if 2 in axes:
        Unew = Unew - dtodx3 * (_sh(Fp2[2], 1, 2) - Fp2[2])

    sl_ = (slice(None),) + grid.interior()
    Uout = U.at[sl_].set(Unew[sl_])
    out = state.replace(U=Uout)
    return (out, Fp2) if return_fluxes else out


def step_mhd1d(state: State, dt, sim: SimConfig, grid: GridConfig,
               problem=None, phi=None):
    """1D (R) cylindrical CTU step for MHD.

    The MHD code path of integrate_1d_ctu.c under CYLINDRICAL: B1c/B1i
    are never updated (in 1D axisymmetry d(R·B1)/dt = 0 and the problem
    initializes them), B2c/B3c ride the sweep vector as By/Bz with
    geometric sources, and the time-centered M1 geometric source gains
    the magnetic term -B2ch^2 (integrate_1d_ctu.c:228-288 state sources,
    :404-436 n+1/2 source, :534-551 update).  B2i/B3i are set to the
    cell-centered values for consistency (:548-550)."""
    from .sweep import to_sweep

    assert sim.mhd and sim.adiabatic
    assert grid.active(0) and not grid.active(1) and not grid.active(2)
    if sim.flux != "roe":
        raise NotImplementedError(
            "cylindrical MHD requires flux=roe (the cylindrical decks' "
            "configuration; interface pressure from roe.c:326-332)")
    U = state.U
    dtype = U.dtype
    hdt = 0.5 * dt
    r, lsf, rsf, x1vc, _ = _geometry(grid, dtype)
    dtodx1 = dt / grid.dx[0]
    hdtodx1 = 0.5 * dtodx1
    ib = 5  # By (=B2c) index in the adiabatic MHD sweep vector

    phic, phif, gvc = (phi if phi is not None
                       else _phi_arrays(problem, grid, dtype))
    geom = plm_geom(grid, dtype)

    # === STEP 1: load sweep vector, primitives, L/R states =================
    U1d, Bxc = to_sweep(U, state.Bcc, 0, sim)
    Bxi = state.B1i  # face field at interface f (left face of cell f)
    W = cons1d_to_prim1d(U1d, Bxc, sim)
    Wm, Wp_ = reconstruct.lr_states(W, Bxc, dtodx1, sim, geom=geom)
    Wl = _sh(Wp_, -1, 0)
    Wr = Wm

    # Step 1c: gravity dt/2 in acceleration form at x1vc (:156-161)
    if gvc is not None:
        Wl = Wl.at[1].add(-hdt * _shf(gvc, -1, 0))
        Wr = Wr.at[1].add(-hdt * gvc)

    # Step 1c cont: cell-centered geometric sources at t^n (:228-288),
    # with the MHD extras on Vx/Vy and the By/Bz source terms
    def _src(Wc, Bx, rinv):
        di = 1.0 / Wc[0]
        out = [None] * W.shape[0]
        out[0] = -Wc[0] * Wc[1] * rinv
        out[1] = (Wc[2] * Wc[2] - Wc[ib] * Wc[ib] * di) * rinv
        out[2] = (-Wc[1] * Wc[2] + Bx * Wc[ib] * di) * rinv
        out[3] = jnp.zeros_like(out[0])
        out[4] = -sim.gamma * Wc[4] * Wc[1] * rinv
        out[ib] = -Wc[2] * Bx * rinv
        out[ib + 1] = -Wc[1] * Wc[ib + 1] * rinv
        for n in range(sim.nscalars):
            out[ib + 2 + n] = jnp.zeros_like(out[0])
        return jnp.stack(out)

    rinv = 1.0 / x1vc
    src_r = _src(W, Bxc, rinv)
    src_l = _sh(src_r, -1, 0)
    Wl = Wl + hdt * src_l
    Wr = Wr + hdt * src_r

    # Step 1d: interface fluxes with the face B1i and cylindrical Pflux
    Ul = prim1d_to_cons1d(Wl, Bxi, sim)
    Ur = prim1d_to_cons1d(Wr, Bxi, sim)
    F1, pflux = riemann.roe(Ul, Ur, Wl, Wr, Bxi, sim, return_pflux=True)
    F1r = _sh(F1, 1, 0)

    # === STEP 11a: time-centered geometric source (:404-436) ===============
    dhalf = U[ID] - hdtodx1 * (rsf * F1r[ID] - lsf * F1[ID])
    M2h = U[IM1 + 1] - hdtodx1 * (rsf * rsf * F1r[IM1 + 1] -
                                  lsf * lsf * F1[IM1 + 1])
    geom_src = M2h * M2h / dhalf
    B2ch = state.Bcc[1] - hdtodx1 * (F1r[ib] - F1[ib])
    geom_src = geom_src - B2ch * B2ch
    pavgh = 0.5 * (lsf * pflux + rsf * _shf(pflux, 1, 0))
    geom_src = geom_src + pavgh
    geom_src = geom_src / x1vc
    Unew = U.at[IM1].add(dt * geom_src)

    # === STEP 11a cont: gravity at n+1/2 (:446-466) ========================
    if gvc is not None:
        Unew = Unew.at[IM1].add(-dt * dhalf * gvc)
        phir = _shf(phif[0], 1, 0)
        phil = phif[0]
        dE = dtodx1 * (lsf * F1[ID] * (phic - phil) +
                       rsf * F1r[ID] * (phir - phic))
        Unew = Unew.at[IEN].add(-dE)

    # === STEP 12: conservative update (:534-551) ===========================
    # sweep order = physical order for axis 0; By/Bz handled separately
    for n, comp in ((ID, ID), (IM1, IM1), (IM1 + 1, IM1 + 1),
                    (IM1 + 2, IM1 + 2), (IEN, IEN)):
        if n == IM1 + 1:
            Unew = Unew.at[comp].add(
                -dtodx1 * (rsf * rsf * F1r[n] - lsf * lsf * F1[n]))
        else:
            Unew = Unew.at[comp].add(
                -dtodx1 * (rsf * F1r[n] - lsf * F1[n]))
    for n in range(sim.nscalars):
        Unew = Unew.at[5 + n].add(
            -dtodx1 * (rsf * F1r[ib + 2 + n] - lsf * F1[ib + 2 + n]))
    B2new = state.Bcc[1] - dtodx1 * (F1r[ib] - F1[ib])
    B3new = state.Bcc[2] - dtodx1 * (rsf * F1r[ib + 1] - lsf * F1[ib + 1])

    sl_ = (slice(None),) + grid.interior()
    Uout = U.at[sl_].set(Unew[sl_])
    isl = grid.interior()
    Bcc = state.Bcc
    Bcc = Bcc.at[(1,) + isl].set(B2new[isl])
    Bcc = Bcc.at[(2,) + isl].set(B3new[isl])
    return state.replace(U=Uout, Bcc=Bcc,
                         B2i=state.B2i.at[isl].set(Bcc[(1,) + isl]),
                         B3i=state.B3i.at[isl].set(Bcc[(2,) + isl]))
