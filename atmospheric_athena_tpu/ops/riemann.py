"""Riemann solvers on stacked interface states.

Vectorized re-implementation of /root/reference/src/rsolvers/:
  - ``roe``  — Roe's linearization with per-interface HLLE fallback on
               non-positive intermediate states (roe.c:59-336)
  - ``hlle`` — Einfeldt HLLE (hlle.c:62-260)

All solvers share the uniform reference signature fluxes(Ul,Ur,Wl,Wr,Bxi)
(rsolvers/prototypes.h:36-38), here over stacked arrays [nvar1d, ...] with
nvar1d = NWAVE + nscalars, so one call computes every interface of a sweep.
Where the reference early-returns per interface (supersonic short-circuit,
HLLE fallback), we compute all candidate fluxes and select with jnp.where —
branch-free, identical results.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SimConfig
from . import eigen


def _roe_averages(Ul, Ur, Wl, Wr, Bxi, sim: SimConfig):
    """Roe-averaged state (roe.c:106-133; identical in hlle.c:93-120)."""
    sqrtdl = jnp.sqrt(Wl[0])
    sqrtdr = jnp.sqrt(Wr[0])
    isdlpdr = 1.0 / (sqrtdl + sqrtdr)
    out = dict(
        droe=sqrtdl * sqrtdr,
        v1=(sqrtdl * Wl[1] + sqrtdr * Wr[1]) * isdlpdr,
        v2=(sqrtdl * Wl[2] + sqrtdr * Wr[2]) * isdlpdr,
        v3=(sqrtdl * Wl[3] + sqrtdr * Wr[3]) * isdlpdr,
        pbl=0.0, pbr=0.0,
    )
    if sim.mhd:
        ib = 5 if sim.adiabatic else 4
        # NB swapped sqrt-weights for B (roe.c:118-119)
        out["b2roe"] = (sqrtdr * Wl[ib] + sqrtdl * Wr[ib]) * isdlpdr
        out["b3roe"] = (sqrtdr * Wl[ib + 1] + sqrtdl * Wr[ib + 1]) * isdlpdr
        out["x"] = 0.5 * ((Wl[ib] - Wr[ib]) ** 2 +
                          (Wl[ib + 1] - Wr[ib + 1]) ** 2) \
            / (sqrtdl + sqrtdr) ** 2
        out["y"] = 0.5 * (Wl[0] + Wr[0]) / out["droe"]
        out["pbl"] = 0.5 * (Bxi ** 2 + Wl[ib] ** 2 + Wl[ib + 1] ** 2)
        out["pbr"] = 0.5 * (Bxi ** 2 + Wr[ib] ** 2 + Wr[ib + 1] ** 2)
    if sim.adiabatic:
        out["hroe"] = ((Ul[4] + Wl[4] + out["pbl"]) / sqrtdl +
                       (Ur[4] + Wr[4] + out["pbr"]) / sqrtdr) * isdlpdr
    return out


def _esys_roe(avg, Bxi, sim: SimConfig, vectors=True):
    """Eigen-dispatch on Roe averages (roe.c:139-153)."""
    if sim.gas == "hydro":
        if sim.adiabatic:
            return eigen.esys_roe_adb_hyd(avg["v1"], avg["v2"], avg["v3"],
                                          avg["hroe"], sim, vectors)
        return eigen.esys_roe_iso_hyd(avg["v1"], avg["v2"], avg["v3"],
                                      sim, vectors)
    from . import eigen_mhd_roe
    if sim.adiabatic:
        return eigen_mhd_roe.esys_roe_adb_mhd(
            avg["droe"], avg["v1"], avg["v2"], avg["v3"], avg["hroe"], Bxi,
            avg["b2roe"], avg["b3roe"], avg["x"], avg["y"], sim, vectors)
    return eigen_mhd_roe.esys_roe_iso_mhd(
        avg["droe"], avg["v1"], avg["v2"], avg["v3"], Bxi,
        avg["b2roe"], avg["b3roe"], avg["x"], avg["y"], sim, vectors)


def _lr_fluxes(Ul, Ur, Wl, Wr, Bxi, pbl, pbr, sim: SimConfig,
               bm=0.0, bp=0.0):
    """Physical L/R fluxes F(U) − b·U (roe.c:159-209 with b=0;
    hlle.c:185-245 with the HLLE wave-speed shifts baked in)."""
    def one(U, W, pb, b):
        F = [U[1] - b * U[0],
             U[1] * (W[1] - b),
             U[2] * (W[1] - b),
             U[3] * (W[1] - b)]
        if sim.adiabatic:
            F[1] = F[1] + W[4]
            F.append(U[4] * (W[1] - b) + W[4] * W[1])
        else:
            F[1] = F[1] + W[0] * sim.iso_csound2
        if sim.mhd:
            ib = 5 if sim.adiabatic else 4
            F[1] = F[1] - 0.5 * (Bxi ** 2 - W[ib] ** 2 - W[ib + 1] ** 2)
            F[2] = F[2] - Bxi * W[ib]
            F[3] = F[3] - Bxi * W[ib + 1]
            if sim.adiabatic:
                F[4] = F[4] + (pb * W[1] - Bxi * (
                    Bxi * W[1] + W[ib] * W[2] + W[ib + 1] * W[3]))
            F.append(W[ib] * (W[1] - b) - Bxi * W[2])
            F.append(W[ib + 1] * (W[1] - b) - Bxi * W[3])
        iw = sim.nwave
        for n in range(sim.nscalars):
            F.append(F[0] * W[iw + n])
        return F
    # NB: the Roe solver's L/R fluxes use Mx*Vx (+P), algebraically equal to
    # the b=0 case here; Mx*(Vx-0) == Mx*Vx bit-for-bit.
    return one(Ul, Wl, pbl, bm), one(Ur, Wr, pbr, bp)


def hlle(Ul, Ur, Wl, Wr, Bxi, sim: SimConfig, etah=None):
    """HLLE flux (hlle.c:62-260)."""
    avg = _roe_averages(Ul, Ur, Wl, Wr, Bxi, sim)
    ev, _, _ = _esys_roe(avg, Bxi, sim, vectors=False)

    def cf_side(U, W):
        if sim.adiabatic:
            asq = sim.gamma * W[4] / W[0]
        else:
            asq = sim.iso_csound2
        if not sim.mhd:
            return jnp.sqrt(asq * jnp.ones_like(W[0]))
        ib = 5 if sim.adiabatic else 4
        vaxsq = Bxi * Bxi / W[0]
        ct2 = (U[ib] ** 2 + U[ib + 1] ** 2) / W[0]
        qsq = vaxsq + ct2 + asq
        tmp = vaxsq + ct2 - asq
        cfsq = 0.5 * (qsq + jnp.sqrt(tmp * tmp + 4.0 * asq * ct2))
        return jnp.sqrt(cfsq)

    cfl = cf_side(Ul, Wl)
    cfr = cf_side(Ur, Wr)
    ar = jnp.maximum(ev[sim.nwave - 1], Wr[1] + cfr)
    al = jnp.minimum(ev[0], Wl[1] - cfl)
    bp = jnp.maximum(ar, 0.0)
    bm = jnp.minimum(al, 0.0)

    Fl, Fr = _lr_fluxes(Ul, Ur, Wl, Wr, Bxi, avg["pbl"], avg["pbr"], sim,
                        bm=bm, bp=bp)
    tmp = 0.5 * (bp + bm) / (bp - bm)
    F = [0.5 * (fl + fr) + (fl - fr) * tmp for fl, fr in zip(Fl, Fr)]
    return jnp.stack(F)


def roe(Ul, Ur, Wl, Wr, Bxi, sim: SimConfig, etah=None):
    """Roe flux with supersonic short-circuit (roe.c:215-235), intermediate-
    state positivity test and per-interface HLLE fallback (roe.c:256-284),
    and H-correction via `etah` (roe.c:295-300)."""
    nw = sim.nwave
    if etah is None:
        etah = 0.0

    avg = _roe_averages(Ul, Ur, Wl, Wr, Bxi, sim)
    ev, rem, lem = _esys_roe(avg, Bxi, sim, vectors=True)

    Fl, Fr = _lr_fluxes(Ul, Ur, Wl, Wr, Bxi, avg["pbl"], avg["pbr"], sim)

    # Step 6: wave strengths a = L·dU (roe.c:241-248)
    dU = [Ur[n] - Ul[n] for n in range(nw)]
    a = eigen.lmul(lem, dU)

    # Step 7: intermediate-state positivity scan (roe.c:256-284)
    u_inter = [Ul[n] for n in range(nw)]
    bad = jnp.zeros_like(Ul[0], dtype=bool)
    for n in range(nw - 1):
        rcol = eigen.column(rem, n)
        u_inter = [ui + a[n] * c if not (isinstance(c, float) and c == 0.0)
                   else ui for ui, c in zip(u_inter, rcol)]
        expanding = ev[n + 1] > ev[n]
        bad = bad | (expanding & (u_inter[0] <= 0.0))
        if sim.adiabatic:
            p_inter = u_inter[4] - 0.5 * (
                u_inter[1] ** 2 + u_inter[2] ** 2 + u_inter[3] ** 2) \
                / u_inter[0]
            if sim.mhd:
                p_inter = p_inter - 0.5 * (
                    u_inter[nw - 2] ** 2 + u_inter[nw - 1] ** 2 + Bxi ** 2)
            bad = bad | (expanding & (p_inter < 0.0))

    # Step 8: Roe flux (roe.c:295-312)
    coeff = [0.5 * jnp.maximum(jnp.abs(ev[m]), etah) * a[m]
             for m in range(nw)]
    F = []
    for n in range(nw):
        f = 0.5 * (Fl[n] + Fr[n])
        for m in range(nw):
            c = rem[n][m]
            if isinstance(c, float) and c == 0.0:
                continue
            f = f - coeff[m] if isinstance(c, float) and c == 1.0 \
                else f - coeff[m] * c
        F.append(f)

    # Supersonic short-circuit (roe.c:215-235) — overrides the fallback too,
    # since the reference returns before the intermediate-state test.
    sup_l = ev[0] >= 0.0
    sup_r = ev[nw - 1] <= 0.0
    F = [jnp.where(sup_l, fl, jnp.where(sup_r, fr, f))
         for f, fl, fr in zip(F, Fl, Fr)]

    # Scalar fluxes upwinded on the density flux sign (roe.c:315-321)
    iw = nw
    for n in range(sim.nscalars):
        F.append(jnp.where(F[0] >= 0.0, F[0] * Wl[iw + n], F[0] * Wr[iw + n]))

    F = jnp.stack(F)

    # HLLE fallback where an intermediate state went non-positive
    use_hlle = bad & ~(sup_l | sup_r)
    F_hlle = hlle(Ul, Ur, Wl, Wr, Bxi, sim)
    return jnp.where(use_hlle, F_hlle, F)


SOLVERS = {"roe": roe, "hlle": hlle}


def fluxes(Ul, Ur, Wl, Wr, Bxi, sim: SimConfig, etah=None):
    """Uniform dispatch like the reference's single compiled fluxes()."""
    try:
        solver = SOLVERS[sim.flux]
    except KeyError:
        raise NotImplementedError(f"flux={sim.flux} not yet implemented")
    return solver(Ul, Ur, Wl, Wr, Bxi, sim, etah=etah)
