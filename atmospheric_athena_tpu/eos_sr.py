"""Special-relativistic (hydro) variable conversions.

Reference: src/convert_var.c SR-HYDRO sections —
  Cons1D_to_Prim1D (:504-590): the conserved->primitive inversion reduces
  to a quartic in |v| solved analytically (no Newton iteration), vectorized
  here over whole grids.
  Prim1D_to_Cons1D (:949-985): D = gamma rho, M = rho h gamma^2 v,
  E = rho h gamma^2 - P  (total energy INCLUDES rest mass).

Conventions: stacked arrays (d, Vx, Vy, Vz, P) / (D, Mx, My, Mz, E);
units with c = 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import SimConfig
from .defs import TINY_NUMBER


def exact_div(x, c):
    """x / c with a TRUE division under jit.

    XLA's compiler rewrites division by a trace-time constant into
    multiplication by the folded reciprocal (verified on CPU: jit(x/c)
    bit-equals x*(1/c), differing from the true quotient on ~50% of
    operands).  The reference C code performs real divisions, so
    bit-critical paths (whose ulps reach branchy upwind/tie selects)
    must defend the divisor behind an optimization barrier."""
    cc = jax.lax.optimization_barrier(jnp.asarray(c, jnp.result_type(x)))
    return x / cc


def sr_prim1d_to_cons1d(W, sim: SimConfig):
    d, Vx, Vy, Vz, P = W[0], W[1], W[2], W[3], W[4]
    vsq = Vx ** 2 + Vy ** 2 + Vz ** 2
    U0 = 1.0 / (1.0 - vsq)
    wU0sq = (d + sim.gamma / sim.gamma_1 * P) * U0
    D = jnp.sqrt(U0) * d
    out = jnp.stack([D, wU0sq * Vx, wU0sq * Vy, wU0sq * Vz,
                     wU0sq - P])
    if W.shape[0] > 5:
        # passive scalars: s = D*r (lab-frame density weighting).  The
        # reference cannot run SR with scalars at all (hlle_sr.c:30-32
        # #errors on NSCALARS>0) — this extends it
        out = jnp.concatenate([out, W[5:] * D[None]], 0)
    return out


def sr_cons1d_to_prim1d(U, sim: SimConfig):
    """Analytic quartic inversion (convert_var.c:514-586)."""
    D, Mx, My, Mz, E = U[0], U[1], U[2], U[3], U[4]
    g = sim.gamma
    g1 = sim.gamma_1

    Msq = Mx ** 2 + My ** 2 + Mz ** 2
    M = jnp.sqrt(Msq)
    small = jnp.abs(M) < TINY_NUMBER
    Msafe = jnp.where(small, 1.0, M)

    ME = Msafe * E
    Dsq = D ** 2
    g1sq = g1 ** 2
    denom = 1.0 / (g1sq * (Msq + Dsq))
    a3 = (-2.0 * g * g1 * ME) * denom
    a2 = (g ** 2 * E ** 2 + 2.0 * g1 * Msq - g1sq * Dsq) * denom
    a1 = (-2.0 * g * ME) * denom
    a0 = Msq * denom

    i1 = -a2
    i2 = a3 * a1 - 4.0 * a0
    i3 = 4.0 * a2 * a0 - a1 ** 2 - a3 ** 2 * a0
    iR = (9.0 * i1 * i2 - 27.0 * i3 - 2.0 * i1 ** 3) / 54.0
    iS = (3.0 * i2 - a2 ** 2) / 9.0
    iT = iR ** 2 + iS ** 2 * iS

    # complex-root branch (iT < 0): the conjugate pair sums to a real value
    sT = jnp.sqrt(jnp.abs(iT))
    ix_neg = 2.0 * jnp.cbrt(jnp.sqrt(iR * iR + iT * (iT < 0))) * \
        jnp.cos(jnp.arctan2(sT, iR) / 3.0) - i1 / 3.0
    # real branch; cbrt handles a negative radicand with the real root
    ix_pos = jnp.cbrt(iR + sT) + jnp.cbrt(iR - sT) - i1 / 3.0
    ix1 = jnp.where(iT < 0.0, ix_neg, ix_pos)

    iB = 0.5 * (a3 + jnp.sqrt(jnp.maximum(a3 ** 2 - 4.0 * a2 + 4.0 * ix1,
                                          0.0)))
    iC = 0.5 * (ix1 - jnp.sqrt(jnp.maximum(ix1 ** 2 - 4.0 * a0, 0.0)))
    v = 0.5 * (-iB + jnp.sqrt(jnp.maximum(iB ** 2 - 4.0 * iC, 0.0)))
    v = jnp.where(small, 0.0, v)
    v = jnp.clip(v, 0.0, 1.0 - 1.0e-15)

    vOverM = jnp.where(small, 0.0, v / Msafe)
    d = jnp.sqrt(1.0 - v ** 2) * D
    Vx = Mx * vOverM
    Vy = My * vOverM
    Vz = Mz * vOverM
    P = g1 * ((E - Mx * Vx - My * Vy - Mz * Vz) - d)
    out = jnp.stack([d, Vx, Vy, Vz, P])
    if U.shape[0] > 5:
        # passive scalars: primitive r = s/D (see sr_prim1d_to_cons1d)
        out = jnp.concatenate([out, U[5:] / U[0][None]], 0)
    return out


def sr_check_prim1d(U, sim: SimConfig):
    """check_Prim1D, SR hydro (convert_var.c check_Prim path): the same
    quartic inversion WITHOUT the velocity clamp, so unphysical cells
    surface for the FOFC tests (integrate_3d_vl_sr.c Step 15).

    Returns (d, vsq, P); test failure as ~(d>0) | ~(P>0) | (vsq>=1)
    (the negated comparisons also catch the NaNs a v>1 root produces)."""
    D, Mx, My, Mz, E = U[0], U[1], U[2], U[3], U[4]
    g, g1 = sim.gamma, sim.gamma_1
    Msq = Mx ** 2 + My ** 2 + Mz ** 2
    M = jnp.sqrt(Msq)
    small = jnp.abs(M) < TINY_NUMBER
    Msafe = jnp.where(small, 1.0, M)
    ME = Msafe * E
    Dsq = D ** 2
    g1sq = g1 ** 2
    denom = 1.0 / (g1sq * (Msq + Dsq))
    a3 = (-2.0 * g * g1 * ME) * denom
    a2 = (g ** 2 * E ** 2 + 2.0 * g1 * Msq - g1sq * Dsq) * denom
    a1 = (-2.0 * g * ME) * denom
    a0 = Msq * denom
    i1 = -a2
    i2 = a3 * a1 - 4.0 * a0
    i3 = 4.0 * a2 * a0 - a1 ** 2 - a3 ** 2 * a0
    iR = (9.0 * i1 * i2 - 27.0 * i3 - 2.0 * i1 ** 3) / 54.0
    iS = (3.0 * i2 - a2 ** 2) / 9.0
    iT = iR ** 2 + iS ** 2 * iS
    sT = jnp.sqrt(jnp.abs(iT))
    ix_neg = 2.0 * jnp.cbrt(jnp.sqrt(iR * iR + iT * (iT < 0))) * \
        jnp.cos(jnp.arctan2(sT, iR) / 3.0) - i1 / 3.0
    ix_pos = jnp.cbrt(iR + sT) + jnp.cbrt(iR - sT) - i1 / 3.0
    ix1 = jnp.where(iT < 0.0, ix_neg, ix_pos)
    iB = 0.5 * (a3 + jnp.sqrt(jnp.maximum(a3 ** 2 - 4.0 * a2 + 4.0 * ix1,
                                          0.0)))
    iC = 0.5 * (ix1 - jnp.sqrt(jnp.maximum(ix1 ** 2 - 4.0 * a0, 0.0)))
    v = 0.5 * (-iB + jnp.sqrt(jnp.maximum(iB ** 2 - 4.0 * iC, 0.0)))
    v = jnp.where(small, 0.0, v)          # NO [0, 1) clamp here
    vOverM = jnp.where(small, 0.0, v / Msafe)
    d = jnp.sqrt(jnp.abs(1.0 - v ** 2)) * jnp.sign(1.0 - v ** 2) * D
    P = g1 * ((E - Msq * vOverM) - d)
    return d, v ** 2, P


# ===========================================================================
# SR MHD (convert_var.c SPECIAL_RELATIVITY && MHD sections)
#
# Conventions: stacked 1D-slice arrays in sweep order
#   W = (d, Vx, Vy, Vz, P, By, Bz), U = (D, Mx, My, Mz, E, By, Bz);
# Bx passed separately (cell- or interface-centered by the caller).
# ===========================================================================


def sr_mhd_prim1d_to_cons1d(W, Bx, sim: SimConfig):
    """Prim1D_to_Cons1D with MHD terms (convert_var.c:957-991)."""
    d, Vx, Vy, Vz, P, By, Bz = (W[i] for i in range(7))
    vsq = Vx ** 2 + Vy ** 2 + Vz ** 2
    U0 = 1.0 / (1.0 - vsq)
    Bsq = Bx ** 2 + By ** 2 + Bz ** 2
    vDotB = Bx * Vx + By * Vy + Bz * Vz
    wU0sq = (d + sim.gamma / sim.gamma_1 * P) * U0
    Mx = wU0sq * Vx + Bsq * Vx - vDotB * Bx
    My = wU0sq * Vy + Bsq * Vy - vDotB * By
    Mz = wU0sq * Vz + Bsq * Vz - vDotB * Bz
    E = wU0sq - P + (1.0 + vsq) * Bsq / 2.0 - vDotB ** 2 / 2.0
    D = jnp.sqrt(U0) * d
    out = jnp.stack([D, Mx, My, Mz, E, By, Bz])
    if W.shape[0] > 7:
        # passive scalars s = D*r (reference SR solvers #error on
        # NSCALARS>0, hlle_sr.c:30-32 — extension)
        out = jnp.concatenate([out, W[7:] * D[None]], 0)
    return out


def _nr_scalars(d, Bsq, Msq, Ssq, Q, gamma_1, gamma):
    """calc_vsq + calc_chi + derived rho/pgas (convert_var.c:1270-1290).

    pgas is computed as ``Gamma_1*Chi/Gamma`` — multiply THEN divide —
    mirroring the reference's in-loop expression (convert_var.c:672,:869)
    to the ulp.  (A precomputed Gamma_1/Gamma ratio rounds differently,
    which perturbs the converged Q by one ulp and, through the W->U
    roundtrip at v!=0, leaves ~1e-16 residues in analytically-zero HLLE
    mass fluxes; those flip the corner-EMF upwind tie branches that the
    GS05 CT select takes, breaking golden equality at cycle 1.)"""
    Qsq = Q * Q
    scrh1 = Q + Bsq
    Vsq = (Msq + Ssq / Qsq * (scrh1 + Q)) / (scrh1 * scrh1)
    Gsq = 1.0 / (1.0 - Vsq)
    G = jnp.sqrt(jnp.abs(Gsq))
    Chi = (Q - d * G) * (1.0 - Vsq)
    rho = d / G
    pgas = exact_div(gamma_1 * Chi, gamma)
    return Vsq, Gsq, G, Chi, rho, pgas


def _nr_f_df(Q, E, d, Bsq, Msq, Ssq, sim: SimConfig):
    """calc_func + calc_dfunc (convert_var.c:1183-1231)."""
    g1overg = sim.gamma_1 / sim.gamma
    Vsq, Gsq, G, Chi, rho, pgas = _nr_scalars(d, Bsq, Msq, Ssq, Q,
                                              sim.gamma_1, sim.gamma)
    fQ = Q - pgas + 0.5 * (1.0 + Vsq) * Bsq - (0.5 * Ssq / Q / Q) - E

    Qth = Q * Q * Q
    scrh1 = Q + Bsq
    dVsq_dQ = (Ssq * (3.0 * Q * scrh1 + Bsq * Bsq) + Msq * Qth) * \
        (-2.0 / Qth / (scrh1 * scrh1 * scrh1))
    dchi_dQ = 1.0 - Vsq - 0.5 * G * (d + 2.0 * Chi * G) * dVsq_dQ
    dp_dQ = g1overg * dchi_dQ
    dfQ = 1.0 - dp_dQ + 0.5 * Bsq * dVsq_dQ + Ssq / Qth
    return fQ, dfQ, Vsq, rho, pgas


def _sr_mhd_newton(U, Bx, sim: SimConfig, maxiter):
    """The shared Newton-Raphson on the total enthalpy Q = rho h Gamma^2
    (Cons1D_to_Prim1D / check_Prim1D, convert_var.c:613-707, :818-910).
    Returns (Q, converged, Vsq, rho, pgas, S, Bsq) with `converged` the
    nr_success==1 condition (NaN paths collapse to non-converged)."""
    D, Mx, My, Mz, E = U[0], U[1], U[2], U[3], U[4]
    By, Bz = U[5], U[6]
    Bsq = Bx ** 2 + By ** 2 + Bz ** 2
    Msq = Mx ** 2 + My ** 2 + Mz ** 2
    S = Mx * Bx + My * By + Mz * Bz
    Ssq = S ** 2
    d = D

    # initial guess: +ve root of Mignone & McKinney eqn A27 (:639-648)
    scrh1 = -4.0 * (E - Bsq)
    scrh2 = Msq - 2.0 * E * Bsq + Bsq * Bsq
    Q0 = exact_div(-scrh1 + jnp.sqrt(jnp.abs(scrh1 * scrh1 - 12.0 * scrh2)),
                   6.0)
    Q0 = jnp.where(Q0 < 0.0, d, Q0)
    bad0 = jnp.isnan(Q0)

    # the reference's tol=1e-10 (convert_var.c:91) presumes double; in f32
    # that is below machine eps, so scale it to the dtype
    tol = 1.0e-10 if U.dtype == jnp.float64 else 3.0e-6

    # The reference loop body checks convergence at the TOP, then still
    # performs one more f/df evaluation and Q update before exiting
    # (convert_var.c:654-707); a NaN in that final evaluation overrides the
    # success flag.  Mirrored exactly: `succ`/`fail` freeze a cell, and the
    # iteration where conv is first seen still updates Q.
    def body(carry):
        Q, dQstep, it, succ, fail = carry
        active = ~succ & ~fail
        conv = jnp.abs(dQstep) <= tol

        fQ, dfQ, Vsq, rho, pgas = _nr_f_df(Q, E, d, Bsq, Msq, Ssq, sim)
        nan_hit = jnp.isnan(Vsq) | jnp.isnan(fQ) | jnp.isnan(dfQ)

        # close-to-solution overshoot guard on the first iteration
        # (:683-693): Q *= 10 and re-evaluate
        first_close = (it == 0) & (jnp.abs(fQ) < 0.1)
        Q10 = Q * 10.0
        fQ2, dfQ2, _, _, _ = _nr_f_df(Q10, E, d, Bsq, Msq, Ssq, sim)
        Q = jnp.where(first_close, Q10, Q)
        fQ = jnp.where(first_close, fQ2, fQ)
        dfQ = jnp.where(first_close, dfQ2, dfQ)

        dstep = fQ / dfQ
        nan_hit = nan_hit | jnp.isnan(dstep)
        Qn = Q - dstep
        nan_hit = nan_hit | jnp.isnan(Qn)

        Qout = jnp.where(active, Qn, Q)
        dso = jnp.where(active, dstep, dQstep)
        succ_o = succ | (active & conv & ~nan_hit)
        fail_o = fail | (active & nan_hit)
        return (Qout, dso, it + 1, succ_o, fail_o)

    def cond(carry):
        _, _, it, succ, fail = carry
        return (it < maxiter) & ~jnp.all(succ | fail)

    ones = jnp.ones_like(Q0)
    init = (Q0, ones, jnp.zeros((), jnp.int32),
            jnp.zeros_like(bad0), bad0)
    Q, dQstep, _, succ, fail = jax.lax.while_loop(cond, body, init)
    converged = succ & ~fail
    Vsq, Gsq, G, Chi, rho, pgas = _nr_scalars(
        d, Bsq, Msq, Ssq, Q, sim.gamma_1, sim.gamma)
    return Q, converged, Vsq, rho, pgas, S, Bsq


def sr_mhd_cons1d_to_prim1d(U, Bx, sim: SimConfig):
    """Cons1D_to_Prim1D SR-MHD (convert_var.c:613-800): Noble-style 1D NR
    on Q with the reference's four outcome branches."""
    Q, converged, Vsq, rho, pgas, S, Bsq = _sr_mhd_newton(U, Bx, sim, 100)
    tmp1 = 1.0 / Q
    tmp2 = 1.0 / (Q + Bsq)
    Vx = (U[1] + S * Bx * tmp1) * tmp2
    Vy = (U[2] + S * U[5] * tmp1) * tmp2
    Vz = (U[3] + S * U[6] * tmp1) * tmp2

    neg_p = converged & (pgas < 0.0)
    sup_v = converged & (pgas >= 0.0) & (Vsq > 1.0)
    neg_v = converged & (pgas >= 0.0) & (Vsq <= 1.0) & (Vsq < 0.0)
    good = converged & (pgas >= 0.0) & (Vsq <= 1.0) & (Vsq >= 0.0)

    # nr_success==3: rescale v by 0.9999/|v|^2 then recompute rho/p (:739-763)
    scrh = Vx ** 2 + Vy ** 2 + Vz ** 2
    Vx3 = Vx * 0.9999 / scrh
    Vy3 = Vy * 0.9999 / scrh
    Vz3 = Vz * 0.9999 / scrh
    Vsq3 = Vx3 ** 2 + Vy3 ** 2 + Vz3 ** 2
    G3 = jnp.sqrt(jnp.abs(1.0 / (1.0 - Vsq3)))
    Chi3 = (Q - U[0] * G3) * (1.0 - Vsq3)
    rho3 = U[0] / G3
    p3 = sim.gamma_1 / sim.gamma * Chi3

    d_out = jnp.where(good | neg_p, jnp.maximum(rho, 1.0e-4),
                      jnp.where(sup_v, jnp.maximum(rho3, 1.0e-4),
                                jnp.where(neg_v, -1.0, -2.0)))
    P_out = jnp.where(good | neg_p, jnp.maximum(pgas, 1.0e-5),
                      jnp.where(sup_v, jnp.maximum(p3, 1.0e-5),
                                jnp.where(neg_v, 1.0, 2.0)))
    Vx_o = jnp.where(good | neg_p, Vx,
                     jnp.where(sup_v, Vx3, jnp.where(neg_v, 1.0, 2.0)))
    Vy_o = jnp.where(good | neg_p, Vy,
                     jnp.where(sup_v, Vy3, jnp.where(neg_v, 1.0, 2.0)))
    Vz_o = jnp.where(good | neg_p, Vz,
                     jnp.where(sup_v, Vz3, jnp.where(neg_v, 1.0, 2.0)))
    out = jnp.stack([d_out, Vx_o, Vy_o, Vz_o, P_out, U[5], U[6]])
    if U.shape[0] > 7:
        out = jnp.concatenate([out, U[7:] / U[0][None]], 0)
    return out


def sr_mhd_check_prim1d(U, Bx, sim: SimConfig):
    """check_Prim1D (convert_var.c:818-944): same NR, but failures return
    d = P = -1 (the caller tests those signs)."""
    Q, converged, Vsq, rho, pgas, S, Bsq = _sr_mhd_newton(U, Bx, sim, 1000)
    tmp1 = 1.0 / Q
    tmp2 = 1.0 / (Q + Bsq)
    Vx = (U[1] + S * Bx * tmp1) * tmp2
    Vy = (U[2] + S * U[5] * tmp1) * tmp2
    Vz = (U[3] + S * U[6] * tmp1) * tmp2
    one = jnp.ones_like(rho)
    return jnp.stack([jnp.where(converged, rho, -one),
                      jnp.where(converged, Vx, one),
                      jnp.where(converged, Vy, one),
                      jnp.where(converged, Vz, one),
                      jnp.where(converged, pgas, -one),
                      U[5], U[6]])


def sr_mhd_vsq1d_fix(U, Bx, sim: SimConfig):
    """vsq1D_fix (convert_var.c:1130-1177): replace the cell with a floor
    state (d=1, p=0.1) whose E is chosen so the secant iteration on v^2
    closes, then re-invert."""
    By, Bz = U[5], U[6]
    Bsq = Bx ** 2 + By ** 2 + Bz ** 2
    Msq = U[1] ** 2 + U[2] ** 2 + U[3] ** 2
    S = U[1] * Bx + U[2] * By + U[3] * Bz
    Ssq = S ** 2
    d = jnp.ones_like(U[0])
    p = jnp.full_like(U[0], 1.0e-1)

    def funv2(v2):
        lor2 = 1.0 / (1.0 - v2)
        lor = jnp.sqrt(lor2)
        pg = p * lor
        W = (d + pg * sim.gamma / sim.gamma_1) * lor
        f = (Ssq * (2.0 * W + Bsq) + Msq * W * W) / \
            ((W + Bsq) ** 2 * W * W) - v2
        return W, f

    v2max = 1.0 - 1.0e-8
    v2c = jnp.full_like(U[0], 0.95)
    _, fc = funv2(v2c)
    v2 = jnp.full_like(U[0], 0.96)

    def body(k, carry):
        v2, v2c, fc, done, W = carry
        Wn, f = funv2(v2)
        dW = (v2 - v2c) / (f - fc) * f
        v2n = jnp.clip(v2 - dW, 0.0, v2max)
        newly_done = (jnp.abs(v2n) < 1.0e-9) | (jnp.abs(f) < 1.0e-9)
        v2o = jnp.where(done, v2, v2n)
        return (v2o, jnp.where(done, v2c, v2),
                jnp.where(done, fc, f), done | newly_done,
                jnp.where(done, W, Wn))

    W0 = jnp.zeros_like(U[0])
    v2, _, _, _, _ = jax.lax.fori_loop(
        0, 99, body, (v2, v2c, fc, jnp.zeros_like(U[0], bool), W0))
    W, _ = funv2(v2)   # FUNV2 re-evaluated at the final v2 (:1152-1154)
    Ufix = jnp.stack([d, U[1], U[2], U[3],
                      W - p + 0.5 * (1.0 + v2) * Bsq - 0.5 * Ssq / (W * W),
                      By, Bz])
    return sr_mhd_cons1d_to_prim1d(Ufix, Bx, sim)


def sr_mhd_entropy_fix1d(U, Bx, ent, sim: SimConfig):
    """entropy_fix1D, SR-MHD (convert_var.c:1007-1120): recover W from
    (D, M, B) and the ADVECTED lab-frame entropy density ent = D·p·rho^-Γ
    instead of the (corrupted) total energy — the USE_ENTROPY_FIX stage
    of integrate_3d_vl_sr.c.  1D NR on Q with
      f(Q)  = d·p·rho^-Γ − ent                        (calc_ent_func)
      f'(Q) = d·rho^-Γ·dp_dQ − Γ·p·d·rho^-(Γ+1)·drho_dQ
              (calc_ent_dfunc — DELIBERATE DEVIATION: the reference's
              second term reads Γ·p·rho^(Γ+1)·drho_dQ, convert_var.c:
              1265, an apparent sign/factor slip in the exponent that
              makes Newton diverge for rho > 1 — i.e. exactly the dense
              post-shock cells this rescue path exists for.  The correct
              analytic derivative is used instead; the ROOT of f(Q) is
              identical, so any state the reference's iteration does
              recover agrees to the tolerance)
    Returns W (7-vector); failed cells get the reference's sentinel
    (d = P = −1, V = 1) so the caller's physicality check rejects them."""
    D, Mx, My, Mz = U[0], U[1], U[2], U[3]
    By, Bz = U[5], U[6]
    Bsq = Bx ** 2 + By ** 2 + Bz ** 2
    Msq = Mx ** 2 + My ** 2 + Mz ** 2
    S = Mx * Bx + My * By + Mz * Bz
    Ssq = S ** 2
    E = U[4]
    d = D
    gamma, g1 = sim.gamma, sim.gamma_1

    # starting guess: +ve root of A27 (same as the energy NR, :1031-1040)
    scrh1 = -4.0 * (E - Bsq)
    scrh2 = Msq - 2.0 * E * Bsq + Bsq * Bsq
    Q0 = exact_div(-scrh1 + jnp.sqrt(jnp.abs(scrh1 ** 2 - 12.0 * scrh2)),
                   6.0)
    fail0 = jnp.isnan(Q0)
    Q0 = jnp.where(Q0 < 0.0, d, Q0)

    tol = 1.0e-10 if U.dtype == jnp.float64 else 3.0e-6

    def fdf(Q):
        Vsq, Gsq, G, Chi, rho, pgas = _nr_scalars(d, Bsq, Msq, Ssq, Q,
                                                  g1, gamma)
        fQ = d * pgas * rho ** (-gamma) - ent
        Qth = Q * Q * Q
        s1 = Q + Bsq
        dVsq_dQ = (Ssq * (3.0 * Q * s1 + Bsq * Bsq) + Msq * Qth) * \
            (-2.0 / Qth / (s1 * s1 * s1))
        dchi_dQ = 1.0 - Vsq - 0.5 * G * (d + 2.0 * Chi * G) * dVsq_dQ
        drho_dQ = -0.5 * d * G * dVsq_dQ
        dp_dQ = exact_div(g1, gamma) * dchi_dQ
        dfQ = d * rho ** (-gamma) * dp_dQ \
            - gamma * pgas * d * rho ** (-(gamma + 1.0)) * drho_dQ
        return fQ, dfQ

    def body(carry):
        Q, dQstep, it, succ, fail = carry
        active = ~succ & ~fail
        conv = jnp.abs(dQstep) <= tol
        fQ, dfQ = fdf(Q)
        nan_hit = jnp.isnan(fQ) | jnp.isnan(dfQ)
        dstep = fQ / dfQ
        nan_hit = nan_hit | jnp.isnan(dstep)
        Qn = Q - dstep
        nan_hit = nan_hit | jnp.isnan(Qn)
        Qout = jnp.where(active, Qn, Q)
        dso = jnp.where(active, dstep, dQstep)
        succ_o = succ | (active & conv & ~nan_hit)
        fail_o = fail | (active & nan_hit)
        return (Qout, dso, it + 1, succ_o, fail_o)

    def cond(carry):
        _, _, it, succ, fail = carry
        return (it < 1000) & ~jnp.all(succ | fail)

    init = (Q0, jnp.ones_like(Q0), jnp.zeros((), jnp.int32),
            jnp.zeros_like(fail0), fail0)
    Q, _, _, succ, fail = jax.lax.while_loop(cond, body, init)
    ok = succ & ~fail

    Vsq, Gsq, G, Chi, rho, pgas = _nr_scalars(d, Bsq, Msq, Ssq, Q,
                                              g1, gamma)
    tmp1 = 1.0 / Q
    tmp2 = 1.0 / (Q + Bsq)
    Vx = (Mx + S * Bx * tmp1) * tmp2
    Vy = (My + S * By * tmp1) * tmp2
    Vz = (Mz + S * Bz * tmp1) * tmp2
    one = jnp.ones_like(rho)
    W = jnp.stack([
        jnp.where(ok, rho, -one),
        jnp.where(ok, Vx, one),
        jnp.where(ok, Vy, one),
        jnp.where(ok, Vz, one),
        jnp.where(ok, pgas, -one),
        By, Bz])
    return W
