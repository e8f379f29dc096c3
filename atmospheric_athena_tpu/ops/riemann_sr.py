"""Special-relativistic Riemann solvers: HLLE/HLLC (hydro) and
HLLE/HLLD (MHD).

Reference: src/rsolvers/hlle_sr.c (flux_LR :324-376, getVChar_pluto
:393-500 hydro branches, HLL average :176-230) and hllc_sr.c (the
contact-restoring quadratic, Mignone & Bodo 2005).  Branch-free stacked
formulation; superluminal/NaN wave-speed guards collapse to (-1, 1)
exactly like the reference's fallbacks.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SimConfig


def _flux_lr(U, W, sim: SimConfig):
    """flux_LR (hlle_sr.c:324-376), hydro."""
    d, Vx, Vy, Vz, P = W[0], W[1], W[2], W[3], W[4]
    h = 1.0 + sim.gamma / sim.gamma_1 * P / d
    gsq = (U[0] / d) ** 2
    wtg2 = d * h * gsq
    return jnp.stack([U[0] * Vx,
                      wtg2 * Vx * Vx + P,
                      wtg2 * Vy * Vx,
                      wtg2 * Vz * Vx,
                      U[1]]), P


def _vchar(W, sim: SimConfig):
    """getVChar_pluto hydro reduction (hlle_sr.c:440-470 with B = 0):
    roots of (1-cs^2) gamma^2 (v_x - lam)^2 = cs^2 (1 - lam^2)."""
    d, Vx, Vy, Vz, P = W[0], W[1], W[2], W[3], W[4]
    rhoh = d + (sim.gamma / sim.gamma_1) * P
    vsq = Vx ** 2 + Vy ** 2 + Vz ** 2
    cssq = jnp.clip(sim.gamma * P / rhoh, 0.0, 1.0)
    gamma2 = 1.0 / (1.0 - vsq)

    # vsq ~ 0 limit (hlle_sr.c:432-447 with bsq=0): lam = +-cs
    cs = jnp.sqrt(cssq)
    scrh1 = (1.0 - cssq) * gamma2
    scrh2 = -cssq
    a2 = scrh1 - scrh2
    a1 = -2.0 * Vx * scrh1
    a0 = Vx ** 2 * scrh1 + scrh2
    disc = jnp.sqrt(jnp.maximum(a1 * a1 - 4.0 * a2 * a0, 0.0))
    lp = 0.5 * (-a1 + disc) / a2
    lm = 0.5 * (-a1 - disc) / a2
    tiny = vsq < 1.0e-12
    lp = jnp.where(tiny, cs, lp)
    lm = jnp.where(tiny, -cs, lm)
    # superluminal input guard (hlle_sr.c:424-430)
    badv = vsq > 1.0
    return jnp.where(badv, -1.0, lm), jnp.where(badv, 1.0, lp)


def _signal_speeds(Wl, Wr, sim: SimConfig):
    lml, lpl = _vchar(Wl, sim)
    lmr, lpr = _vchar(Wr, sim)
    Sl = jnp.minimum(lml, lmr)
    Sr = jnp.maximum(lpl, lpr)
    # NaN / superluminal guards -> full light-cone (hlle_sr.c:85-111)
    bad = jnp.isnan(Sl) | jnp.isnan(Sr) | (Sl < -1.0) | (Sr > 1.0)
    return jnp.where(bad, -1.0, Sl), jnp.where(bad, 1.0, Sr)


def hlle_sr(Ul, Ur, Wl, Wr, Bxi, sim: SimConfig, etah=None):
    Sl, Sr = _signal_speeds(Wl, Wr, sim)
    Fl, _ = _flux_lr(Ul, Wl, sim)
    Fr, _ = _flux_lr(Ur, Wr, sim)
    dS_1 = 1.0 / (Sr - Sl)
    Fhll = (Sr * Fl - Sl * Fr + Sr * Sl * (Ur - Ul)) * dS_1
    return jnp.where(Sl >= 0.0, Fl, jnp.where(Sr <= 0.0, Fr, Fhll))


def hllc_sr(Ul, Ur, Wl, Wr, Bxi, sim: SimConfig, etah=None):
    """HLLC (hllc_sr.c:77-235, Mignone & Bodo 2005): contact speed from the
    stable Citardauq quadratic on the HLL state (Eq 18, hllc_sr.c:157-163),
    star states per Mignone Eq 16, star fluxes per Eq 14."""
    lml, lmr = _signal_speeds(Wl, Wr, sim)
    Fl, _ = _flux_lr(Ul, Wl, sim)
    Fr, _ = _flux_lr(Ur, Wr, sim)
    ov = 1.0 / (lmr - lml)
    ll = lml * lmr
    Uhll = (lmr * Ur - lml * Ul + Fl - Fr) * ov
    Fhll = (lmr * Fl - lml * Fr + ll * (Ur - Ul)) * ov

    a = Fhll[4]
    b = -(Uhll[4] + Fhll[1])
    c = Uhll[1]
    quad = -0.5 * (b + jnp.sign(b) *
                   jnp.sqrt(jnp.maximum(b * b - 4.0 * a * c, 0.0)))
    lmdas = c / quad
    ps = -Fhll[4] * lmdas + Fhll[1]

    def star_flux(lmda, U, F, W):
        """Mignone Eq 16 star state + Eq 14 flux (hllc_sr.c:183-222)."""
        den = 1.0 / (lmda - lmdas)
        fac = lmda - W[1]
        Us = jnp.stack([
            U[0] * fac * den,
            (U[1] * fac + ps - W[4]) * den,
            U[2] * fac * den,
            U[3] * fac * den,
            (U[4] * fac + ps * lmdas - W[4] * W[1]) * den])
        return lmda * (Us - U) + F

    Fls = star_flux(lml, Ul, Fl, Wl)
    Frs = star_flux(lmr, Ur, Fr, Wr)
    return jnp.where(lml >= 0.0, Fl,
                     jnp.where(lmdas >= 0.0, Fls,
                               jnp.where(lmr >= 0.0, Frs, Fr)))


# ===========================================================================
# SR MHD (hlle_sr.c / hlld_sr.c MHD sections)
#
# 7-variable sweep stacks (d, Mx, My, Mz, E, By, Bz) with Bx passed
# separately, matching the Newtonian MHD sweep convention.
# ===========================================================================


def _flux_lr_mhd(U, W, Bx, sim: SimConfig):
    """flux_LR with the MHD terms (hlle_sr.c:324-375)."""
    d, Vx, Vy, Vz, P, By, Bz = (W[i] for i in range(7))
    theta = P / d
    gmmr = sim.gamma / sim.gamma_1
    h = 1.0 + gmmr * theta
    g = U[0] / d
    g2 = g * g
    g_2 = 1.0 / g2
    pt = P
    wtg2 = d * h * g2

    vB = Vx * Bx + Vy * By + Vz * Bz
    Bmag2 = Bx ** 2 + By ** 2 + Bz ** 2
    bx = g * (Bx * g_2 + vB * Vx)
    by = g * (By * g_2 + vB * Vy)
    bz = g * (Bz * g_2 + vB * Vz)
    b2 = Bmag2 * g_2 + vB * vB
    pt = pt + 0.5 * b2
    wtg2 = wtg2 + b2 * g2

    return jnp.stack([
        U[0] * Vx,
        wtg2 * Vx * Vx + pt - bx * bx,
        wtg2 * Vy * Vx - by * bx,
        wtg2 * Vz * Vx - bz * bx,
        U[1],
        Vx * By - Bx * Vy,
        Vx * Bz - Bx * Vz]), pt


def _cubic(b, c, d):
    """CUBIC (hlle_sr.c:726-800): all-real-roots closed form, ascending."""
    one_3 = 1.0 / 3.0
    one_27 = 1.0 / 27.0
    b2 = b * b
    f = c * (1.0 - 1.0e-16) - b2 * one_3
    g = b * (2.0 * b2 - 9.0 * c) * one_27 + d
    i2 = jnp.maximum(-f * f * f * one_27, 0.0)
    i = jnp.sqrt(i2)
    j = jnp.cbrt(i)
    k = jnp.clip(-0.5 * g / jnp.where(i == 0.0, 1.0, i), -1.0, 1.0)
    k = jnp.where(i == 0.0, jnp.where(g <= 0.0, 1.0, -1.0), k)
    k = jnp.arccos(k) * one_3
    m = jnp.cos(k)
    n = jnp.sqrt(3.0) * jnp.sin(k)
    p = -b * one_3
    return (-j * (m + n) + p, -j * (m - n) + p, 2.0 * j * m + p)


def _quartic(b, c, d, e):
    """QUARTIC (hlle_sr.c:626-693).  Returns (z0..z3, fail)."""
    three_256 = 3.0 / 256.0
    one_64 = 1.0 / 64.0
    b2 = b * b
    f = c - b2 * 0.375
    g = d + b2 * b * 0.125 - b * c * 0.5
    h = e - b2 * b2 * three_256 + 0.0625 * b2 * c - 0.25 * b * d

    u0, u1, u2 = _cubic(0.5 * f, (f * f - 4.0 * h) * 0.0625,
                        -g * g * one_64)

    # branch u[1] < 1e-14: double roots
    p_a = jnp.sqrt(jnp.abs(u2))
    s = 0.25 * b
    za0 = -p_a - s
    za1 = p_a - s

    p_b = jnp.sqrt(jnp.abs(u1))
    q_b = jnp.sqrt(jnp.abs(u2))
    denom = p_b * q_b
    r = -0.125 * g / jnp.where(denom == 0.0, 1.0, denom)
    zb0 = -p_b - q_b + r - s
    zb1 = p_b - q_b - r - s
    zb2 = -p_b + q_b - r - s
    zb3 = p_b + q_b + r - s

    dbl = u1 < 1.0e-14
    z0 = jnp.where(dbl, za0, zb0)
    z1 = jnp.where(dbl, za1, zb1)
    z2 = jnp.where(dbl, za0, zb2)
    z3 = jnp.where(dbl, za1, zb3)

    fail = jnp.zeros_like(b, bool)
    for z in (z0, z1, z2, z3):
        res = e + z * (d + z * (c + z * (b + z)))
        fail = fail | jnp.isnan(res) | (jnp.abs(res) > 1.0e-6)
    return z0, z1, z2, z3, fail


def _vchar_pluto_mhd(W, Bx, sim: SimConfig):
    """getVChar_pluto with B (hlle_sr.c:392-524).  Returns (lm, lp);
    failures collapse to (-1, 1) exactly like the reference."""
    d, Vx, Vy, Vz, P, By, Bz = (W[i] for i in range(7))
    rhoh = d + (sim.gamma / sim.gamma_1) * P
    Vx2 = Vx ** 2
    vsq = Vx2 + Vy ** 2 + Vz ** 2
    superluminal = vsq > 1.0
    gamma2 = 1.0 / (1.0 - vsq)

    Bsq = Bx ** 2 + By ** 2 + Bz ** 2
    vDotB = Vx * Bx + Vy * By + Vz * Bz
    vDotBsq = vDotB ** 2
    bx = Bx / gamma2 + Vx * vDotB
    bsq = Bsq / gamma2 + vDotB ** 2

    cssq = jnp.clip((sim.gamma * P) / rhoh, 0.0, 1.0)
    bsq = jnp.maximum(bsq, 0.0)
    vasq = bsq / (rhoh + bsq)
    bsq = jnp.where(vasq > 1.0, rhoh + bsq, bsq)

    w_1 = 1.0 / (rhoh + bsq)

    # --- branch 1: vsq < 1e-12 (hlle_sr.c:434-448)
    eps2_s = cssq + bsq * w_1 * (1.0 - cssq)
    a0_s = cssq * Bx * Bx * w_1
    a1_s = -a0_s - eps2_s
    scrh_s = jnp.maximum(a1_s * a1_s - 4.0 * a0_s, 0.0)
    lam_s = jnp.sqrt(0.5 * (-a1_s + jnp.sqrt(scrh_s)))

    # --- branch 2: Bx < 1e-14 quadratic (hlle_sr.c:452-467)
    scrh1_q = (1.0 - eps2_s) * gamma2
    scrh2_q = cssq * vDotBsq * w_1 - eps2_s
    a2_q = scrh1_q - scrh2_q
    a1_q = -2.0 * Vx * scrh1_q
    a0_q = Vx2 * scrh1_q + scrh2_q
    disc_q = jnp.sqrt(jnp.abs(a1_q * a1_q - 4.0 * a2_q * a0_q))
    lp_q = 0.5 * (-a1_q + disc_q) / a2_q
    lm_q = 0.5 * (-a1_q - disc_q) / a2_q

    # --- branch 3: full quartic (hlle_sr.c:469-520)
    scrh2_f = bx * bx
    a2_w = cssq * w_1
    eps2 = (cssq * rhoh + bsq) * w_1
    one_m_eps2 = gamma2 * rhoh * (1.0 - cssq) * w_1
    scrh = 2.0 * (a2_w * vDotB * bx - eps2 * Vx)
    a4 = one_m_eps2 - a2_w * vDotBsq + eps2
    a3 = -4.0 * Vx * one_m_eps2 + scrh
    a2 = 6.0 * Vx2 * one_m_eps2 + a2_w * (vDotBsq - scrh2_f) + \
        eps2 * (Vx2 - 1.0)
    a1 = -4.0 * Vx * Vx2 * one_m_eps2 - scrh
    a0 = Vx2 * Vx2 * one_m_eps2 + a2_w * scrh2_f - eps2 * Vx2
    a4_bad = a4 < 1.0e-12
    ia4 = 1.0 / jnp.where(a4_bad, 1.0, a4)
    z0, z1, z2, z3, qfail = _quartic(a3 * ia4, a2 * ia4, a1 * ia4, a0 * ia4)
    lp_f = jnp.minimum(1.0, jnp.maximum(jnp.maximum(z3, z2),
                                        jnp.maximum(z1, z0)))
    lm_f = jnp.maximum(-1.0, jnp.minimum(jnp.minimum(z3, z2),
                                         jnp.minimum(z1, z0)))
    fail_f = a4_bad | qfail
    lp_f = jnp.where(fail_f, 1.0, lp_f)
    lm_f = jnp.where(fail_f, -1.0, lm_f)

    small_v = vsq < 1.0e-12
    # NB: the reference's branch test is SIGNED (`Bx < 1.0e-14`,
    # hlle_sr.c:452) — any negative Bx takes the quadratic limit.  Mirrored
    # verbatim for parity.
    small_bx = Bx < 1.0e-14
    lm = jnp.where(small_v, -lam_s, jnp.where(small_bx, lm_q, lm_f))
    lp = jnp.where(small_v, lam_s, jnp.where(small_bx, lp_q, lp_f))
    lm = jnp.where(superluminal, -1.0, lm)
    lp = jnp.where(superluminal, 1.0, lp)
    return lm, lp


def _vchar_echo_mhd(W, Bx, sim: SimConfig):
    """getVChar_echo (hlle_sr.c:542-592): fast-speed bound estimate."""
    d, Vx, Vy, Vz, P, By, Bz = (W[i] for i in range(7))
    rhoh = d + (sim.gamma / sim.gamma_1) * P
    vsq = Vx ** 2 + Vy ** 2 + Vz ** 2
    gamma2 = 1.0 / (1.0 - vsq)
    Bsq = Bx ** 2 + By ** 2 + Bz ** 2
    vDotB = Vx * Bx + Vy * By + Vz * Bz
    bsq = Bsq / gamma2 + vDotB ** 2

    cssq = (sim.gamma * P) / rhoh
    vasq = bsq / (rhoh + bsq)
    asq = cssq + vasq - cssq * vasq
    cssq = jnp.clip(cssq, 0.0, 1.0)
    vasq = jnp.minimum(vasq, 0.0)   # sic: the reference zeroes vasq>0
    asq = jnp.clip(asq, 0.0, 1.0)

    tmp1 = 1.0 - asq
    tmp2 = 1.0 - vsq
    tmp3 = 1.0 - vsq * asq
    tmp4 = Vx ** 2
    tmp5 = 1.0 / tmp3
    root = jnp.sqrt(asq * tmp2 * (tmp3 - tmp1 * tmp4))
    vm = (tmp1 * Vx - root) * tmp5
    vp = (tmp1 * Vx + root) * tmp5
    return jnp.minimum(vm, vp), jnp.maximum(vm, vp)


def _signal_speeds_mhd(Wl, Wr, Bx, sim: SimConfig):
    """Steps 1-1a of the SR MHD solvers: PLUTO speeds with the ECHO
    fallback; a bad ECHO result forces (-1,1) and flags switch_to_hll
    (hlld_sr.c:112-183)."""
    lml, lpl = _vchar_pluto_mhd(Wl, Bx, sim)
    lmr, lpr = _vchar_pluto_mhd(Wr, Bx, sim)
    Sl = jnp.minimum(lml, lmr)
    Sr = jnp.maximum(lpl, lpr)
    bad = jnp.isnan(Sl) | jnp.isnan(Sr) | (Sl < -1.0) | (Sr > 1.0)

    eml, epl = _vchar_echo_mhd(Wl, Bx, sim)
    emr, epr = _vchar_echo_mhd(Wr, Bx, sim)
    Sle = jnp.minimum(eml, emr)
    Sre = jnp.maximum(epl, epr)
    bade = jnp.isnan(Sle) | jnp.isnan(Sre) | (Sle < -1.0) | (Sre > 1.0)
    Sle = jnp.where(bade, -1.0, Sle)
    Sre = jnp.where(bade, 1.0, Sre)

    Sl = jnp.where(bad, Sle, Sl)
    Sr = jnp.where(bad, Sre, Sr)
    return Sl, Sr, bad & bade


def entropy_flux_mhd(Ul, Ur, Wl, Wr, Bxi, sim: SimConfig):
    """entropy_flux (hlle_sr.c:218-322): the HLLE blend of the lab-frame
    entropy-density flux F_S = S·Vx with S = D·p·rho^-Γ, using the same
    PLUTO/ECHO signal speeds as the SR-MHD solvers.  Used by the
    USE_ENTROPY_FIX stage of the VL SR-MHD integrator."""
    gamma = sim.gamma
    WSl = Wl[4] * Wl[0] ** (1.0 - gamma)
    WSr = Wr[4] * Wr[0] ** (1.0 - gamma)
    USl = WSl * Ul[0] / Wl[0]
    USr = WSr * Ur[0] / Wr[0]
    Fl = USl * Wl[1]
    Fr = USr * Wr[1]
    Sl, Sr, _ = _signal_speeds_mhd(Wl, Wr, Bxi, sim)
    dS_1 = 1.0 / (Sr - Sl)
    Fhll = (Sr * Fl - Sl * Fr + Sl * Sr * (USr - USl)) * dS_1
    return jnp.where(Sl >= 0.0, Fl, jnp.where(Sr <= 0.0, Fr, Fhll))


def hlle_sr_mhd(Ul, Ur, Wl, Wr, Bxi, sim: SimConfig, etah=None):
    """HLLE, SR MHD (hlle_sr.c:64-213)."""
    Sl, Sr, _ = _signal_speeds_mhd(Wl, Wr, Bxi, sim)
    Fl, _ = _flux_lr_mhd(Ul, Wl, Bxi, sim)
    Fr, _ = _flux_lr_mhd(Ur, Wr, Bxi, sim)
    dS_1 = 1.0 / (Sr - Sl)
    Fhll = (Sr * Fl - Sl * Fr + Sl * Sr * (Ur - Ul)) * dS_1
    return jnp.where(Sl >= 0.0, Fl, jnp.where(Sr <= 0.0, Fr, Fhll))


def _get_riemann_state(R, S, p, side, Bx):
    """GET_RIEMANN_STATE (hlld_sr.c:574-616).  R: dict of the jump
    invariants; returns the per-side state dict."""
    A = R["M1"] + p * (1.0 - S * S) - S * R["EN"]
    C = R["B2"] * R["M2"] + R["B3"] * R["M3"]
    G = R["B2"] * R["B2"] + R["B3"] * R["B3"]
    X = Bx * (A * S * Bx + C) - (A + G) * (S * p + R["EN"])

    vx = Bx * (A * Bx + C * S) - (R["M1"] + p) * (G + A)
    vy = (-(A + G - Bx * Bx * (1.0 - S * S)) * R["M2"]
          + R["B2"] * (C + Bx * (S * R["M1"] - R["EN"])))
    vz = (-(A + G - Bx * Bx * (1.0 - S * S)) * R["M3"]
          + R["B3"] * (C + Bx * (S * R["M1"] - R["EN"])))

    scrh = vx * R["M1"] + vy * R["M2"] + vz * R["M3"]
    scrh = X * R["EN"] - scrh
    w = p + scrh / (X * S - vx)
    wfail = w < 0.0

    vx = vx / X
    vy = vy / X
    vz = vz / X
    By = -(R["B2"] * (S * p + R["EN"]) - Bx * R["M2"]) / A
    Bz = -(R["B3"] * (S * p + R["EN"]) - Bx * R["M3"]) / A

    s = jnp.where(Bx > 0.0, 1.0, -1.0)
    if side < 0:
        s = -s
    sw = s * jnp.sqrt(jnp.abs(w))     # w<0 -> flagged; abs avoids NaN here
    sw = jnp.where(wfail, jnp.nan, sw)  # keep the reference's NaN semantics

    scrh = 1.0 / (S * p + R["EN"] + Bx * sw)
    Kx = scrh * (R["M1"] + p + R["B1"] * sw)
    Ky = scrh * (R["M2"] + R["B2"] * sw)
    Kz = scrh * (R["M3"] + R["B3"] * sw)
    K2 = Kx * Kx + Ky * Ky + Kz * Kz
    return dict(vx=vx, vy=vy, vz=vz, By=By, Bz=Bz, sw=sw, w=w,
                Kx=Kx, Ky=Ky, Kz=Kz, K2=K2, S=S)


def _fstar(RL, RR, Sl, Sr, p, Bx):
    """Fstar (hlld_sr.c:505-563): evaluate both side states at total
    pressure p; returns (fun, Sc, PaL, PaR, fail)."""
    PaL = _get_riemann_state(RL, Sl, p, -1, Bx)
    PaR = _get_riemann_state(RR, Sr, p, +1, Bx)

    dK = PaR["Kx"] - PaL["Kx"] + 1.0e-12
    Bxc = Bx * dK
    Byc = (PaR["By"] * (PaR["Kx"] - PaR["vx"])
           - PaL["By"] * (PaL["Kx"] - PaL["vx"])
           + Bx * (PaR["vy"] - PaL["vy"]))
    Bzc = (PaR["Bz"] * (PaR["Kx"] - PaR["vx"])
           - PaL["Bz"] * (PaL["Kx"] - PaL["vx"])
           + Bx * (PaR["vz"] - PaL["vz"]))
    KLBc = PaL["Kx"] * Bxc + PaL["Ky"] * Byc + PaL["Kz"] * Bzc
    KRBc = PaR["Kx"] * Bxc + PaR["Ky"] * Byc + PaR["Kz"] * Bzc
    vxcL = PaL["Kx"] - dK * Bx * (1.0 - PaL["K2"]) / (PaL["sw"] * dK - KLBc)
    vxcR = PaR["Kx"] - dK * Bx * (1.0 - PaR["K2"]) / (PaR["sw"] * dK - KRBc)

    Sc = 0.5 * (vxcL + vxcR)
    fun = vxcL - vxcR

    ok = (vxcL - PaL["Kx"]) > -1.0e-6
    ok = ok & ((PaR["Kx"] - vxcR) > -1.0e-6)
    ok = ok & ((Sl - PaL["vx"]) < 0.0)
    ok = ok & ((Sr - PaR["vx"]) > 0.0)
    ok = ok & ((PaR["w"] - p) > 0.0)
    ok = ok & ((PaL["w"] - p) > 0.0)
    ok = ok & ((PaL["Kx"] - Sl) > -1.0e-6)
    ok = ok & ((Sr - PaR["Kx"]) > -1.0e-6)
    return fun, Sc, PaL, PaR, ~ok


def _get_astate(Pa, R, p, Bx):
    """GET_ASTATE (hlld_sr.c:621-639): the state behind the fast wave."""
    scrh = 1.0 / (Pa["S"] - Pa["vx"])
    DN = R["DN"] * scrh
    B1 = Bx * jnp.ones_like(DN)
    B2 = (R["B2"] - Bx * Pa["vy"]) * scrh
    B3 = (R["B3"] - Bx * Pa["vz"]) * scrh
    vB = Pa["vx"] * B1 + Pa["vy"] * B2 + Pa["vz"] * B3
    EN = (R["EN"] + p * Pa["vx"] - vB * Bx) * scrh
    M1 = (EN + p) * Pa["vx"] - vB * B1
    M2 = (EN + p) * Pa["vy"] - vB * B2
    M3 = (EN + p) * Pa["vz"] - vB * B3
    return dict(DN=DN, M1=M1, M2=M2, M3=M3, EN=EN, B1=B1, B2=B2, B3=B3)


def hlld_sr(Ul, Ur, Wl, Wr, Bxi, sim: SimConfig, etah=None):
    """HLLD, SR MHD (hlld_sr.c:98-498, Mignone Ugliano & Bodo 2009):
    five-wave fan with a secant iteration on the total pressure; any
    failure falls back per-interface to the HLL flux, as the reference
    does.  Vectorized: the serial secant becomes a masked fixed-trip loop
    with per-interface freeze/fallback flags."""
    from ..eos_sr import sr_mhd_check_prim1d

    Sl, Sr, hll0 = _signal_speeds_mhd(Wl, Wr, Bxi, sim)
    Fl, _ = _flux_lr_mhd(Ul, Wl, Bxi, sim)
    Fr, _ = _flux_lr_mhd(Ur, Wr, Bxi, sim)

    dS_1 = 1.0 / (Sr - Sl)
    Uhll = (Sr * Ur - Sl * Ul + Fl - Fr) * dS_1
    Fhll = (Sr * Fl - Sl * Fr + Sl * Sr * (Ur - Ul)) * dS_1

    RL = dict(DN=Sl * Ul[0] - Fl[0], EN=Sl * Ul[4] - Fl[4],
              M1=Sl * Ul[1] - Fl[1], M2=Sl * Ul[2] - Fl[2],
              M3=Sl * Ul[3] - Fl[3], B1=Sl * Bxi * jnp.ones_like(Ul[0]),
              B2=Sl * Ul[5] - Fl[5], B3=Sl * Ul[6] - Fl[6])
    RR = dict(DN=Sr * Ur[0] - Fr[0], EN=Sr * Ur[4] - Fr[4],
              M1=Sr * Ur[1] - Fr[1], M2=Sr * Ur[2] - Fr[2],
              M3=Sr * Ur[3] - Fr[3], B1=Sr * Bxi * jnp.ones_like(Ur[0]),
              B2=Sr * Ur[5] - Fr[5], B3=Sr * Ur[6] - Fr[6])
    Bx = Bxi * jnp.ones_like(Ul[0])

    # --- initial pressure guess (hlld_sr.c:299-324)
    a_q = Sr - Sl
    b_q = RR["EN"] - RL["EN"] + Sr * RL["M1"] - Sl * RR["M1"]
    c_q = RL["M1"] * RR["EN"] - RR["M1"] * RL["EN"]
    scrh = jnp.maximum(b_q * b_q - 4.0 * a_q * c_q, 0.0)
    p0_quad = 0.5 * (-b_q + jnp.sqrt(scrh)) * dS_1

    Whll = sr_mhd_check_prim1d(Uhll, Bx, sim)
    vel2 = Whll[1] ** 2 + Whll[2] ** 2 + Whll[3] ** 2
    Bmag2 = Bx ** 2 + Whll[5] ** 2 + Whll[6] ** 2
    vB_h = Whll[1] * Bx + Whll[2] * Whll[5] + Whll[3] * Whll[6]
    p0_hll = Whll[4] + 0.5 * (Bmag2 * (1.0 - vel2) + vB_h * vB_h)
    small_b = Bx * Bx / jnp.maximum(Wl[4], Wr[4]) < 0.01
    p0 = jnp.where(small_b, p0_quad, p0_hll)

    f0, Sc0, PaL0, PaR0, fail0 = _fstar(RL, RR, Sl, Sr, p0, Bx)
    hll = hll0 | jnp.isnan(f0) | fail0

    # --- secant loop (hlld_sr.c:346-367): masked fixed-trip vectorization
    # of the serial per-interface iteration with its exact break rules
    skip = (jnp.abs(f0) <= 1.0e-12) | hll
    state = dict(p=jnp.where(skip, p0, 1.025 * p0), p0=p0,
                 f=f0, f0=f0, Sc=Sc0, PaL=PaL0, PaR=PaR0,
                 done=skip, hll=hll)

    for k in range(1, 9):
        fun, Sc, PaL, PaR, fail = _fstar(RL, RR, Sl, Sr, state["p"], Bx)
        bad = jnp.isnan(fun) | fail | (k > 7) | \
            ((jnp.abs(fun) > jnp.abs(state["f0"])) & (k > 4))
        act = ~state["done"]
        new_hll = act & bad
        # commit this evaluation's side states for active lanes
        merge = lambda old, new: {kk: jnp.where(act, new[kk], old[kk])
                                  for kk in old}
        state["PaL"] = merge(state["PaL"], PaL)
        state["PaR"] = merge(state["PaR"], PaR)
        state["Sc"] = jnp.where(act, Sc, state["Sc"])
        state["f"] = jnp.where(act, fun, state["f"])
        dp = (state["p"] - state["p0"]) / (fun - state["f0"]) * fun
        pn = state["p"] - dp
        pn = jnp.where(pn < 0.0, 1.0e-6, pn)
        upd = act & ~bad
        state["p0"] = jnp.where(upd, state["p"], state["p0"])
        state["f0"] = jnp.where(upd, fun, state["f0"])
        state["p"] = jnp.where(upd, pn, state["p"])
        conv = (jnp.abs(dp) < 1.0e-5 * pn) | (jnp.abs(fun) < 1.0e-6)
        state["hll"] = state["hll"] | new_hll
        state["done"] = state["done"] | new_hll | (upd & conv)

    p = state["p"]
    PaL, PaR, Sc = state["PaL"], state["PaR"], state["Sc"]
    hll = state["hll"] | jnp.isnan(state["f"])

    # --- assemble the four candidate fluxes (hlld_sr.c:378-496)
    uaL = _get_astate(PaL, RL, p, Bx)
    uaR = _get_astate(PaR, RR, p, Bx)
    SaL = PaL["Kx"]
    SaR = PaR["Kx"]

    FaL = jnp.stack([Fl[0] + Sl * (uaL["DN"] - Ul[0]),
                     Fl[1] + Sl * (uaL["M1"] - Ul[1]),
                     Fl[2] + Sl * (uaL["M2"] - Ul[2]),
                     Fl[3] + Sl * (uaL["M3"] - Ul[3]),
                     Fl[4] + Sl * (uaL["EN"] - Ul[4]),
                     Fl[5] + Sl * (uaL["B2"] - Ul[5]),
                     Fl[6] + Sl * (uaL["B3"] - Ul[6])])
    FaR = jnp.stack([Fr[0] + Sr * (uaR["DN"] - Ur[0]),
                     Fr[1] + Sr * (uaR["M1"] - Ur[1]),
                     Fr[2] + Sr * (uaR["M2"] - Ur[2]),
                     Fr[3] + Sr * (uaR["M3"] - Ur[3]),
                     Fr[4] + Sr * (uaR["EN"] - Ur[4]),
                     Fr[5] + Sr * (uaR["B2"] - Ur[5]),
                     Fr[6] + Sr * (uaR["B3"] - Ur[6])])

    # contact (C) state (GET_CSTATE, hlld_sr.c:646-716)
    dK = (PaR["Kx"] - PaL["Kx"]) + 1.0e-12
    Byc = (PaR["By"] * (PaR["Kx"] - PaR["vx"])
           - PaL["By"] * (PaL["Kx"] - PaL["vx"])
           + Bx * (PaR["vy"] - PaL["vy"])) / dK
    Bzc = (PaR["Bz"] * (PaR["Kx"] - PaR["vx"])
           - PaL["Bz"] * (PaL["Kx"] - PaL["vx"])
           + Bx * (PaR["vz"] - PaL["vz"])) / dK
    Bxc = Bx
    KLBc = PaL["Kx"] * Bxc + PaL["Ky"] * Byc + PaL["Kz"] * Bzc
    KRBc = PaR["Kx"] * Bxc + PaR["Ky"] * Byc + PaR["Kz"] * Bzc
    scrhL = (1.0 - PaL["K2"]) / (PaL["sw"] - KLBc)
    scrhR = (1.0 - PaR["K2"]) / (PaR["sw"] - KRBc)
    vxc = 0.5 * ((PaL["Kx"] - Bxc * scrhL) + (PaR["Kx"] - Bxc * scrhR))
    vyc = 0.5 * ((PaL["Ky"] - Byc * scrhL) + (PaR["Ky"] - Byc * scrhR))
    vzc = 0.5 * ((PaL["Kz"] - Bzc * scrhL) + (PaR["Kz"] - Bzc * scrhR))

    useL = vxc > 0.0
    ua = {kk: jnp.where(useL, uaL[kk], uaR[kk]) for kk in uaL}
    Sa = jnp.where(useL, SaL, SaR)
    vxa = jnp.where(useL, PaL["vx"], PaR["vx"])

    vBc = vxc * Bxc + vyc * Byc + vzc * Bzc
    DNc = ua["DN"] * (Sa - vxa) / (Sa - vxc)
    ENc = (Sa * ua["EN"] - ua["M1"] + p * vxc - vBc * Bx) / (Sa - vxc)
    M1c = (ENc + p) * vxc - vBc * Bx
    M2c = (ENc + p) * vyc - vBc * Byc
    M3c = (ENc + p) * vzc - vBc * Bzc

    FcL = jnp.stack([FaL[0] + SaL * (DNc - uaL["DN"]),
                     FaL[1] + SaL * (M1c - uaL["M1"]),
                     FaL[2] + SaL * (M2c - uaL["M2"]),
                     FaL[3] + SaL * (M3c - uaL["M3"]),
                     FaL[4] + SaL * (ENc - uaL["EN"]),
                     FaL[5] + SaL * (Byc - uaL["B2"]),
                     FaL[6] + SaL * (Bzc - uaL["B3"])])
    FcR = jnp.stack([FaR[0] + SaR * (DNc - uaR["DN"]),
                     FaR[1] + SaR * (M1c - uaR["M1"]),
                     FaR[2] + SaR * (M2c - uaR["M2"]),
                     FaR[3] + SaR * (M3c - uaR["M3"]),
                     FaR[4] + SaR * (ENc - uaR["EN"]),
                     FaR[5] + SaR * (Byc - uaR["B2"]),
                     FaR[6] + SaR * (Bzc - uaR["B3"])])

    # region select (hlld_sr.c:378-496), NaN guard -> HLL per interface
    inner = jnp.where(SaL >= -1.0e-6, FaL,
                      jnp.where(SaR <= 1.0e-6, FaR,
                                jnp.where(Sc > 0.0, FcL, FcR)))
    inner = jnp.where(jnp.any(jnp.isnan(inner), axis=0, keepdims=True),
                      Fhll, inner)
    F = jnp.where(hll, Fhll, inner)
    return jnp.where(Sl >= 0.0, Fl, jnp.where(Sr <= 0.0, Fr, F))


# ===========================================================================
# Exact SR hydro solver (exact_sr.c; Rezzolla, Zanotti & Pons 2003 "RZP",
# Pons, Marti & Mueller 2000)
# ===========================================================================

import numpy as np
import jax

_GL_X, _GL_W = np.polynomial.legendre.leggauss(10)
_EPS32 = 2.0 ** -23        # the reference's runtime-derived float epsilon
_JMAX = 40                 # exact_sr.c:43
_PTOL = 1.0e-5             # getShockVars equal-pressure guard (exact_sr.c:343)


class _SRSide:
    """Per-side precomputed invariants of one initial state Wa."""

    def __init__(self, W, g):
        self.d, self.Vx, self.Vy, self.Vz, self.P = (W[i] for i in range(5))
        g1 = g - 1.0
        self.ha = 1.0 + g * self.P / (g1 * self.d)
        vsq = self.Vx ** 2 + self.Vy ** 2 + self.Vz ** 2
        self.Ga = 1.0 / jnp.sqrt(jnp.maximum(1.0 - vsq, 1.0e-30))
        self.vt = jnp.sqrt(self.Vy ** 2 + self.Vz ** 2)
        self.A = self.ha * self.Ga * self.vt          # hGv_t (RZP eq 3.23)
        self.atanhVx = 0.5 * jnp.log((1.0 + self.Vx) / (1.0 - self.Vx))


def _sr_adiabat(S, p, g):
    """Density on the isentrope through Wa at pressure p."""
    return S.d * (p / S.P) ** (1.0 / g)


def _sr_raref_integral(S, p, g):
    """integrateRaref (exact_sr.c:281-330): 10-point Gauss-Legendre of
    RZP eq 3.22's integrand over [Wa.P, p] (signed)."""
    g1 = g - 1.0
    mid = 0.5 * (p + S.P)
    half = 0.5 * (p - S.P)
    acc = 0.0
    for xi, wi in zip(_GL_X, _GL_W):
        xx = half * float(xi) + mid
        dd = _sr_adiabat(S, xx, g)
        ccs2 = g * g1 * xx / (g * xx + g1 * dd)
        hh = 1.0 + xx * g / (dd * g1)
        f = (jnp.sqrt(hh * hh + S.A ** 2 * (1.0 - ccs2))
             / (dd * jnp.sqrt(ccs2) * (hh * hh + S.A ** 2)))
        acc = acc + half * float(wi) * f
    return acc


def _sr_shock_vars(S, Pb, sign, g):
    """getShockVars (exact_sr.c:336-389): Taub-adiabat enthalpy behind the
    shock, mass flux J and shock velocity v_s.  The reference aborts on an
    unphysical enthalpy discriminant; here the sqrt is clamped (the value
    is discarded by the rarefaction select whenever p <= Pa)."""
    g1 = g - 1.0
    A = 1.0 + g1 * (S.P - Pb) / (g * Pb)
    B = 1.0 - A
    C = S.ha * (S.P - Pb) / S.d - S.ha ** 2
    disc = jnp.sqrt(jnp.maximum(B * B - 4.0 * A * C, 0.0))
    hb = (-B + disc) / (2.0 * A)
    db = g * Pb / (g1 * jnp.maximum(hb - 1.0, 1.0e-30))
    den = S.ha / S.d - hb / db
    J = sign * jnp.sqrt(jnp.maximum(
        (Pb - S.P) / jnp.where(den == 0.0, 1.0, den), 0.0))
    Aa = S.d ** 2 * S.Ga ** 2
    vs = ((Aa * S.Vx + sign * jnp.abs(J)
           * jnp.sqrt(jnp.maximum(J * J + Aa * (1.0 - S.Vx ** 2), 0.0)))
          / (Aa + J * J))
    eq = jnp.abs(S.P - Pb) <= _PTOL
    return (jnp.where(eq, 0.0, J), jnp.where(eq, S.Vx, vs),
            jnp.where(eq, S.d, db))


def _sr_vb_shock(S, Pb, sign, g):
    """getVb_Shock (exact_sr.c:632-652): normal velocity behind a shock."""
    J, vs, _ = _sr_shock_vars(S, Pb, sign, g)
    Gs = 1.0 / jnp.sqrt(jnp.maximum(1.0 - vs * vs, 1.0e-30))
    Jn = jnp.where(J == 0.0, 1.0, J)
    num = S.ha * S.Ga * S.Vx + Gs * (Pb - S.P) / Jn
    dnm = (S.ha * S.Ga + (Pb - S.P)
           * (Gs * S.Vx / Jn + 1.0 / (S.d * S.Ga)))
    return jnp.where(J == 0.0, S.Vx, num / dnm)


def _sr_vb_raref(S, p, sign, g):
    """getVb_Raref (exact_sr.c:655-668): Riemann invariant across the fan."""
    return jnp.tanh(S.atanhVx + sign * _sr_raref_integral(S, p, g))


def _sr_vb(S, p, sign, g):
    """Velocity behind the wave: shock iff p > Pa, rarefaction otherwise
    (exactly the per-pattern choice the reference makes — within each
    pattern's pressure bracket the comparison selects the same branch)."""
    return jnp.where(p > S.P, _sr_vb_shock(S, p, sign, g),
                     _sr_vb_raref(S, p, sign, g))


def _sr_xi(S, p, vx, sign, g):
    """getXi (exact_sr.c:671-700): self-similarity speed inside the fan
    (RZP eq 3.15)."""
    g1 = g - 1.0
    dc = _sr_adiabat(S, p, g)
    hc = 1.0 + g * p / (g1 * dc)
    vtc = S.A * jnp.sqrt(jnp.maximum(
        (1.0 - vx * vx) / (hc * hc + S.A ** 2), 0.0))
    cs2 = g * g1 * p / (g1 * dc + g * p)
    v2 = vx * vx + vtc * vtc
    num = vx * (1.0 - cs2) + sign * jnp.sqrt(cs2) * jnp.sqrt(jnp.maximum(
        (1.0 - v2) * (1.0 - v2 * cs2 - vx * vx * (1.0 - cs2)), 0.0))
    return num / (1.0 - v2 * cs2)


def _sr_velt_raref(S, p, vxb, g):
    """getVelT_Raref (exact_sr.c:703-750): |v_t| behind the fan from the
    invariant hGv_t, split proportionally to (Vy, Vz) — the reference's
    three sign cases are exactly this split."""
    g1 = g - 1.0
    db = _sr_adiabat(S, p, g)
    hb = 1.0 + g * p / (g1 * db)
    vbt = S.A * jnp.sqrt(jnp.maximum(
        (1.0 - vxb * vxb) / (hb * hb + S.A ** 2), 0.0))
    vt = jnp.maximum(S.vt, 1.0e-30)
    return vbt * S.Vy / vt, vbt * S.Vz / vt


def _sr_velt_shock(S, p, vxb, g):
    """getVelT_Shock (exact_sr.c:753-791): per-component form (NOT the
    proportional split; uses the adiabatic density behind the wave like
    the reference does)."""
    g1 = g - 1.0
    Ay = S.ha * S.Ga * S.Vy
    Az = S.ha * S.Ga * S.Vz
    db = _sr_adiabat(S, p, g)
    hb = 1.0 + g * p / (g1 * db)
    Cy = Ay * Ay / (hb * hb + Ay * Ay)
    Cz = Az * Az / (hb * hb + Az * Az)
    D = 1.0 - Cy * Cz
    vy = jnp.sqrt(jnp.maximum(Cy * (1.0 - vxb ** 2) * (1.0 - Cz) / D, 0.0))
    vz = jnp.sqrt(jnp.maximum(Cz * (1.0 - vxb ** 2) * (1.0 - Cy) / D, 0.0))
    return (jnp.where(S.Vy >= 0.0, vy, -vy),
            jnp.where(S.Vz >= 0.0, vz, -vz))


def _sr_set_flux(vx, vy, vz, P, d, g):
    """setFluxes (exact_sr.c:794-815)."""
    g1 = g - 1.0
    G2 = 1.0 / jnp.maximum(1.0 - vx * vx - vy * vy - vz * vz, 1.0e-30)
    G = jnp.sqrt(G2)
    h = 1.0 + g * P / (g1 * d)
    whg2 = d * h * G2
    return jnp.stack([d * G * vx,
                      whg2 * vx * vx + P,
                      whg2 * vy * vx,
                      whg2 * vz * vx,
                      whg2 * vx])


def _sr_fan_state(S, sign, pc, vxc, f_hd, f_tl, g):
    """rtbis_xi (exact_sr.c:909-948) + the in-fan state extraction
    (fluxes() :180-196): bisect xi(p) = 0 on [Wa.P, pc], then the state
    on the isentrope at that p."""
    xacc = _EPS32 * 0.5 * (S.P + pc)
    neg = f_hd < 0.0
    rtb0 = jnp.where(neg, S.P, pc)
    dx0 = jnp.where(neg, pc - S.P, S.P - pc)

    def body(i, c):
        rtb, dx, done = c
        dxn = 0.5 * dx
        xmid = rtb + dxn
        vx = _sr_vb_raref(S, xmid, sign, g)
        fmid = _sr_xi(S, xmid, vx, sign, g)
        rtbn = jnp.where(fmid <= 0.0, xmid, rtb)
        return (jnp.where(done, rtb, rtbn), jnp.where(done, dx, dxn),
                done | (jnp.abs(dxn) < xacc))

    p, _, _ = jax.lax.fori_loop(
        0, _JMAX, body, (rtb0, dx0, jnp.zeros_like(rtb0, bool)))
    vx = _sr_vb_raref(S, p, sign, g)
    d = _sr_adiabat(S, p, g)
    vy, vz = _sr_velt_raref(S, p, vx, g)
    return vx, vy, vz, p, d


def exact_sr(Ul, Ur, Wl, Wr, Bxi, sim: SimConfig, etah=None):
    """Exact SR-hydro Riemann solver (exact_sr.c:77-277 fluxes + getP),
    vectorized branch-free: the wave pattern (Two_S/RS/SR/Two_R) becomes
    pressure brackets per interface, the rtbis_vel/rtbis_xi bisections
    become fixed-length fori_loops with a per-element freeze at the
    reference's float-epsilon tolerance, and the early-return sampling
    tree becomes a precedence-ordered select over the six candidate
    states.  Deviations: the reference's equal-state shortcut branch
    reads an uninitialized vxc (exact_sr.c:115-125, indeterminate
    behavior) and is omitted — the full machinery resolves a pure
    contact correctly; the unphysical-enthalpy ath_error becomes a
    clamped sqrt (the clamped value is only produced where the
    rarefaction branch is selected anyway)."""
    g = sim.gamma
    SL = _SRSide(Wl, g)
    SR_ = _SRSide(Wr, g)
    Pl, Pr = SL.P, SR_.P

    def comp(a, b):
        return (a - b) / (1.0 - a * b)

    vRel0 = comp(SL.Vx, SR_.Vx)

    def vlim(p):
        vlc = comp(SL.Vx, _sr_vb(SL, p, -1.0, g))
        vrc = comp(SR_.Vx, _sr_vb(SR_, p, 1.0, g))
        return comp(vlc, vrc)

    # wave-pattern classification -> pressure brackets (getP :495-540)
    pminP = jnp.minimum(Pl, Pr)
    pmaxP = jnp.maximum(Pl, Pr)
    vRS = vlim(pminP)                 # getVlim_RS
    vSS = vlim(pmaxP)                 # getVlim_2S
    m2R = vRel0 <= vRS
    m2S = (~m2R) & (vRel0 > vSS)
    mRS = (~m2R) & (~m2S) & (Pl > Pr)     # rarefaction-left, shock-right
    pmin = jnp.where(m2R, 0.0, jnp.where(m2S, pmaxP, pminP))
    pmax = jnp.where(m2R, pminP,
                     jnp.where(m2S, 1000.0 * 0.5 * (Pl + Pr), pmaxP))

    # rtbis_vel (exact_sr.c:866-907): JMAX bisections of delta-vRel
    xacc = _EPS32 * 0.5 * (pmin + pmax)
    f0 = vlim(pmin) - vRel0
    neg = f0 < 0.0
    rtb0 = jnp.where(neg, pmin, pmax)
    dx0 = jnp.where(neg, pmax - pmin, pmin - pmax)

    def body(i, c):
        rtb, dx, done = c
        dxn = 0.5 * dx
        xmid = rtb + dxn
        fmid = vlim(xmid) - vRel0
        rtbn = jnp.where(fmid <= 0.0, xmid, rtb)
        return (jnp.where(done, rtb, rtbn), jnp.where(done, dx, dxn),
                done | (jnp.abs(dxn) < xacc))

    pc, _, _ = jax.lax.fori_loop(
        0, _JMAX, body, (rtb0, dx0, jnp.zeros_like(rtb0, bool)))

    # contact velocity: from the RIGHT wave only in the RS pattern
    # (fluxes() :131-151); density/shock speed per side by p vs Pa
    vxc = jnp.where(mRS, _sr_vb(SR_, pc, 1.0, g), _sr_vb(SL, pc, -1.0, g))
    _, vl_shock, dshl = _sr_shock_vars(SL, pc, -1.0, g)
    _, vr_shock, dshr = _sr_shock_vars(SR_, pc, 1.0, g)
    lsh = pc > Pl
    rsh = pc > Pr
    dcl = jnp.where(lsh, dshl, _sr_adiabat(SL, pc, g))
    dcr = jnp.where(rsh, dshr, _sr_adiabat(SR_, pc, g))

    # rarefaction head/tail speeds (fluxes() :168-178, 218-228)
    vl_hd = _sr_xi(SL, Pl, SL.Vx, -1.0, g)
    vl_tl = _sr_xi(SL, pc, vxc, -1.0, g)
    vr_hd = _sr_xi(SR_, Pr, SR_.Vx, 1.0, g)
    vr_tl = _sr_xi(SR_, pc, vxc, 1.0, g)

    # candidate states (vx, vy, vz, P, d)
    stL = (SL.Vx, SL.Vy, SL.Vz, Pl, SL.d)
    stR = (SR_.Vx, SR_.Vy, SR_.Vz, Pr, SR_.d)
    stFL = _sr_fan_state(SL, -1.0, pc, vxc, vl_hd, vl_tl, g)
    stFR = _sr_fan_state(SR_, 1.0, pc, vxc, vr_hd, vr_tl, g)
    vyls, vzls = _sr_velt_shock(SL, pc, vxc, g)
    vylr, vzlr = _sr_velt_raref(SL, pc, vxc, g)
    vyrs, vzrs = _sr_velt_shock(SR_, pc, vxc, g)
    vyrr, vzrr = _sr_velt_raref(SR_, pc, vxc, g)
    stCL = (vxc, jnp.where(lsh, vyls, vylr), jnp.where(lsh, vzls, vzlr),
            pc, dcl)
    stCR = (vxc, jnp.where(rsh, vyrs, vyrr), jnp.where(rsh, vzrs, vzrr),
            pc, dcr)

    # sampling tree at xi = 0 (fluxes() :155-277) as a precedence select
    outL = jnp.where(lsh, vl_shock >= 0.0, vl_hd >= 0.0)
    inFL = (~lsh) & (vl_hd < 0.0) & (vl_tl >= 0.0)
    outR = jnp.where(rsh, vr_shock <= 0.0, vr_hd <= 0.0)
    inFR = (~rsh) & (vr_hd > 0.0) & (vr_tl <= 0.0)
    ctr = vxc >= 0.0

    prim = [jnp.where(outL, a,
            jnp.where(inFL, b,
            jnp.where(outR, c,
            jnp.where(inFR, e,
            jnp.where(ctr, f, h)))))
            for a, b, c, e, f, h in zip(stL, stFL, stR, stFR, stCL, stCR)]

    # equal-state shortcut (exact_sr.c:115-125).  The reference branches
    # on an UNINITIALIZED vxc there; the defined replacement upwinds the
    # near-contact on the mean normal velocity (for truly identical
    # states both branches coincide, so only the indeterminate case
    # changes).
    eqst = (jnp.abs(Pl - Pr) <= _PTOL) & (jnp.abs(SL.Vx - SR_.Vx) <= _PTOL)
    up = 0.5 * (SL.Vx + SR_.Vx) >= 0.0
    stEQ = (SL.Vx,
            jnp.where(up, SL.Vy, SR_.Vy),
            jnp.where(up, SL.Vz, SR_.Vz),
            Pl,
            jnp.where(up, SL.d, SR_.d))
    prim = [jnp.where(eqst, e, p) for e, p in zip(stEQ, prim)]
    return _sr_set_flux(prim[0], prim[1], prim[2], prim[3], prim[4], g)
