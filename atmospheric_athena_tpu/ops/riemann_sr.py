"""Special-relativistic Riemann solvers (hydro): HLLE and HLLC.

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
