"""Chemistry & cooling rate coefficients and species helpers
(reference: src/ionradiation/ionrad_chemistry.c and shared species algebra
repeated throughout ionrad_3d.c).

Neutral hydrogen is carried as the passive-scalar mass density U.s[0]
(ionrad_3d.c:82-85): n_H = s0/m_H (neutrals), n_H+ = (d - s0)/m_H,
n_e = n_H+ + d·alpha_C/(14·m_H)  (carbon contributes electrons),
x = n_e/(n_H + n_H+).
"""

from __future__ import annotations

import jax.numpy as jnp

from .config import IonConfig


def recomb_rate_coef(T):
    """Case-B recombination, alpha_B(T) = 2.59e-13 (T/1e4)^-0.7
    (ionrad_chemistry.c:111-126)."""
    return 2.59e-13 * (T / 1.0e4) ** (-0.7)


def coll_ion_rate_coef(T, k_B):
    """Collisional ionization (Tenorio-Tagle 1986); present in the reference
    but removed from the rate equation (ionrad_3d.c:338-339)."""
    IHI = 2.18e-11
    return 5.84e-11 * jnp.sqrt(T) * jnp.exp(-IHI / (k_B * T))


def recomb_cool_rate_coef(T, k_B):
    """Recombination cooling (Osterbrock 1989 tab. 3.2 fit):
    6.11e-10 T^-0.89 · kB·T, zero below 100 K (ionrad_chemistry.c:137-149)."""
    return jnp.where(T < 100.0, 0.0, 6.11e-10 * T ** (-0.89) * k_B * T)


def lya_cool_rate(n_H, n_e, T):
    """Lyman-alpha cooling (Black 1981): −7.5e-19·n_e·n_H·exp(−118348/T)
    (ionrad_chemistry.c:350-353; called with n_e as second arg,
    ionrad_3d.c:484)."""
    return -7.5e-19 * n_e * n_H * jnp.exp(-118348.0 / T)


def species(d, s0, ion: IonConfig):
    """(n_H, n_Hplus, n_e, x) from density and neutral density.

    The 1/m_H constants are host-side reciprocals (one VPU multiply
    instead of a divide per field; equal to the divide to roundoff)."""
    inv_mH = 1.0 / ion.m_H
    n_H = s0 * inv_mH
    n_Hplus = (d - s0) * inv_mH
    n_e = n_Hplus + d * (ion.alpha_C / (14.0 * ion.m_H))
    x = n_e / (n_H + n_Hplus)
    return n_H, n_Hplus, n_e, x


def mean_mass(x, ion: IonConfig):
    """Mean particle mass factor (x·m_H/2 + (1−x)·mu) used in every
    temperature evaluation (e.g. ionrad_3d.c:101)."""
    return x * 0.5 * ion.m_H + (1.0 - x) * ion.mu


def temperature(e_sp, x, gamma_1, ion: IonConfig):
    """T = Gamma_1 · e_sp · (x·m_H/2 + (1−x)·mu)/k_B (ionrad_3d.c:101)."""
    return gamma_1 * e_sp * mean_mass(x, ion) / ion.k_B


# ---------------------------------------------------------------------------
# Named cooling/heating functions (ionrad_chemistry.c:153-248, cool.c) —
# vectorized, branch-free.  The Dalgarno-McCray fit coefficients are the
# published physical data of DM72 as tabulated in the reference.
# ---------------------------------------------------------------------------

GAMMAKI = 2.0e-26      # Koyama & Inutsuka (2002) heating rate, erg/s
_DMC_SCALE = 1.0e-23   # SCALEFACTOR (ionrad_chemistry.c:152)

_DMC_XMAT = jnp.asarray(
    [-0.133, 0.105, 0.452, 0.715, 0.901,
     1.030, 1.082, 1.174, 1.257, 1.362,
     1.448, 1.523, 1.569, 1.582, 1.539,
     1.430, 1.275, 1.168, 1.092, 1.019,
     1.000, 1.004, 1.008, 0.987, 0.905,
     0.738, 0.603, 0.555, 0.552, 0.554,
     0.552, 0.535, 0.425, 0.275, 0.251,
     0.232, 0.247, 0.283, 0.322, 0.363,
     0.397])


def ki_cool_rate(T):
    """Koyama & Inutsuka (2002) cooling (ionrad_chemistry.c:240-243)."""
    return GAMMAKI * (1.0e7 * jnp.exp(-118400.0 / (T + 1000.0)) +
                      0.014 * jnp.sqrt(T) * jnp.exp(-92.0 / T))


def ki_heat_rate():
    """KI heating rate (ionrad_chemistry.c:245-247)."""
    return GAMMAKI


def dmc_cool_rate(x, T):
    """Dalgarno & McCray (1972) equilibrium cooling
    (ionrad_chemistry.c:153-234), with the reference's electron-impact,
    hydrogen, and neutral terms plus the 4-point Lagrange interpolation of
    the DM72 log-cooling table for 1e4 < T < 1.28e8 K."""
    x = jnp.maximum(x, 1.0e-3)
    Ts = jnp.maximum(T, 1.0)

    # electron impact excitation (eqn 3-10)
    le = jnp.where(Ts > 10.0, 2.96e-23 / jnp.sqrt(Ts)
                   * jnp.exp(-92.0 / Ts), 0.0)
    le = le + jnp.where(
        Ts > 50.0,
        6.08e-23 / jnp.sqrt(Ts) * jnp.exp(-413.0 / Ts)
        + 3.52e-23 / jnp.sqrt(Ts) * (jnp.exp(-554.0 / Ts)
                                     + 1.3 * jnp.exp(-961.0 / Ts)), 0.0)
    le = le + jnp.where(
        Ts > 2.0e4,
        4.14e-26 * jnp.sqrt(Ts) * jnp.exp(-22700.0 / Ts)
        + 7.13e-26 * jnp.sqrt(Ts) * (1.0 - 2.7e-9 * Ts * Ts)
        * jnp.exp(-27700.0 / Ts), 0.0)

    lh = jnp.where(Ts > 50.0,
                   2.37e-27 * jnp.exp(-413.0 / Ts)
                   + 3.52e-27 * (jnp.exp(-554.0 / Ts)
                                 + 1.4 * jnp.exp(-961.0 / Ts)), 0.0)

    u = jnp.minimum(Ts / 157890.0, 3.16)
    u2 = u * u
    om = (.6098 + 1.489 * u + .50755 * u2 - .38145 * u * u2
          + .10196 * u2 * u2 - .01007 * u * u2 * u2)
    p1 = jnp.where(Ts > 1.0e4,
                   0.5 * 1.41e-16 * om * jnp.exp(-118000.0 / Ts)
                   / jnp.sqrt(Ts), 0.0)

    lo = x * le + lh + (1.0 - x) * p1                        # T < 100
    mid = (_DMC_SCALE * x * 2.8347e-10
           * jnp.maximum(Ts - 1.0e2, 0.0) ** 2.3562
           + x * le + lh + (1.0 - x) * p1)                   # 100..1e4
    hi = x * 2.3988e-04 * jnp.sqrt(Ts)                       # > 1.28e8

    # 4-point Lagrange interpolation of the DM table, 1e4 < T < 1.28e8
    tlost = jnp.log10(Ts)
    ipps = jnp.clip(jnp.floor(10.0 * tlost).astype(jnp.int32) - 38,
                    a_max=41)
    jaug = jnp.maximum(2, ipps)
    qq2 = 3.8 + 0.1 * jaug.astype(Ts.dtype)
    qt2 = tlost - qq2
    qt3 = qt2 - 0.1
    edge = (jaug == 2) | (jaug == 41)
    tcool_edge = (_DMC_XMAT[jaug - 1] * qt2
                  - _DMC_XMAT[jaug - 2] * qt3) * 10.0
    qt1 = qt2 + 0.1
    qt4 = qt3 - 0.1
    xu1 = qt2 * qt3 * qt4 / 6.0e-03
    xu2 = qt1 * qt3 * qt4 / 2.0e-03
    xu3 = qt1 * qt2 * qt4 / 2.0e-03
    xu4 = qt1 * qt2 * qt3 / 6.0e-03
    jm3 = jnp.maximum(jaug - 3, 0)
    tcool4 = (-_DMC_XMAT[jm3] * xu1 + _DMC_XMAT[jaug - 2] * xu2
              - _DMC_XMAT[jaug - 1] * xu3 + _DMC_XMAT[jaug] * xu4)
    tcool = jnp.where(edge, tcool_edge, tcool4)
    tab = _DMC_SCALE * 10.0 ** tcool * x + (1.0 - x) * p1

    return jnp.where(T < 100.0, lo,
                     jnp.where(T < 1.0e4, mid,
                               jnp.where(T > 1.27717e8, hi, tab)))


def koyinut(dens, press, dt, gamma_1):
    """KI net cooling with the equilibrium-temperature limiter
    (src/microphysics/cool.c:17-44); returns the cooling rate n*L."""
    mbar = 1.37 * 1.6733e-24
    kb = 1.380658e-16
    Tmin = 10.0
    n = dens / mbar
    logn = jnp.log10(n)
    T = jnp.maximum(press / (n * kb), Tmin)
    coolratepp = GAMMAKI * (
        n * (1.0e7 * jnp.exp(-1.184e5 / (T + 1000.0))
             + 0.014 * jnp.sqrt(T) * jnp.exp(-92.0 / T)) - 1.0)
    dT = coolratepp * dt * gamma_1 / kb
    lognT = (3.9247499 - 1.8479378 * logn + 1.5335032 * logn ** 2
             - 0.47665872 * logn ** 3 + 0.076789136 * logn ** 4
             - 0.0049052587 * logn ** 5)
    Teq = jnp.where((T - dT) <= 185.0, 10.0 ** lognT / n, Tmin)
    MaxdT = kb * (T - Teq) / (dt * gamma_1)
    return n * jnp.minimum(coolratepp, MaxdT)
