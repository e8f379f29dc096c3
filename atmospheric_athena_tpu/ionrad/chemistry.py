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
    """(n_H, n_Hplus, n_e, x) from density and neutral density."""
    n_H = s0 / ion.m_H
    n_Hplus = (d - s0) / ion.m_H
    n_e = n_Hplus + d * ion.alpha_C / (14.0 * ion.m_H)
    x = n_e / (n_H + n_Hplus)
    return n_H, n_Hplus, n_e, x


def mean_mass(x, ion: IonConfig):
    """Mean particle mass factor (x·m_H/2 + (1−x)·mu) used in every
    temperature evaluation (e.g. ionrad_3d.c:101)."""
    return x * 0.5 * ion.m_H + (1.0 - x) * ion.mu


def temperature(e_sp, x, gamma_1, ion: IonConfig):
    """T = Gamma_1 · e_sp · (x·m_H/2 + (1−x)·mu)/k_B (ionrad_3d.c:101)."""
    return gamma_1 * e_sp * mean_mass(x, ion) / ion.k_B
