"""Microphysics: explicit diffusion operators (reference: src/microphysics/).

Operator-split like the reference (integrate_diff called before the hydro
step each cycle, main.c:530-539), with the explicit-diffusion CFL limit
diff_dt (diff_dt.c:27-66).  Round-1 coverage: isotropic Navier-Stokes
viscosity (viscosity.c ViscStress_iso), isotropic thermal conduction
(conduction.c HeatFlux_iso), optically-thin cooling hook (cool.c pattern).
Braginskii/anisotropic variants and Ohmic/Hall/ambipolar resistivity are
round-2 items.
"""

from .diffusion import diff_dt, integrate_diff  # noqa: F401
