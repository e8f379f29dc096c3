"""Self-gravity: periodic FFT Poisson solver + source terms
(reference: src/gravity/selfg_fft.c, selfg.c).

The reference solves ∇²Φ = 4πG(ρ−ρ̄) with Plimpton's MPI block FFT
(fftsrc/); TPU-native this is jnp.fft.fftn — under pjit XLA shards the
transposes over the mesh (SURVEY.md §2.4 row 7).  The Green's function is
the DISCRETE Laplacian's, G(k) = 1/Σ_a (2cos(k_a·Δ_a... index form)−2)/Δa²
(selfg_fft.c:~154-200), so ∇²_discrete Φ = 4πG δρ holds to roundoff — the
property the verification test checks.

The momentum source terms use the divergence of the gravitational stress
tensor (selfg.c:selfg_fc docstring): exact momentum conservation; the
energy sources are mass-flux-weighted like the static-potential ones.
The selfg_fc 2nd-order flux correction (old/new Phi averaging) is pending
(needs Phi_old + saved mass fluxes in the state) — sources here are the
in-integrator ones (integrate_3d_ctu.c SELF_GRAVITY blocks).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..config import GridConfig, SimConfig
from ..defs import ID


def solve_phi_periodic(d_active, grid: GridConfig, four_pi_G: float,
                       grav_mean_rho: float):
    """Φ on active cells from ρ (periodic BCs), discrete-Laplacian Green's
    function exactly as selfg_fft_3d (selfg_fft.c)."""
    rho = four_pi_G * (d_active - grav_mean_rho)
    axes = [a for a in range(3) if grid.Nx[a] > 1]
    fft_dims = [2 - a for a in axes]
    W = jnp.fft.fftn(rho, axes=fft_dims)

    denom = jnp.zeros(d_active.shape, rho.dtype)
    for a in axes:
        n = grid.Nx[a]
        k = np.arange(n)
        term = (2.0 * np.cos(2.0 * math.pi * k / n) - 2.0) / grid.dx[a] ** 2
        shape = [1, 1, 1]
        shape[2 - a] = n
        denom = denom + jnp.asarray(term.reshape(shape), rho.dtype)
    # zero mode: potential defined up to a constant; set to zero (:163-166)
    safe = jnp.where(denom == 0.0, 1.0, denom)
    What = jnp.where(denom == 0.0, 0.0, W / safe)
    phi = jnp.fft.ifftn(What, axes=fft_dims).real
    return phi


def phi_padded(state, sim: SimConfig, grid: GridConfig, four_pi_G: float,
               grav_mean_rho: float):
    """Solve Φ and place it in a padded array with periodic ghost fill."""
    sl = grid.interior()
    phi_a = solve_phi_periodic(state.U[(ID,) + sl], grid, four_pi_G,
                               grav_mean_rho)
    ng = grid.nghost
    phi = jnp.zeros(grid.padded_shape(), phi_a.dtype)
    phi = phi.at[sl].set(phi_a)
    # periodic ghosts (bvals_grav.c analogue) along active axes
    for a in range(3):
        if not grid.active(a):
            continue
        dim = 2 - a
        n = phi.shape[dim]

        def take(s):
            idx = [slice(None)] * 3
            idx[dim] = s
            return phi[tuple(idx)]

        lo = take(slice(n - 2 * ng, n - ng))
        hi = take(slice(ng, 2 * ng))
        idxl = [slice(None)] * 3
        idxl[dim] = slice(0, ng)
        idxh = [slice(None)] * 3
        idxh[dim] = slice(n - ng, None)
        phi = phi.at[tuple(idxl)].set(lo).at[tuple(idxh)].set(hi)
    return phi
