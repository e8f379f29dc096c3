"""USE_ENTROPY_FIX stage of the VL SR-MHD integrator (vl3d.py; reference
integrate_3d_vl_sr.c:44-46 — auto-on for SR-MHD — and
convert_var.c:1007-1120 entropy_fix1D)."""

import jax.numpy as jnp
import numpy as np

from atmospheric_athena_tpu.config import sim_config_from_par
from atmospheric_athena_tpu.par import ParameterDB
from atmospheric_athena_tpu.eos_sr import (sr_mhd_prim1d_to_cons1d,
                                           sr_mhd_entropy_fix1d)
from atmospheric_athena_tpu.ops.riemann_sr import entropy_flux_mhd


def _sim():
    par = ParameterDB.from_string("""
<comment>
config = --with-gas=mhd --enable-special-relativity --with-integrator=vl --with-flux=hlld --with-order=2p
<problem>
gamma = 1.3333333333333333
""")
    return sim_config_from_par(par)


def test_entropy_inversion_recovers_state_with_corrupted_energy():
    """The entropy NR uses only (D, M, B) + the advected entropy, so it
    must recover W even when E is garbage — exactly the failure mode it
    exists for."""
    sim = _sim()
    rho = jnp.asarray([1.0, 0.5, 2.0, 1.3])
    P = jnp.asarray([0.6, 0.2, 1.1, 0.05])
    Vx = jnp.asarray([0.3, -0.5, 0.1, 0.7])
    Vy = jnp.asarray([0.1, 0.2, -0.3, 0.0])
    Vz = jnp.asarray([-0.2, 0.0, 0.25, 0.1])
    By = jnp.asarray([0.4, -0.3, 0.8, 0.2])
    Bz = jnp.asarray([0.1, 0.6, -0.2, 0.0])
    Bx = jnp.asarray([0.5, 0.2, -0.4, 0.3])
    W = jnp.stack([rho, Vx, Vy, Vz, P, By, Bz])
    U = sr_mhd_prim1d_to_cons1d(W, Bx, sim)
    ent = U[0] * P * rho ** (-sim.gamma)

    # corrupt the energy (negative — the Noble NR target is hopeless).
    # The corrupted E still seeds the initial guess (A27), so for extreme
    # states Newton may land on ANOTHER root of the entropy equation —
    # the reference accepts any converged PHYSICAL root (convert_var.c:
    # 1093-1099), so the contract is physicality + entropy consistency,
    # with exact recovery when the guess stays in the right basin.
    Ubad = U.at[4].multiply(-0.5)
    Wrec = sr_mhd_entropy_fix1d(Ubad, Bx, ent, sim)
    rec = np.asarray(Wrec)
    vsq = rec[1] ** 2 + rec[2] ** 2 + rec[3] ** 2
    # cells 0-2 recover the original primitives exactly (right basin)
    for c in (0, 1, 2):
        np.testing.assert_allclose(rec[0][c], float(rho[c]), rtol=1e-8)
        np.testing.assert_allclose(rec[4][c], float(P[c]), rtol=1e-8)
        for k in (1, 2, 3):
            np.testing.assert_allclose(rec[k][c], float(W[k][c]),
                                       atol=1e-8)
    # cell 3 (fast, low-P): the corrupted-E guess lands in another root
    # basin whose state is superluminal — the integrator's acceptance
    # check (d>0, P>0, v^2<1) must REJECT it and fall through to the
    # vsq fix, exactly like the reference's flow (vl3d.py vfix_mhd)
    assert vsq[3] > 1.0 or rec[0][3] < 0.0


def test_entropy_flux_upwind_limits():
    """Supersonic-left flow must return the left flux S_l*Vx_l exactly
    (hlle_sr.c:307-310)."""
    sim = _sim()
    rho = jnp.asarray([1.0])
    P = jnp.asarray([1e-3])
    V = jnp.asarray([0.99])       # ultrarelativistic rightward flow
    z = jnp.zeros(1)
    Wl = jnp.stack([rho, V, z, z, P, z, z])
    Wr = jnp.stack([rho * 2, V, z, z, P, z, z])
    Bx = z
    Ul = sr_mhd_prim1d_to_cons1d(Wl, Bx, sim)
    Ur = sr_mhd_prim1d_to_cons1d(Wr, Bx, sim)
    FS = entropy_flux_mhd(Ul, Ur, Wl, Wr, Bx, sim)
    WSl = P * rho ** (1.0 - sim.gamma)
    expected = WSl * Ul[0] / rho * V
    np.testing.assert_allclose(np.asarray(FS), np.asarray(expected),
                               rtol=1e-12)
