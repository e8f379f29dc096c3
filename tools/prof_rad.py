"""Radiation sub-cycle kernel profiler (256^3 f32 production config)."""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from atmospheric_athena_tpu import ParameterDB, Simulation
from atmospheric_athena_tpu.defs import ID, IEN, IM1
from atmospheric_athena_tpu.ionrad import pallas_rad
from atmospheric_athena_tpu.ionrad.driver import (_apply_floors, _d_nlim,
                                                  _temp, ion_radtransfer)
from atmospheric_athena_tpu.ionrad.plane import inlet_ramp
from __graft_entry__ import _ISPH_DECK

N = int(os.environ.get("PROF_N", "256"))
par = ParameterDB.from_string(_ISPH_DECK.format(n=N))
par.set("ionradiation", "maxiter", 50)
s = Simulation.from_par(par, problem="ioniz_sphere", dtype="float32")
s.step(); s.step()
st = s.state
sim, grid = s.sim, s.grid


def timeit(name, f, *args, reps=10):
    o = f(*args)
    float(jnp.sum(jax.tree.leaves(o)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*args)
    float(jnp.sum(jax.tree.leaves(o)[0]))
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f'{name:28s}: {ms:8.2f} ms', flush=True)
    return o


sl = grid.interior()
Ui = st.U[(slice(None),) + sl]
d, M1, M2, M3, E = Ui[ID], Ui[IM1], Ui[IM1+1], Ui[IM1+2], Ui[IEN]
s0 = Ui[5]
ke_be = 0.5 * (M1**2 + M2**2 + M3**2) / d
E0, s00 = _apply_floors(E, s0, d, ke_be, sim, s.ion)
_, e_th_init, x_init = _temp(E0, s00, d, ke_be, sim, s.ion)
d_nlim = _d_nlim(d, s.ion)
Fin0 = inlet_ramp(s.ion.radplanes[0][1], st.time, s.ion)
code = jnp.ones(d.shape, jnp.int32)
CONST = (d, ke_be, M1, M2, M3, E0, e_th_init, x_init, d_nlim)


@jax.jit
def rates_jit(s0, E, code, const):
    rf, _, _f = pallas_rad.build(sim, grid, s.ion, *const)
    return rf(s0, E, code, Fin0)


r = timeit('rad rates_fn', rates_jit, s00, E0, code, CONST)
_, _, kph, nHdot, edot, dtc, dtt = r
dtm = jnp.minimum(dtc, dtt)


@jax.jit
def upd_jit(s0, E, kph, nHdot, edot, dtm, const):
    _, uf, _f = pallas_rad.build(sim, grid, s.ion, *const)
    return uf(s0, E, kph, nHdot, edot, dtm)


timeit('rad update_fn', upd_jit, s00, E0, kph, nHdot, edot, dtm, CONST)

rad = jax.jit(lambda st: ion_radtransfer(
    st, sim, grid, s.ion, st.time, s.cour_no, return_niter=True))
out = timeit('radiation full', rad, st, reps=3)
niter = int(out[2])
print('   niter =', niter, flush=True)
print('DONE', flush=True)
