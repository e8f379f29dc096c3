import os, time
import jax, jax.numpy as jnp
from atmospheric_athena_tpu import ParameterDB, Simulation
from __graft_entry__ import _ISPH_DECK
from atmospheric_athena_tpu.integrators import ctu3d
from atmospheric_athena_tpu import bvals, dt as dt_mod
from atmospheric_athena_tpu.ionrad.driver import ion_radtransfer

N = 256
par = ParameterDB.from_string(_ISPH_DECK.format(n=N))
par.set("ionradiation", "maxiter", 50)
s = Simulation.from_par(par, problem="ioniz_sphere", dtype="float32")
t0=time.perf_counter(); s.step(); print("compile+step1 %.1fs"%(time.perf_counter()-t0), flush=True)
s.step()
state = s.state

def timeit(name, fn, arg, reps=5):
    out = fn(arg); float(jnp.sum(out.U[0,8]))
    t0=time.perf_counter()
    for _ in range(reps): out = fn(arg)
    float(jnp.sum(out.U[0,8]))
    dtm=(time.perf_counter()-t0)/reps
    print(f'{name}: {dtm*1e3:.2f} ms', flush=True)

timeit('full step  ', s._jit_step, state)
timeit('hydro ctu3d', jax.jit(lambda st: ctu3d.step(st, st.dt, s.sim, s.grid, s.problem)), state)
timeit('radiation  ', jax.jit(lambda st: ion_radtransfer(st, s.sim, s.grid, s.ion, st.time, 0.4)[0]), state)
timeit('bvals      ', jax.jit(lambda st: bvals.apply_bc(st, s.grid, s.sim, s.problem)), state)
timeit('new_dt     ', jax.jit(lambda st: st.replace(dt=dt_mod.new_dt(st, s.sim, s.grid, 0.4))), state)
timeit('userwork   ', jax.jit(lambda st: s.problem.userwork_in_loop(st, s.sim, s.grid)), state)
print("DONE", flush=True)
