import time
import jax, jax.numpy as jnp
from atmospheric_athena_tpu import ParameterDB, Simulation
from atmospheric_athena_tpu.ionrad.driver import ion_radtransfer
from atmospheric_athena_tpu.ionrad.config import ion_config_from_par
from __graft_entry__ import _ISPH_DECK
import dataclasses

N = 256
par = ParameterDB.from_string(_ISPH_DECK.format(n=N))
s = Simulation.from_par(par, problem="ioniz_sphere", dtype="float32")
st = s.state
sim, grid = s.sim, s.grid

def mk_ion(maxiter):
    return ion_config_from_par(par, grid,
                               radplanes=s.problem.radplanes,
                               time_ramp=True,
                               )._replace(maxiter=maxiter) if hasattr(
        ion_config_from_par(par, grid, radplanes=s.problem.radplanes,
                            time_ramp=True), "_replace") else None

from atmospheric_athena_tpu.ionrad.config import IonConfig
base = ion_config_from_par(par, grid, radplanes=s.problem.radplanes,
                           time_ramp=True)
print("ion config type:", type(base).__name__, flush=True)

def timeit(name, f, *args, reps=3):
    o = f(*args); float(jnp.sum(jax.tree.leaves(o)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*args)
    float(jnp.sum(jax.tree.leaves(o)[0]))
    print(f'{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms', flush=True)

for mi in (1, 2, 10, 50):
    try:
        ion = dataclasses.replace(base, maxiter=mi)
    except TypeError:
        ion = base._replace(maxiter=mi)
    f = jax.jit(lambda st, ion=ion: ion_radtransfer(st, sim, grid, ion,
                                                    st.time, 0.4)[0])
    timeit(f"radiation maxiter={mi:3d}", f, st)

# actual niter on this state with high cap: instrument via dt trace —
# run once with maxiter=10000 and time it
ion = None
try:
    ion = dataclasses.replace(base, maxiter=10000)
except TypeError:
    ion = base._replace(maxiter=10000)
f = jax.jit(lambda st: ion_radtransfer(st, sim, grid, ion, st.time, 0.4)[0])
timeit("radiation maxiter=10000", f, st, reps=1)
print("DONE", flush=True)
