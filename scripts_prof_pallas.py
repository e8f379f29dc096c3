import time
import jax, jax.numpy as jnp
from atmospheric_athena_tpu import ParameterDB, Simulation
from atmospheric_athena_tpu.integrators import ctu3d
from __graft_entry__ import _ISPH_DECK

N = 256
par = ParameterDB.from_string(_ISPH_DECK.format(n=N))
par.set("ionradiation", "maxiter", 50)
s = Simulation.from_par(par, problem="ioniz_sphere", dtype="float32")
st = s.state
sim, grid = s.sim, s.grid
print("pallas_enabled:", sim.pallas_enabled, flush=True)

def timeit(name, f, *args, reps=5):
    o = f(*args); float(jnp.sum(jax.tree.leaves(o)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*args)
    float(jnp.sum(jax.tree.leaves(o)[0]))
    print(f'{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms', flush=True)

f_pl = jax.jit(lambda st: ctu3d.step(st, st.dt, sim, grid, s.problem))
t0 = time.perf_counter()
o = f_pl(st); float(jnp.sum(o.U[0, 8]))
print("compile %.1fs" % (time.perf_counter() - t0), flush=True)
timeit('hydro pallas', f_pl, st)

import dataclasses
sim_off = dataclasses.replace(sim, use_pallas="off")
f_jnp = jax.jit(lambda st: ctu3d.step(st, st.dt, sim_off, grid, s.problem))
timeit('hydro jnp   ', f_jnp, st)

# value check on TPU
a = f_pl(st); b = f_jnp(st)
diff = float(jnp.max(jnp.abs(a.U - b.U)[(slice(None),) + grid.interior()]))
rel = diff / float(jnp.max(jnp.abs(b.U)))
print("max abs diff interior:", diff, "rel:", rel, flush=True)
print("DONE", flush=True)
