import time
import jax, jax.numpy as jnp
from atmospheric_athena_tpu import ParameterDB, Simulation
from atmospheric_athena_tpu.integrators import ctu3d
from atmospheric_athena_tpu.ops import reconstruct, riemann
from atmospheric_athena_tpu.eos import cons1d_to_prim1d, prim1d_to_cons1d
from atmospheric_athena_tpu.integrators.sweep import vperm_to_sweep, vperm_from_sweep
from __graft_entry__ import _ISPH_DECK

N = 256
par = ParameterDB.from_string(_ISPH_DECK.format(n=N))
par.set("ionradiation", "maxiter", 50)
s = Simulation.from_par(par, problem="ioniz_sphere", dtype="float32")
st = s.state
sim, grid = s.sim, s.grid

def timeit(name, f, *args, reps=5):
    o = f(*args); jax.block_until_ready(o); float(jnp.sum(jax.tree.leaves(o)[0]))
    t0=time.perf_counter()
    for _ in range(reps): o = f(*args)
    jax.block_until_ready(o); float(jnp.sum(jax.tree.leaves(o)[0]))
    print(f'{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms', flush=True)

# donated full hydro step
f_d = jax.jit(lambda st: ctu3d.step(st, st.dt, sim, grid, s.problem), donate_argnums=0)
f_n = jax.jit(lambda st: ctu3d.step(st, st.dt, sim, grid, s.problem))
timeit('hydro (no donate)', f_n, st)
timeit('hydro (donated)  ', f_d, jax.tree.map(lambda x: x.copy() if hasattr(x,'copy') else x, st))

# steps 1-3 one axis: reconstruct + riemann
U = st.U
dtodx = float(st.dt)/grid.dx[0]
def sweep1(U):
    U1d = vperm_to_sweep(U, 0, sim)
    W = cons1d_to_prim1d(U1d, None, sim)
    Wm, Wp_ = reconstruct.lr_states(W, None, dtodx, sim, axis=2)
    Wl = jnp.roll(Wp_, 1, axis=3)
    Ul = prim1d_to_cons1d(Wl, None, sim)
    Ur = prim1d_to_cons1d(Wm, None, sim)
    F = riemann.fluxes(Ul, Ur, Wl, Wm, None, sim)
    return Ul, Ur, F
timeit('sweep axis0 (rec+roe)', jax.jit(sweep1), U)

def rec_only(U):
    U1d = vperm_to_sweep(U, 0, sim)
    W = cons1d_to_prim1d(U1d, None, sim)
    return reconstruct.lr_states(W, None, dtodx, sim, axis=2)
timeit('reconstruct axis0    ', jax.jit(rec_only), U)

Wm, Wp_ = jax.jit(rec_only)(U)
Wl = jnp.roll(Wp_, 1, axis=3)
Ul = prim1d_to_cons1d(Wl, None, sim); Ur = prim1d_to_cons1d(Wm, None, sim)
timeit('riemann roe axis0    ', jax.jit(lambda a,b,c,d: riemann.fluxes(a,b,c,d,None,sim)), Ul, Ur, Wl, Wm)
