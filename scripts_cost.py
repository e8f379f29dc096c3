import jax, jax.numpy as jnp
from atmospheric_athena_tpu import ParameterDB, Simulation
from __graft_entry__ import _ISPH_DECK
from atmospheric_athena_tpu.integrators import ctu3d

N = 256
par = ParameterDB.from_string(_ISPH_DECK.format(n=N))
par.set("ionradiation", "maxiter", 50)
s = Simulation.from_par(par, problem="ioniz_sphere", dtype="float32")
st = s.state

f = jax.jit(lambda st: ctu3d.step(st, st.dt, s.sim, s.grid, s.problem))
lowered = f.lower(st)
compiled = lowered.compile()
ca = compiled.cost_analysis()
flops = ca.get('flops', 0); ba = ca.get('bytes accessed', 0)
print("hydro: GFLOP=%.1f  GB=%.2f  B/cell=%.0f  flop/cell=%.0f" % (
    flops/1e9, ba/1e9, ba/N**3, flops/N**3))
for k,v in sorted(ca.items()):
    if isinstance(v,(int,float)) and v>1e9: print("  %s: %.3g"%(k,v))
m = compiled.memory_analysis()
print("temp bytes: %.2f GB" % (m.temp_size_in_bytes/1e9,))
