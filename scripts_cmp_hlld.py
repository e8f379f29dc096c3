import os
os.environ['JAX_PLATFORMS']='cpu'
import jax; jax.config.update('jax_enable_x64', True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
from atmospheric_athena_tpu import Simulation
from atmospheric_athena_tpu.eos import cons1d_to_prim1d
from atmospheric_athena_tpu.integrators.sweep import to_sweep

s = Simulation.from_file('/root/repo/.refbuild/run/bwhlld/deck', gas='mhd', flux='hlld')
print('sim:', s.sim.gas, s.sim.flux, flush=True)
s.run()
print('steps:', int(s.state.nstep), 'time:', float(s.state.time), flush=True)
ref = np.loadtxt('/root/repo/.refbuild/run/bwhlld/Brio-Wu.0040.tab')
U1d, Bxc = to_sweep(s.state.U, s.state.Bcc, 0, s.sim)
W = np.asarray(cons1d_to_prim1d(U1d, Bxc, s.sim))[:, 0, 0, :]
sl = s.grid.interior()[2]
mine = W[:, sl]
Bx = np.asarray(s.state.Bcc[0])[0,0,sl]
for name, k, col in [('d',0,2),('V1',1,3),('V2',2,4),('P',4,6),('By',5,8),('Bz',6,9)]:
    diff = np.abs(mine[k] - ref[:,col]).max()
    print(f'{name}: max abs diff {diff:.3e}', flush=True)
print('Bx diff:', np.abs(Bx - ref[:,7]).max(), flush=True)
print('DONE', flush=True)
