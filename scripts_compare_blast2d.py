import os, sys
os.environ['JAX_PLATFORMS']='cpu'
import jax; jax.config.update('jax_enable_x64', True)
if '--cache' in sys.argv:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import time, numpy as np
from atmospheric_athena_tpu import Simulation

t0=time.perf_counter()
s = Simulation.from_file('/root/repo/.refbuild/run/blast2d/athinput.blast2d')
print('setup', time.perf_counter()-t0, flush=True)
for i in range(3):
    t0=time.perf_counter(); s.step(); jax.block_until_ready(s.state.U)
    print(f'step {i}:', time.perf_counter()-t0, flush=True)
res = s.run()
print('steps:', int(s.state.nstep), 'time:', float(s.state.time), flush=True)
ref = np.loadtxt('/root/repo/.refbuild/run/blast2d/Blast.0001.tab')
U = np.asarray(s.state.U)[(slice(None),)+s.grid.interior()][:,0]
Nx, Ny = 64, 96
for name,k,c in [('d',0,4),('M1',1,5),('M2',2,6),('E',4,8)]:
    r = ref[:,c].reshape(Ny,Nx)
    diff = np.abs(U[k]-r).max()
    print(f'{name}: max abs diff {diff:.3e} (scale {np.abs(r).max():.3})', flush=True)
print('DONE', flush=True)
