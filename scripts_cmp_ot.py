import os
os.environ['JAX_PLATFORMS']='cpu'
import jax; jax.config.update('jax_enable_x64', True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
from atmospheric_athena_tpu import Simulation

s = Simulation.from_file('/root/repo/.refbuild/run/ot/deck', problem='orszag-tang')
for i in range(10):
    s.step()
print('t:', float(s.state.time), flush=True)
ref = np.loadtxt('/root/repo/.refbuild/run/ot/OrszagTang.0001.tab')
N = 64
U = np.asarray(s.state.U)[(slice(None),)+s.grid.interior()][:,0]
B = np.asarray(s.state.Bcc)[(slice(None),)+s.grid.interior()][:,0]
for name,(q,c) in {'d':(U[0],4),'M1':(U[1],5),'M2':(U[2],6),'E':(U[4],8),
                   'B1c':(B[0],9),'B2c':(B[1],10)}.items():
    r = ref[:,c].reshape(N,N)
    print(f'{name}: {np.abs(q-r).max():.3e}', flush=True)
print('DONE', flush=True)
