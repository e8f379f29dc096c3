import os
os.environ['JAX_PLATFORMS']='cpu'
import jax; jax.config.update('jax_enable_x64', True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
from atmospheric_athena_tpu import Simulation
from atmospheric_athena_tpu.eos import cons1d_to_prim1d
from atmospheric_athena_tpu.integrators.sweep import to_sweep

s = Simulation.from_file('/root/reference/tst/1D-hydro/athinput.sod', order='3')
s.run()
ref = np.loadtxt('/root/repo/.refbuild/run/sodppm/Sod.0025.tab')
U1d, _ = to_sweep(s.state.U, None, 0, s.sim)
W = np.asarray(cons1d_to_prim1d(U1d, None, s.sim))[:, 0, 0, :]
mine = W[:, s.grid.interior()[2]]
print('steps:', int(s.state.nstep))
for name, k, col in [('d',0,2),('V1',1,3),('P',4,6)]:
    print(f'{name}: {np.abs(mine[k]-ref[:,col]).max():.3e}')
