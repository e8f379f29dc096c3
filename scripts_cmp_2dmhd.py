import os
os.environ['JAX_PLATFORMS']='cpu'
import jax; jax.config.update('jax_enable_x64', True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
from atmospheric_athena_tpu import Simulation
from atmospheric_athena_tpu.integrators import ctu2d_mhd

s = Simulation.from_file('/root/repo/.refbuild/run/blast2dmhd/deck1', gas='mhd')
st = ctu2d_mhd.step(s.state, s.state.dt, s.sim, s.grid, s.problem)
ref = np.loadtxt('/root/repo/.refbuild/run/blast2dmhd/Blast_B1.0001.tab')
Nx, Ny = 64, 96
U = np.asarray(st.U)[(slice(None),)+s.grid.interior()][:,0]
B = np.asarray(st.Bcc)[(slice(None),)+s.grid.interior()][:,0]
for name,(q,c) in {'d':(U[0],4),'M1':(U[1],5),'M2':(U[2],6),'M3':(U[3],7),'E':(U[4],8),
                   'B1c':(B[0],9),'B2c':(B[1],10),'B3c':(B[2],11)}.items():
    r = ref[:,c].reshape(Ny,Nx)
    print(f'{name}: {np.abs(q-r).max():.3e}', flush=True)
print('DONE', flush=True)
