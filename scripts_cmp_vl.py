import os
os.environ['JAX_PLATFORMS']='cpu'
import jax; jax.config.update('jax_enable_x64', True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
from atmospheric_athena_tpu import Simulation

s = Simulation.from_file('/root/repo/.refbuild/run/blastvl/deck', gas='mhd',
                         integrator='vl', flux='hlld', order='2p',
                         first_order_flux_correction=True)
s.run(max_steps=2)
print('t:', float(s.state.time), 'steps:', int(s.state.nstep), flush=True)
ref = np.loadtxt('/root/repo/.refbuild/run/blastvl/Blast_B1.0001.tab')
Nx, Ny, Nz = 32, 48, 32
U = np.asarray(s.state.U)[(slice(None),)+s.grid.interior()]
B = np.asarray(s.state.Bcc)[(slice(None),)+s.grid.interior()]
for name,(q,c) in {'d':(U[0],6),'M1':(U[1],7),'M2':(U[2],8),'M3':(U[3],9),'E':(U[4],10),
        'B1c':(B[0],11),'B2c':(B[1],12),'B3c':(B[2],13)}.items():
    r = ref[:,c].reshape(Nz,Ny,Nx)
    print(f'{name}: {np.abs(q-r).max():.3e}', flush=True)
print('DONE', flush=True)
