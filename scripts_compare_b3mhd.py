import os
os.environ['JAX_PLATFORMS']='cpu'
import jax; jax.config.update('jax_enable_x64', True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
from atmospheric_athena_tpu import Simulation

s = Simulation.from_file('/root/repo/.refbuild/run/blast3dmhd/athinput.b3', gas='mhd')
print('sim:', s.sim.gas, s.sim.flux, flush=True)
s.run()
print('steps:', int(s.state.nstep), 'time:', float(s.state.time), flush=True)
ref = np.loadtxt('/root/repo/.refbuild/run/blast3dmhd/Blast_B1.0001.tab')
Nx, Ny, Nz = 32, 48, 32
U = np.asarray(s.state.U)[(slice(None),)+s.grid.interior()]
B = np.asarray(s.state.Bcc)[(slice(None),)+s.grid.interior()]
cols = {'d':(U[0],6),'M1':(U[1],7),'M2':(U[2],8),'M3':(U[3],9),'E':(U[4],10),
        'B1c':(B[0],11),'B2c':(B[1],12),'B3c':(B[2],13)}
for name,(q,c) in cols.items():
    r = ref[:,c].reshape(Nz,Ny,Nx)
    print(f'{name}: max abs diff {np.abs(q-r).max():.3e} (scale {np.abs(r).max():.3})', flush=True)
# divergence check on face fields
B1i = np.asarray(s.state.B1i); B2i = np.asarray(s.state.B2i); B3i = np.asarray(s.state.B3i)
sl = s.grid.interior()
divb = ((B1i[:,:,1:]-B1i[:,:,:-1])[sl[0],sl[1],sl[2].start:sl[2].stop-0][...,:]/s.grid.dx[0])
print('DONE', flush=True)
