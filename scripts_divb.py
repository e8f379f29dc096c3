import os
os.environ['JAX_PLATFORMS']='cpu'
import jax; jax.config.update('jax_enable_x64', True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
from atmospheric_athena_tpu import Simulation

s = Simulation.from_file('/root/repo/.refbuild/run/blast3dmhd/athinput.b3n1', gas='mhd')
s.step()
B1i = np.asarray(s.state.B1i); B2i = np.asarray(s.state.B2i); B3i = np.asarray(s.state.B3i)
g = s.grid
ng = g.nghost
zs, ys, xs = g.interior()
divb = ((B1i[zs, ys, xs.start+1:xs.stop+1] - B1i[zs, ys, xs])/g.dx[0]
      + (B2i[zs, ys.start+1:ys.stop+1, xs] - B2i[zs, ys, xs])/g.dx[1]
      + (B3i[zs.start+1:zs.stop+1, ys, xs] - B3i[zs, ys, xs])/g.dx[2])
print('max |div B| after 1 step:', np.abs(divb).max())
print('max |B|:', max(np.abs(B1i).max(), np.abs(B2i).max(), np.abs(B3i).max()))
