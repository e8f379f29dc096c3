import os
os.environ['JAX_PLATFORMS']='cpu'
import jax; jax.config.update('jax_enable_x64', True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
from atmospheric_athena_tpu import Simulation
from atmospheric_athena_tpu.integrators import vl3d
from atmospheric_athena_tpu.defs import ID, IM1, IEN

s = Simulation.from_file('/root/repo/.refbuild/run/blastvl/deck1', gas='mhd',
                         integrator='vl', flux='hlld', order='2p',
                         first_order_flux_correction=True)
vl3d.DEBUG = {}
st = vl3d.step(s.state, s.state.dt, s.sim, s.grid, s.problem)
D = {k: jax.tree_util.tree_map(np.asarray, v) for k, v in vl3d.DEBUG.items()}

shape = (40, 56, 40)
base = '/root/repo/.refbuild/run/blastvl/dbg/dbg_'
def load3(nm): return np.fromfile(base+nm+'.bin').reshape(shape)
def loadc(nm):
    a = np.fromfile(base+nm+'.bin').reshape(shape+(7,))
    return np.moveaxis(a, -1, 0)

S = (slice(4,-4),)*3
def cmp(nm, mine, ref):
    d = np.abs(mine[S]-ref[S]).max()
    print(f'{nm}: {d:.3e}' + ('  <<<<' if d > 1e-12 else ''), flush=True)

for a, nm in [(0, 'vl_x1F_p1'), (2, 'vl_x3F_p1')]:
    ref = loadc(nm)
    a1, a2 = (a+1)%3, (a+2)%3
    mine = np.stack([D['Fp'][a][ID], D['Fp'][a][IM1+a], D['Fp'][a][IM1+a1],
                     D['Fp'][a][IM1+a2], D['Fp'][a][IEN],
                     D['FByz'][a][0], D['FByz'][a][1]])
    for c2, cn in enumerate(['d','Mx','My','Mz','E','By','Bz']):
        cmp(f'{nm}.{cn}', mine[c2], ref[c2])
for e, nm in [(0,'vl_emf1_p'),(1,'vl_emf2_p'),(2,'vl_emf3_p')]:
    cmp(nm, D['emfP'][e], load3(nm))
cmp('vl_B1f', D['Bf'][0], load3('vl_B1f'))
for e, nm in [(0,'vl_emf1_c'),(1,'vl_emf2_c'),(2,'vl_emf3_c')]:
    cmp(nm, D['emfC'][e], load3(nm))
ref = loadc('vl_x1F_p2')
mine = np.stack([D['Fp2'][0][ID], D['Fp2'][0][IM1], D['Fp2'][0][IM1+1],
                 D['Fp2'][0][IM1+2], D['Fp2'][0][IEN],
                 D['FByz2'][0][0], D['FByz2'][0][1]])
for c2, cn in enumerate(['d','Mx','My','Mz','E','By','Bz']):
    cmp(f'vl_x1F_p2.{cn}', mine[c2], ref[c2])
print('DONE', flush=True)

ref = np.loadtxt('/root/repo/.refbuild/run/blastvl/n1/Blast_B1.0001.tab')
Nx, Ny, Nz = 32, 48, 32
U2 = np.asarray(st.U)[(slice(None),)+s.grid.interior()]
B2 = np.asarray(st.Bcc)[(slice(None),)+s.grid.interior()]
for name,(qq,c) in {'d':(U2[0],6),'E':(U2[4],10),'B1c':(B2[0],11),'B2c':(B2[1],12),'B3c':(B2[2],13)}.items():
    r = ref[:,c].reshape(Nz,Ny,Nx)
    print(f'final {name}: {np.abs(qq-r).max():.3e}', flush=True)
print('DONE2', flush=True)
