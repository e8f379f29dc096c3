import os
os.environ['JAX_PLATFORMS']='cpu'
import jax; jax.config.update('jax_enable_x64', True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
from atmospheric_athena_tpu import Simulation, bvals
from atmospheric_athena_tpu import dt as dt_mod
from atmospheric_athena_tpu.integrators import ctu3d_mhd
from atmospheric_athena_tpu.defs import ID, IM1, IEN

s = Simulation.from_file('/root/repo/.refbuild/run/blast3dmhd/athinput.b3a2', gas='mhd')
# step 1 (eager)
dt = jnp.minimum(s.state.dt, s.tlim - s.state.time)
st = ctu3d_mhd.step(s.state, dt, s.sim, s.grid, s.problem)
st = st.replace(time=st.time+dt, nstep=st.nstep+1, dt=dt)
st = st.replace(dt=dt_mod.new_dt(st, s.sim, s.grid, s.cour_no))
st = bvals.apply_bc(st, s.grid, s.sim, s.problem)
# step 2 with capture
ctu3d_mhd.DEBUG = {}
dt2 = jnp.minimum(st.dt, s.tlim - st.time)
st2 = ctu3d_mhd.step(st, dt2, s.sim, s.grid, s.problem)
D = {k: jax.tree_util.tree_map(np.asarray, v) for k, v in ctu3d_mhd.DEBUG.items()}

shape = (32+8, 48+8, 32+8)
base = '/root/repo/.refbuild/run/blast3dmhd/dbg/dbg_'
def load3(name):
    return np.fromfile(base+name+'.bin').reshape(shape)
def loadc(name):
    a = np.fromfile(base+name+'.bin').reshape(shape+(7,))
    return np.moveaxis(a, -1, 0)

S = (slice(4,-4),)*3  # compare active region only
def cmp(name, mine, ref, sl=S):
    d = np.abs(mine[sl]-ref[sl]).max()
    flag = '  <<<<' if d > 1e-12 else ''
    print(f'{name}: {d:.3e}{flag}', flush=True)

# first-pass fluxes, sweep order per axis
for a, nm in [(0,'x1Flux_p1'), (1,'x2Flux_p1'), (2,'x3Flux_p1')]:
    ref = loadc(nm)
    a1, a2 = (a+1)%3, (a+2)%3
    mine = np.stack([D['Fp'][a][ID], D['Fp'][a][IM1+a], D['Fp'][a][IM1+a1],
                     D['Fp'][a][IM1+a2], D['Fp'][a][IEN],
                     D['FByz'][a][0], D['FByz'][a][1]])
    for c, cn in enumerate(['d','Mx','My','Mz','E','By','Bz']):
        cmp(f'{nm}.{cn}', mine[c], ref[c])

for e, nm in [(0,'emf1_p1'),(1,'emf2_p1'),(2,'emf3_p1')]:
    cmp(nm, D['emf_n'][e], load3(nm))
for a, nm in [(0,'B1f'),(1,'B2f'),(2,'B3f')]:
    cmp(nm, D['Bf'][a], load3(nm))

for a, nm in [(0,'x1'), (1,'x2')]:
    a1, a2 = (a+1)%3, (a+2)%3
    for side, UU, BB in [('Ul', D['Ulc'][a], D['Byzlc'][a]),
                         ('Ur', D['Urc'][a], D['Byzrc'][a])]:
        ref = loadc(f'{side}_{nm}')
        mine = np.stack([UU[ID], UU[IM1+a], UU[IM1+a1], UU[IM1+a2], UU[IEN],
                         BB[0], BB[1]])
        for c, cn in enumerate(['d','Mx','My','Mz','E','By','Bz']):
            cmp(f'{side}_{nm}.{cn}', mine[c], ref[c])

cmp('dhalf', D['dhalf'], load3('dhalf'))
cmp('emf1cc_h', D['emf_cc_h'][0], load3('emf1cc_h'))
for e, nm in [(0,'emf1_h'),(1,'emf2_h'),(2,'emf3_h')]:
    cmp(nm, D['emf_h'][e], load3(nm))
for a, nm in [(0,'x1Flux_p2'), (1,'x2Flux_p2'), (2,'x3Flux_p2')]:
    ref = loadc(nm)
    a1, a2 = (a+1)%3, (a+2)%3
    mine = np.stack([D['Fp2'][a][ID], D['Fp2'][a][IM1+a], D['Fp2'][a][IM1+a1],
                     D['Fp2'][a][IM1+a2], D['Fp2'][a][IEN],
                     D['FByz2'][a][0], D['FByz2'][a][1]])
    for c, cn in enumerate(['d','Mx','My','Mz','E','By','Bz']):
        cmp(f'{nm}.{cn}', mine[c], ref[c])
print('DONE', flush=True)
