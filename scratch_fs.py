import sys, time, functools
import jax, jax.numpy as jnp, numpy as np
import xgcm_tpu as xt
from tests.datasets import cubed_sphere_dataset

K = 30
def log(s): print(s, file=sys.stderr, flush=True)
nface = 2048
ds_cs, fc = cubed_sphere_dataset(n=nface)
grid_cs = xt.Grid(ds_cs, face_connections=fc, periodic=False)
rng = np.random.RandomState(0)
cs_data = jnp.asarray(rng.rand(6, nface, nface).astype(np.float32))
log(f"backend={jax.default_backend()}")
jnp.zeros(()).block_until_ready()

import xgcm_tpu.ops.pallas_stencils as ps
orig = ps.face_shift_op

for T in (128, 256, 512):
    ps.face_shift_op = functools.partial(orig, tile_rows=T)
    @jax.jit
    def ch(d):
        def body(_, dd):
            return grid_cs.diff(xt.GriddedArray(dd, ("face","y","x")), "X", boundary="fill").data
        return jnp.sum(jax.lax.fori_loop(0, K, body, d))
    try:
        float(ch(cs_data))
        t0 = time.perf_counter(); float(ch(cs_data))
        dt = (time.perf_counter() - t0) / K
        log(f"T={T}: {dt*1e3:.3f} ms -> {6*nface*nface/dt/1e9:.2f} Ggps")
    except Exception as e:
        log(f"T={T} failed: {str(e)[:150]}")
ps.face_shift_op = orig
