import os, time, sys
sub = sys.argv[1] if len(sys.argv) > 1 else "5"
os.environ["PEMP_STEP_SUB"] = sub
if len(sys.argv) > 2:
    os.environ["PEMP_NODE_TILE"] = sys.argv[2]
import numpy as np, jax, jax.numpy as jnp
from pemp_tpu.ops.pallas.fused_step import fused_mpn_step

rng = np.random.RandomState(0)
n, c, t, d, h, dc, de, n_img = 5440, 80, 17, 64, 64, 64, 64, 680
e = n * c
bf = jnp.bfloat16
f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32), bf)
args = (f(n, h), f(n, h), f(e, h), f(e, dc), f(n, t, d),
        jnp.asarray(rng.randint(0, n_img, e), jnp.int32),
        jnp.asarray(rng.randint(0, t, e), jnp.int32),
        jnp.ones(e, jnp.int32),
        f(dc, h), f(h, de), f(de), f(de, t * d), f(de, 1))
fn = jax.jit(lambda *a: fused_mpn_step(*a, n, t, n_img))
t0 = time.perf_counter()
out, ne = fn(*args)
jax.block_until_ready(out)
print(f"sub={sub} compile+run {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
for _ in range(50):
    out, ne = fn(*args)
np.asarray(out).ravel()[:1]
print(f"sub={sub} 50 runs {(time.perf_counter()-t0)/50*1e3:.2f} ms/call")
