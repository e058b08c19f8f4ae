import time, functools
import numpy as np
import jax, jax.numpy as jnp
from dodt_tpu.utils.metrics import device_sync

rng = np.random.RandomState(0)
def timeit(name, fn, n=30):
    out = fn(); device_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    device_sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.3f} ms", flush=True)

scores = jnp.asarray(rng.rand(89600).astype(np.float32))
f1 = jax.jit(lambda s: jax.lax.top_k(s, 1200))
timeit("lax.top_k 1200 of 89600", lambda: f1(scores))
f2 = jax.jit(lambda s: jax.lax.approx_max_k(s, 1200, recall_target=0.95))
timeit("approx_max_k 1200 of 89600", lambda: f2(scores))
f3 = jax.jit(lambda s: jax.lax.top_k(s, 300))
timeit("lax.top_k 300 of 89600", lambda: f3(scores))
# rpn heads on 89600 x 288
x = jnp.asarray(rng.rand(89600, 288).astype(np.float32))
import flax.linen as nn
from dodt_tpu.models.dt_avod import MlpHead
head = MlpHead((256, 256), 2, 1.0)
v = jax.jit(head.init, static_argnames=("train",))(jax.random.PRNGKey(0), x, train=False)
hf = jax.jit(functools.partial(head.apply, train=False))
timeit("rpn head 89600x288", lambda: hf(v, x))
# decode+project over 89600
from dodt_tpu.ops import boxes as box_ops
from dodt_tpu.ops.projection import project_to_bev
anch = jnp.asarray(rng.rand(89600, 6).astype(np.float32))
off = jnp.asarray(rng.rand(89600, 6).astype(np.float32) * 0.1)
be = np.asarray([[-40., 40.], [0., 70.]], np.float32)
@jax.jit
def dec(anch, off):
    prop = box_ops.offset_to_anchor(anch, off)
    return project_to_bev(prop, be)
timeit("decode+project 89600", lambda: dec(anch, off))
