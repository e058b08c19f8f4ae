import time, functools
import numpy as np
import jax, jax.numpy as jnp
import flax.linen as nn
from dodt_tpu.config import cars_dt_tracking
from dodt_tpu.utils.metrics import device_sync

cfg = cars_dt_tracking()
rng = np.random.RandomState(0)
def timeit(name, fn, n=30):
    out = fn(); device_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    device_sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)

DT = jnp.bfloat16

class Enc(nn.Module):
    use_norm: bool = True
    @nn.compact
    def __call__(self, x):
        x = x.astype(DT)
        def block(h, num, ch, name):
            for i in range(num):
                h = nn.Conv(ch, (3,3), padding="SAME", dtype=DT, name=f"{name}_{i}")(h)
                if self.use_norm:
                    h = nn.GroupNorm(num_groups=min(8,ch), dtype=DT)(h)
                h = nn.relu(h)
            return h
        def pool(h): return nn.max_pool(h, (2,2), strides=(2,2))
        c1 = block(x, 2, 32, "conv1")
        c2 = block(pool(c1), 2, 64, "conv2")
        c3 = block(pool(c2), 3, 128, "conv3")
        c4 = block(pool(c3), 3, 256, "conv4")
        return c1, c2, c3, c4

x = jnp.asarray(rng.rand(1, 704, 800, 6).astype(np.float32))
enc = Enc()
v = jax.jit(enc.init)(jax.random.PRNGKey(0), x)
f = jax.jit(enc.apply)
timeit("encoder with GN", lambda: f(v, x))
enc2 = Enc(use_norm=False)
v2 = jax.jit(enc2.init)(jax.random.PRNGKey(0), x)
f2 = jax.jit(enc2.apply)
timeit("encoder no norm", lambda: f2(v2, x))

class Dec(nn.Module):
    @nn.compact
    def __call__(self, c1, c2, c3, c4):
        def block(h, num, ch, name):
            for i in range(num):
                h = nn.Conv(ch, (3,3), padding="SAME", dtype=DT, name=f"{name}_{i}")(h)
                h = nn.GroupNorm(num_groups=min(8,ch), dtype=DT)(h)
                h = nn.relu(h)
            return h
        def up(h, ch, name):
            h = nn.ConvTranspose(ch, (3,3), strides=(2,2), padding="SAME", dtype=DT, name=name)(h)
            h = nn.GroupNorm(num_groups=min(8,ch), dtype=DT)(h)
            return nn.relu(h)
        u3 = up(c4, 128, "upconv3")
        f3 = block(jnp.concatenate([c3, u3], -1), 1, 64, "pf3")
        u2 = up(f3, 64, "upconv2")
        f2_ = block(jnp.concatenate([c2, u2], -1), 1, 32, "pf2")
        u1 = up(f2_, 32, "upconv1")
        f1 = block(jnp.concatenate([c1, u1], -1), 1, 32, "pf1")
        return f1
c1, c2, c3, c4 = f(v, x)
dec = Dec()
vd = jax.jit(dec.init)(jax.random.PRNGKey(0), c1, c2, c3, c4)
fd = jax.jit(dec.apply)
timeit("decoder", lambda: fd(vd, c1, c2, c3, c4))
