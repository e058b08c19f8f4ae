import time
import numpy as np
import jax, jax.numpy as jnp
import flax.linen as nn
from dodt_tpu.utils.metrics import device_sync

rng = np.random.RandomState(0)
def timeit(name, fn, n=10):
    out = fn(); device_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    device_sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.1f} ms", flush=True)

DT = jnp.bfloat16
class Enc(nn.Module):
    norm: str = "gn"
    @nn.compact
    def __call__(self, x):
        x = x.astype(DT)
        def block(h, num, ch, name):
            for i in range(num):
                h = nn.Conv(ch, (3,3), padding="SAME", dtype=DT, name=f"{name}_{i}")(h)
                if self.norm == "gn":
                    h = nn.GroupNorm(num_groups=min(8,ch), dtype=DT)(h)
                h = nn.relu(h)
            return h
        def pool(h): return nn.max_pool(h, (2,2), strides=(2,2))
        c1 = block(x, 2, 32, "conv1")
        c2 = block(pool(c1), 2, 64, "conv2")
        c3 = block(pool(c2), 3, 128, "conv3")
        c4 = block(pool(c3), 3, 256, "conv4")
        # decoder to stride 2
        def up(h, ch, name):
            h = nn.ConvTranspose(ch, (3,3), strides=(2,2), padding="SAME", dtype=DT, name=name)(h)
            if self.norm == "gn":
                h = nn.GroupNorm(num_groups=min(8,ch), dtype=DT)(h)
            return nn.relu(h)
        u3 = up(c4, 128, "upconv3")
        f3 = block(jnp.concatenate([c3, u3], -1), 1, 64, "pf3")
        u2 = up(f3, 64, "upconv2")
        f2 = block(jnp.concatenate([c2, u2], -1), 1, 32, "pf2")
        return f2

x = jnp.asarray(rng.rand(2, 704, 800, 6).astype(np.float32))
for norm in ("gn", "none"):
    m = Enc(norm=norm)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    g = jax.jit(jax.grad(lambda p, x: jnp.sum(m.apply(p, x).astype(jnp.float32)**2)))
    timeit(f"tower({norm}) x2 fwd+bwd", lambda: g(v, x))
    f = jax.jit(m.apply)
    timeit(f"tower({norm}) x2 fwd", lambda: f(v, x))
