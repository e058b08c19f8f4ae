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

def conv(x, k):
    return jax.lax.conv_general_dilated(x, k, (1,1), "SAME",
        dimension_numbers=("NHWC","HWIO","NHWC"))

for (H, W, Ci, Co) in [(704,800,32,32),(704,800,6,32),(352,400,64,64),(176,200,128,128),(88,100,256,256)]:
    x = jnp.asarray(rng.rand(1,H,W,Ci).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.rand(3,3,Ci,Co).astype(np.float32)).astype(jnp.bfloat16)
    gflop = 2*H*W*9*Ci*Co/1e9
    f = jax.jit(functools.partial(conv))
    out = f(x,k); device_sync(out)
    t0=time.perf_counter()
    for _ in range(30): out = f(x,k)
    device_sync(out)
    dt=(time.perf_counter()-t0)/30
    print(f"conv {H}x{W} {Ci}->{Co}: {dt*1000:.3f} ms  {gflop/dt:.0f} GFLOP/s", flush=True)

# wide-channel comparison
x = jnp.asarray(rng.rand(1,176,200,256).astype(np.float32)).astype(jnp.bfloat16)
k = jnp.asarray(rng.rand(3,3,256,256).astype(np.float32)).astype(jnp.bfloat16)
f = jax.jit(conv)
out=f(x,k); device_sync(out)
t0=time.perf_counter()
for _ in range(30): out=f(x,k)
device_sync(out)
dt=(time.perf_counter()-t0)/30
print(f"conv 176x200 256->256: {dt*1000:.3f} ms  {2*176*200*9*256*256*2/1e9/dt/2:.0f} GFLOP/s")
