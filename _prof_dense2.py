import time, functools
import numpy as np
import jax, jax.numpy as jnp
from dodt_tpu.utils.metrics import device_sync

rng = np.random.RandomState(0)
def timeit(name, fn, n=50):
    out = fn(); device_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    device_sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)

fm = jnp.asarray(rng.rand(700, 800).astype(np.float32))
PAD = 30
NZ, NX, P = 140, 160, 5

# variant A: separable — rows first (sublane-strided), transpose, rows again
@jax.jit
def sep(fm):
    fmp = jnp.pad(fm, ((PAD, PAD + 10), (PAD, PAD + 10)), mode="edge")
    rows = []
    for c in range(4):
        for i in range(3):
            off = PAD - 13 + c * 3 + i * 7   # fake static offsets
            fr = 0.3
            r0 = fmp[off:off + P * NZ:P]          # (140, Wp)
            r1 = fmp[off + 1:off + 1 + P * NZ:P]
            rows.append(r0 + (r1 - r0) * fr)      # (140, Wp)
    R = jnp.stack(rows)                           # (12, 140, Wp)
    Rt = jnp.swapaxes(R, 1, 2)                    # (12, Wp, 140)
    outs = []
    for c in range(4):
        for j in range(3):
            off = PAD - 11 + c * 2 + j * 9
            fr = 0.6
            c0 = Rt[:, off:off + P * NX:P]        # (12, 160, 140)
            c1 = Rt[:, off + 1:off + 1 + P * NX:P]
            outs.append(c0 + (c1 - c0) * fr)
    return jnp.stack(outs)
timeit("separable strided (12 row + 12 col)", lambda: sep(fm))

# variant B: 36 tiny convs stride 5
@jax.jit
def convs(fm):
    fmp = jnp.pad(fm, ((PAD, PAD + 10), (PAD, PAD + 10)), mode="edge")[None, :, :, None]
    outs = []
    k = jnp.asarray([[0.2, 0.3], [0.1, 0.4]], jnp.float32).reshape(2, 2, 1, 1)
    for c in range(4):
        for s in range(9):
            oy = 13 + c * 2 + s
            ox = 11 + c * 3 + s
            sl = fmp[:, oy:oy + P * NZ + 1, ox:ox + P * NX + 1]
            o = jax.lax.conv_general_dilated(sl, k, (P, P), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            outs.append(o[0, :, :, 0])
    return jnp.stack(outs)
timeit("36 tiny 2x2 convs stride 5", lambda: convs(fm))

# variant C: one conv, 36 channels, sparse big kernel
@jax.jit
def bigconv(fm):
    fmp = jnp.pad(fm, ((PAD, PAD + 10), (PAD, PAD + 10)), mode="edge")[None, :, :, None]
    kern = np.zeros((40, 40, 1, 36), np.float32)
    for o in range(36):
        kern[(o * 7) % 39, (o * 11) % 39, 0, o] = 1.0
        kern[(o * 7) % 39 + 1, (o * 11) % 39 + 1, 0, o] = 0.5
    k = jnp.asarray(kern)
    o = jax.lax.conv_general_dilated(fmp[:, :P*NZ+40, :P*NX+40], k, (P, P), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return o
timeit("one 40x40x36 sparse conv stride 5", lambda: bigconv(fm))
