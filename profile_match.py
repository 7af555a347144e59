"""Matcher kernel variants on the real TPU (VERDICT r04 weak #3)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

import mve_tpu  # noqa: F401
from mve_tpu.ops.matching import descriptor_top2 as _top2
from mve_tpu.ops.pallas_matching import descriptor_top2_pallas

N = M = 8192
rng = np.random.RandomState(0)
q = rng.rand(N, 128).astype(np.float32)
q /= np.linalg.norm(q, axis=1, keepdims=True)
r = rng.rand(M, 128).astype(np.float32)
r /= np.linalg.norm(r, axis=1, keepdims=True)
d1 = jnp.asarray(q)
d2 = jnp.asarray(r)
print("devices:", jax.devices())

xla = jax.jit(_top2)


def timeit(name, fn):
    jax.block_until_ready(fn(d1, d2))
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        res = fn(d1, d2)
    jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:24s} {dt*1e3:8.3f} ms  {2.0*N*M*128/dt/1e12:7.2f} TFLOP/s")
    return res


res_x = timeit("xla f32", xla)
res_pf = timeit("pallas f32", lambda a, b: descriptor_top2_pallas(a, b, bf16=False))
res_pb = timeit("pallas bf16", lambda a, b: descriptor_top2_pallas(a, b, bf16=True))

ix = np.asarray(res_x[0])
ib = np.asarray(res_pb[0])
if_ = np.asarray(res_pf[0])
print("agree f32 pallas vs xla:", (if_ == ix).mean())
print("agree bf16 pallas vs xla:", (ib == ix).mean())
d1x = np.asarray(res_x[1]); d1b = np.asarray(res_pb[1])
print("dist1 max abs diff bf16:", np.abs(d1x - d1b).max())
