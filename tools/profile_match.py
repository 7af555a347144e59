"""Matcher kernel variants on the real TPU (VERDICT r04 weak #3).

Times with VARIED input buffers (8 rotating pairs) to defeat any
result caching, and reports both single-call latency and pipelined
throughput."""
import time

import numpy as np
import jax
import jax.numpy as jnp

import mve_tpu  # noqa: F401
from mve_tpu.ops.matching import descriptor_top2 as _top2
from mve_tpu.ops.pallas_matching import descriptor_top2_pallas

N = M = 8192
rng = np.random.RandomState(0)


def unit(n, seed):
    r = np.random.RandomState(seed)
    x = r.rand(n, 128).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


NBUF = 8
qs = [jnp.asarray(unit(N, 10 + i)) for i in range(NBUF)]
rs = [jnp.asarray(unit(M, 50 + i)) for i in range(NBUF)]
jax.block_until_ready((qs, rs))
print("devices:", jax.devices())

xla = jax.jit(_top2)


def timeit(name, fn, reps=24):
    jax.block_until_ready(fn(qs[0], rs[0]))
    # single-call latency
    t0 = time.perf_counter()
    jax.block_until_ready(fn(qs[1], rs[1]))
    lat = time.perf_counter() - t0
    # pipelined throughput over varied buffers
    t0 = time.perf_counter()
    out = []
    for i in range(reps):
        out.append(fn(qs[i % NBUF], rs[i % NBUF])[0])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:14s} latency {lat*1e3:7.3f} ms | pipelined "
          f"{dt*1e3:7.3f} ms  {2.0*N*M*128/dt/1e12:7.2f} TFLOP/s")
    return fn(qs[0], rs[0])


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
