"""Pallas TPU kernel: fused descriptor top-2 nearest neighbors.

Computes, for every query descriptor, the best and second-best inner
products against a reference set WITHOUT materializing the (N1, N2)
score matrix in HBM: the grid tiles queries (TM rows); each step streams
one TN-column chunk of references through the MXU and folds the chunk's
scores into running (best, second, argbest) accumulators that live in the
revisited output blocks. This is the TPU replacement for the reference's
SSE inner-product loop (nearest_neighbor.cc) at speed-of-light matmul
throughput with O(N1) memory traffic for the outputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TM = 1024  # query rows per tile (1-D f32 outputs are 1024-tiled in XLA's
           # current layout; Mosaic requires the block to match)
TN = 512   # reference columns per chunk


def _top2_kernel(q_ref, r_ref, best_ref, second_ref, idx_ref,
                 precision=None):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full((TM,), -jnp.inf, jnp.float32)
        second_ref[:] = jnp.full((TM,), -jnp.inf, jnp.float32)
        idx_ref[:] = jnp.zeros((TM,), jnp.int32)

    # (TM, D) x (D, TN) on the MXU. The explicit precision matters: the
    # package sets jax_default_matmul_precision=highest globally (6-pass
    # f32 emulation), which silently applied INSIDE this kernel too and
    # made it lose to the XLA fallback in r04. Matching needs only bf16
    # mantissa (the reference discretizes descriptors to int16/uint8,
    # exhaustive_matching.cc), so the production path requests DEFAULT =
    # one bf16 MXU pass with f32 accumulation.
    scores = jax.lax.dot_general(
        q_ref[:], r_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    chunk_best = jnp.max(scores, axis=1)
    chunk_arg = jnp.argmax(scores, axis=1).astype(jnp.int32)
    masked = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 1) == chunk_arg[:, None],
        -jnp.inf, scores)
    chunk_second = jnp.max(masked, axis=1)

    best = best_ref[:]
    second = second_ref[:]
    idx = idx_ref[:]
    global_arg = chunk_arg + j * TN

    new_best = jnp.maximum(best, chunk_best)
    better = chunk_best > best
    new_idx = jnp.where(better, global_arg, idx)
    # Second best = max of (the loser of the best comparison, both
    # runner-up streams).
    new_second = jnp.maximum(jnp.where(better, best, chunk_best),
                             jnp.maximum(second, chunk_second))
    best_ref[:] = new_best
    second_ref[:] = new_second
    idx_ref[:] = new_idx


@functools.partial(jax.jit, static_argnames=("interpret", "bf16"))
def descriptor_top2_pallas(query, refs, interpret: bool = False,
                           bf16: bool = True):
    """query: (N1, D), refs: (N2, D) with N1 % TM == 0, N2 % TN == 0 and
    D % 128 == 0. Returns (idx, dist1, dist2) like ops.matching.

    bf16=True runs the MXU contraction at DEFAULT precision (one bf16
    pass, f32 accumulation) instead of the package-global `highest`
    (6-pass f32 emulation) — 4-6x the matmul rate. Descriptors are
    unit-norm with 0.2-clamped entries (sift.cc:832-840) and the
    reference itself matches on int16/uint8-DISCRETIZED descriptors
    (exhaustive_matching.cc init), so bf16's ~3 decimal digits lose
    nothing the pipeline relies on; scores accumulate in f32."""
    N1, D = query.shape
    N2 = refs.shape[0]
    precision = jax.lax.Precision.DEFAULT if bf16 else jax.lax.Precision.HIGHEST
    grid = (N1 // TM, N2 // TN)
    best, second, idx = pl.pallas_call(
        functools.partial(_top2_kernel, precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TM,), lambda i, j: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM,), lambda i, j: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM,), lambda i, j: (i,), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N1,), jnp.float32),
            jax.ShapeDtypeStruct((N1,), jnp.float32),
            jax.ShapeDtypeStruct((N1,), jnp.int32),
        ),
        interpret=interpret,
    )(query, refs.T)
    return idx, 2.0 - 2.0 * best, 2.0 - 2.0 * second
