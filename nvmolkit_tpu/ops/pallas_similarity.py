"""Fused packed-bit Tanimoto similarity as a Pallas TPU kernel.

The role the b1 tensor-core BMMA kernel plays in the reference
(``src/similarity_kernels.cu:33``, ``macros_ptx.cuh:137-239``): one
kernel consumes PACKED uint32 fingerprints, expands them to int8 lanes
in VMEM, runs the AND-popcount contraction on the MXU, and applies the
Tanimoto epilogue — the unpacked operands never round-trip through HBM
(32x less operand traffic than the XLA path, which materializes them).

Measured on TPU v5e (16384x16384, 2048-bit): ~3.3e10 pairs/sec vs
~4.0e10 for the XLA int8 path in ops/similarity.py — XLA's tuned int8
emitters beat the in-kernel re-unpack cost, so the XLA path stays the
default and this kernel is kept as the packed-operand alternative
(useful when HBM pressure makes the 32x operand blow-up unaffordable).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nvmolkit_tpu.ops.packed_bits import popcount_rows


def _unpack(words: jnp.ndarray) -> jnp.ndarray:
    """[R, W] uint32 -> [R, W*32] int8 bits, word-major bit order.

    2-D throughout (Mosaic cannot collapse a trailing lane dim): each
    word is lane-repeated 32x and shifted by a modular iota.
    """
    r, w = words.shape
    rep = pltpu.repeat(words, 32, axis=1)               # [R, W*32], tiled
    # pltpu.repeat tiles the word axis (column c holds word c % W), so
    # shift c // W extracts each (word, bit) pair exactly once. Column
    # order differs from the packed bit order, but both operands share
    # it, so the AND-popcount contraction is unaffected.
    shifts = (
        jax.lax.broadcasted_iota(jnp.int32, (r, w * 32), 1) // w
    ).astype(jnp.uint32)
    return ((rep >> shifts) & jnp.uint32(1)).astype(jnp.int8)


def _tanimoto_kernel(a_ref, b_ref, pa_ref, pb_ref, out_ref, a_bits_scratch):
    # a_ref: [BM, W] uint32; b_ref: [BN, W] uint32. The grid sweeps j
    # fastest, so the A-tile unpack is cached in VMEM scratch and only
    # recomputed when the row block changes.
    @pl.when(pl.program_id(1) == 0)
    def _():
        a_bits_scratch[:] = _unpack(a_ref[:])

    bits_a = a_bits_scratch[:]
    bits_b = _unpack(b_ref[:])
    common = jax.lax.dot_general(
        bits_a, bits_b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    pa = pa_ref[:].astype(jnp.float32)  # [BM, 1]
    pb = pb_ref[:].astype(jnp.float32)  # [1, BN]
    denom = pa + pb - common
    out_ref[:] = jnp.where(denom > 0, common / denom, 0.0)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def cross_tanimoto_pallas(
    fps_a: jnp.ndarray,  # [m, W] uint32 (m, n multiples of block)
    fps_b: jnp.ndarray,  # [n, W] uint32
    *,
    block: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    m, w = fps_a.shape
    n = fps_b.shape[0]
    if m % block or n % block:
        raise ValueError(f"m={m}, n={n} must be multiples of block={block}")
    pa = popcount_rows(fps_a)[:, None]   # [m, 1]
    pb = popcount_rows(fps_b)[None, :]   # [1, n]
    grid = (m // block, n // block)
    return pl.pallas_call(
        _tanimoto_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, w), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, w), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block, block), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((block, w * 32), jnp.int8)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * w * 32,
            bytes_accessed=m * w * 4 + n * w * 4 + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(fps_a, fps_b, pa, pb)
