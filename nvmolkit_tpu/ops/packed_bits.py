"""Packed bit-vector helpers (uint32 words, LSB-first within a word).

TPU-native replacement for the reference's ``FlatBitVect``
(``src/data_structures/flat_bit_vect.h:103-260``): fingerprints live as
rows of a 2-D ``uint32[n, n_bits/32]`` array; bit ``b`` of a row is bit
``b % 32`` of word ``b // 32``.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def n_words(n_bits: int) -> int:
    return (n_bits + 31) // 32


def pack_bits_np(bits: np.ndarray) -> np.ndarray:
    """Pack a (..., n_bits) 0/1 array into (..., n_bits/32) uint32."""
    bits = np.asarray(bits)
    if bits.shape[-1] % 32:
        pad = 32 - bits.shape[-1] % 32
        bits = np.concatenate([bits, np.zeros(bits.shape[:-1] + (pad,), bits.dtype)], axis=-1)
    b = bits.reshape(bits.shape[:-1] + (-1, 32)).astype(np.uint32)
    shifts = np.arange(32, dtype=np.uint32)
    return (b << shifts).sum(axis=-1, dtype=np.uint32)


def unpack_bits_np(words: np.ndarray, n_bits: int | None = None) -> np.ndarray:
    """Unpack (..., W) uint32 into (..., W*32) uint8 0/1 (optionally truncated)."""
    words = np.asarray(words, dtype=np.uint32)
    shifts = np.arange(32, dtype=np.uint32)
    bits = ((words[..., None] >> shifts) & np.uint32(1)).astype(np.uint8)
    bits = bits.reshape(words.shape[:-1] + (-1,))
    if n_bits is not None:
        bits = bits[..., :n_bits]
    return bits


def unpack_bits(words: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """JAX: unpack (..., W) uint32 words into (..., W*32) of ``dtype``.

    The unpacked {0,1} matrix is what rides the MXU for popcount-matmuls
    (the reference instead uses b1 BMMA tensor-core ops,
    ``src/utils/macros_ptx.cuh:137-239``).
    """
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (words[..., None] >> shifts) & jnp.uint32(1)
    bits = bits.reshape(words.shape[:-1] + (words.shape[-1] * 32,))
    return bits.astype(dtype)


def popcount_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Per-element popcount of a uint32 array (VPU bit-twiddling)."""
    x = x.astype(jnp.uint32)
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def popcount_rows(words: jnp.ndarray) -> jnp.ndarray:
    """Total popcount along the last (word) axis -> int32."""
    return popcount_u32(words).sum(axis=-1, dtype=jnp.int32)
