"""Boost-compatible 32-bit hash combination.

The reference's Morgan kernel derives next-round atom invariants with
boost's ``hash_combine`` over uint32 values
(``src/morgan_fingerprint_kernels.cu:54-63``) and ``FlatBitVect`` exposes a
boost-hash-combine ``std::hash`` (``src/data_structures/flat_bit_vect.h:366-383``).
We reproduce the same arithmetic so the CPU (numpy) and TPU (jax) Morgan
implementations agree bit-for-bit with each other and with the boost
semantics the reference relies on.

Both numpy and jax variants are provided; they operate on uint32 arrays and
use explicit wrap-around arithmetic.
"""
from __future__ import annotations

import numpy as np

_GOLDEN = np.uint32(0x9E3779B9)


def hash_u32(v):
    """boost::hash<uint32> is the identity for 32-bit unsigned values."""
    return v


def hash_combine_u32(seed, value, xp=np):
    """``seed ^= hash(value) + 0x9e3779b9 + (seed << 6) + (seed >> 2)``.

    Works for numpy arrays/scalars (xp=np) and jax arrays (xp=jax.numpy).
    All inputs must already be uint32.
    """
    golden = xp.uint32(0x9E3779B9)
    if xp is np:
        with np.errstate(over="ignore"):
            seed = np.uint32(seed)
            value = np.uint32(value)
            mixed = value + golden + (seed << np.uint32(6)) + (seed >> np.uint32(2))
            return seed ^ mixed
    # jax path: uint32 arithmetic wraps by construction
    seed = seed.astype(xp.uint32) if hasattr(seed, "astype") else xp.uint32(seed)
    value = value.astype(xp.uint32) if hasattr(value, "astype") else xp.uint32(value)
    six = xp.uint32(6)
    two = xp.uint32(2)
    return seed ^ (value + golden + (seed << six) + (seed >> two))
