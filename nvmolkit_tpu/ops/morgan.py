"""Morgan fingerprints — batched JAX implementation (TPU path).

TPU-native redesign of the reference's GPU kernel
(``src/morgan_fingerprint_kernels.cu:150-503``): where the reference maps
one cooperative-group tile per molecule with shared-memory neighborhood
bitsets and warp sorts, we batch molecules into padded size classes
(32/64/128 atoms — the same buckets as ``morgan_fingerprint_kernels.h:46-92``)
and express each radius round as dense masked tensor ops over the whole
batch:

  * pair sorting         -> ``lax.sort`` with two keys,
  * hash chaining        -> unrolled uint32 hash_combine over the 8
                            adjacency slots (MAX_BONDS_PER_ATOM),
  * neighborhood growth  -> gather + bitwise-OR over packed bond bitsets,
  * duplicate detection  -> an A x A bitset-equality matrix per molecule
                            plus comparison against all accepted
                            neighborhoods from previous rounds,
  * bit setting          -> one-hot word scatter OR-reduced over atoms.

Output is bit-identical to :func:`nvmolkit_tpu.ops.morgan_cpu.morgan_fingerprint_cpu`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nvmolkit_tpu.chem.mol import MAX_BONDS_PER_ATOM, Mol
from nvmolkit_tpu.ops.morgan_cpu import atom_invariants
from nvmolkit_tpu.utils.hashing import hash_combine_u32

_U32 = jnp.uint32


def prepare_batch(
    mols: list[Mol], max_atoms: int, use_chirality: bool = False
) -> dict[str, np.ndarray]:
    """Host-side featurization of a bucket of molecules into padded arrays.

    Plays the role of the reference's ``MorganInvariantsGenerator``
    (``src/morgan_fingerprint_common.h:56-77``): flat per-atom invariants
    plus adjacency, padded to ``max_atoms``.
    """
    n = len(mols)
    A = max_atoms
    K = MAX_BONDS_PER_ATOM
    max_bonds = 2 * A  # bond-bitset capacity; bonds <= 2*atoms for valence<=4
    W = max_bonds // 32

    inv0 = np.zeros((n, A), dtype=np.uint32)
    adj_atoms = np.zeros((n, A, K), dtype=np.int32)
    adj_code = np.zeros((n, A, K), dtype=np.uint32)
    adj_mask = np.zeros((n, A, K), dtype=bool)
    own_bits = np.zeros((n, A, W), dtype=np.uint32)
    atom_mask = np.zeros((n, A), dtype=bool)
    degree = np.zeros((n, A), dtype=np.int32)

    for b, mol in enumerate(mols):
        arrays = mol.to_arrays()
        na = mol.num_atoms
        if na > A:
            raise ValueError(f"molecule with {na} atoms exceeds bucket {A}")
        if mol.num_bonds > max_bonds:
            raise ValueError(f"molecule with {mol.num_bonds} bonds exceeds capacity {max_bonds}")
        inv0[b, :na] = atom_invariants(arrays, use_chirality)
        atom_mask[b, :na] = True
        degree[b, :na] = arrays["degree"]
        ab = arrays["adj_bonds"]
        aa = arrays["adj_atoms"]
        bt = arrays["bond_type"]
        for i in range(na):
            for k in range(K):
                bi = ab[i, k]
                if bi < 0:
                    break
                adj_atoms[b, i, k] = aa[i, k]
                adj_code[b, i, k] = bt[bi]
                adj_mask[b, i, k] = True
                own_bits[b, i, bi // 32] |= np.uint32(1) << np.uint32(bi % 32)

    return {
        "inv0": inv0,
        "adj_atoms": adj_atoms,
        "adj_code": adj_code,
        "adj_mask": adj_mask,
        "own_bits": own_bits,
        "atom_mask": atom_mask,
        "degree": degree,
    }


def _set_bits(fp: jnp.ndarray, bit: jnp.ndarray, active: jnp.ndarray) -> jnp.ndarray:
    """OR one bit per active atom into packed fp words.

    fp: [B, fpW] uint32; bit: [B, A] int32; active: [B, A] bool.
    """
    fp_words = fp.shape[-1]
    word = bit // 32                      # [B, A]
    sub = (bit % 32).astype(_U32)
    val = jnp.where(active, _U32(1) << sub, _U32(0))  # [B, A]
    word_iota = jnp.arange(fp_words, dtype=jnp.int32)
    onehot = jnp.where(word[..., None] == word_iota, val[..., None], _U32(0))  # [B, A, fpW]
    contrib = jax.lax.reduce(
        onehot, _U32(0), lambda a, b: jax.lax.bitwise_or(a, b), (1,)
    )
    return fp | contrib


@functools.partial(jax.jit, static_argnames=("radius", "fp_size"))
def morgan_kernel(
    inv0: jnp.ndarray,       # [B, A] uint32
    adj_atoms: jnp.ndarray,  # [B, A, K] int32
    adj_code: jnp.ndarray,   # [B, A, K] uint32
    adj_mask: jnp.ndarray,   # [B, A, K] bool
    own_bits: jnp.ndarray,   # [B, A, W] uint32
    atom_mask: jnp.ndarray,  # [B, A] bool
    degree: jnp.ndarray,     # [B, A] int32
    *,
    radius: int,
    fp_size: int,
) -> jnp.ndarray:
    # upcast the narrow transfer dtypes (see native.morgan_batches_from_smiles)
    adj_atoms = adj_atoms.astype(jnp.int32)
    adj_code = adj_code.astype(jnp.uint32)
    degree = degree.astype(jnp.int32)
    B, A, K = adj_atoms.shape
    W = own_bits.shape[-1]
    fp_words = fp_size // 32

    fp = jnp.zeros((B, fp_words), dtype=_U32)
    # round 0: every real atom sets bit inv % fp_size
    fp = _set_bits(fp, (inv0 % np.uint32(fp_size)).astype(jnp.int32), atom_mask)

    inv = inv0
    nbr = jnp.zeros((B, A, W), dtype=_U32)
    alive = atom_mask & (degree > 0)
    # accepted neighborhoods from previous rounds
    seen_bits = jnp.zeros((B, radius, A, W), dtype=_U32)
    seen_mask = jnp.zeros((B, radius, A), dtype=bool)

    atom_iota = jnp.arange(A, dtype=jnp.int32)
    slot_iota = jnp.arange(K, dtype=jnp.int32)

    # One-hot neighbor selection (built once; adjacency is round-
    # invariant). uint32 payloads split into exact 16-bit halves so the
    # f32 one-hot contraction is lossless — elementwise dynamic-index
    # gathers serialize on TPU (a [B, A, K, W] take_along_axis measured
    # 25 ms per 8192-mol chunk per round).
    adj_oh = jax.nn.one_hot(adj_atoms, A, dtype=jnp.bfloat16)  # [B,A,K,A]

    def sel_u32(x):
        hi = (x >> 16).astype(jnp.float32)
        lo = (x & _U32(0xFFFF)).astype(jnp.float32)
        if x.ndim == 2:   # [B, A] -> [B, A, K]
            h = jnp.einsum("bika,ba->bik", adj_oh, hi,
                           preferred_element_type=jnp.float32)
            l = jnp.einsum("bika,ba->bik", adj_oh, lo,
                           preferred_element_type=jnp.float32)
        else:             # [B, A, W] -> [B, A, K, W]
            h = jnp.einsum("bika,baw->bikw", adj_oh, hi,
                           preferred_element_type=jnp.float32)
            l = jnp.einsum("bika,baw->bikw", adj_oh, lo,
                           preferred_element_type=jnp.float32)
        return (h.astype(_U32) << 16) | l.astype(_U32)

    for rnd in range(1, radius + 1):
        # neighbor invariants: [B, A, K]
        nbr_inv = sel_u32(inv)

        # sort (code, inv) pairs; invalid slots pushed last via max code
        code_key = jnp.where(adj_mask, adj_code, _U32(0xFFFFFFFF))
        inv_key = jnp.where(adj_mask, nbr_inv, _U32(0xFFFFFFFF))
        code_s, inv_s = jax.lax.sort((code_key, inv_key), dimension=2, num_keys=2)

        # hash chain: seed = hc(hc(0, rnd), inv); then pairs in sorted order
        seed = hash_combine_u32(jnp.zeros((B, A), dtype=_U32), jnp.full((B, A), rnd, dtype=_U32), xp=jnp)
        seed = hash_combine_u32(seed, inv, xp=jnp)
        for k in range(K):
            valid = slot_iota[k] < degree  # [B, A]
            s2 = hash_combine_u32(seed, code_s[:, :, k], xp=jnp)
            s2 = hash_combine_u32(s2, inv_s[:, :, k], xp=jnp)
            seed = jnp.where(valid, s2, seed)
        next_inv = jnp.where(atom_mask & (degree > 0), seed, inv)

        # grow neighborhoods: own bonds | prev self | prev of neighbors
        nbr_gather = jnp.where(adj_mask[..., None], sel_u32(nbr), _U32(0))
        union = jax.lax.reduce(
            nbr_gather, _U32(0), lambda a, b: jax.lax.bitwise_or(a, b), (2,)
        )
        nbr_new = nbr | own_bits | union  # [B, A, W]

        # same-round duplicate detection: eq over all word pairs
        eq = jnp.all(nbr_new[:, :, None, :] == nbr_new[:, None, :, :], axis=-1)  # [B, i, j]
        key_lt = (next_inv[:, None, :] < next_inv[:, :, None]) | (
            (next_inv[:, None, :] == next_inv[:, :, None]) & (atom_iota[None, :] < atom_iota[:, None])
        )  # [B, i, j] : atom j precedes atom i in (inv, idx) order
        killer = eq & key_lt & alive[:, None, :] & alive[:, :, None]
        dead_same_round = jnp.any(killer, axis=2)  # [B, A]

        # previous-round duplicate detection
        prev_eq = jnp.all(
            nbr_new[:, None, None, :, :] == seen_bits[:, :, :, None, :], axis=-1
        )  # [B, R, Aprev, A]
        prev_eq = prev_eq & seen_mask[:, :, :, None]
        dead_prev = jnp.any(prev_eq, axis=(1, 2))  # [B, A]

        newly_dead = alive & (dead_same_round | dead_prev)
        survivors = alive & ~newly_dead

        fp = _set_bits(fp, (next_inv % np.uint32(fp_size)).astype(jnp.int32), survivors)

        seen_bits = seen_bits.at[:, rnd - 1].set(nbr_new)
        seen_mask = seen_mask.at[:, rnd - 1].set(survivors)
        alive = alive & ~newly_dead
        inv = next_inv
        nbr = nbr_new

    return fp


def morgan_fingerprints_jax(
    mols: list[Mol], radius: int, fp_size: int, max_atoms: int,
    use_chirality: bool = False,
) -> jax.Array:
    """Fingerprints for a homogeneous bucket of molecules (<= max_atoms).

    The batch is zero-padded up to a power of two so steady-state calls
    reuse compiled kernels instead of compiling one per batch size."""
    from nvmolkit_tpu.fingerprints import _chunk_pad, _pad_rows

    batch = prepare_batch(mols, max_atoms, use_chirality)
    pad = _chunk_pad(len(mols))
    fps = morgan_kernel(
        *(
            _pad_rows(batch[k], pad)
            for k in (
                "inv0", "adj_atoms", "adj_code", "adj_mask",
                "own_bits", "atom_mask", "degree",
            )
        ),
        radius=radius,
        fp_size=fp_size,
    )
    return fps[: len(mols)]
