"""Batch Morgan fingerprints — public API.

Mirrors the reference's ``nvmolkit/fingerprints.py:25-108``:
``MorganFingerprintGenerator(radius, fpSize).GetFingerprints(mols)``
returns packed ``uint32 (n, fpSize/32)`` fingerprints as an
:class:`~nvmolkit_tpu.types.AsyncResult`. Molecules are bucketed into
padded size classes (the reference's 32/64/128-atom kernels,
``src/morgan_fingerprint_kernels.h:46-92``) and each bucket runs one
jitted batched kernel.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from nvmolkit_tpu.chem.mol import Mol
from nvmolkit_tpu.ops.morgan import morgan_fingerprints_jax
from nvmolkit_tpu.ops.morgan_cpu import morgan_fingerprint_cpu
from nvmolkit_tpu.ops.packed_bits import pack_bits_np, unpack_bits_np
from nvmolkit_tpu.types import AsyncResult, check_stream_arg
from nvmolkit_tpu.utils.config import HardwareOptions

_SUPPORTED_FP_SIZES = (128, 256, 512, 1024, 2048, 4096)

# Molecules per kernel dispatch: bounds the Morgan kernel's transient
# dedup tensors ([B, A, A, W] comparisons) on large batches while
# keeping each dispatch big enough to saturate the chip.
_MORGAN_CHUNK = 8192


def _chunk_pad(n: int) -> int:
    """Round a chunk size up to a power of two (min 256, max the chunk
    cap): tail chunks would otherwise compile a fresh kernel per batch
    size, putting 20-40s of XLA compilation into steady-state calls."""
    p = 256
    while p < n:
        p <<= 1
    return min(p, _MORGAN_CHUNK)


def _pad_host(x, target: int) -> np.ndarray:
    """Zero-pad the leading axis to ``target`` rows (host side)."""
    if x.shape[0] != target:
        pad = np.zeros((target - x.shape[0],) + x.shape[1:], dtype=x.dtype)
        x = np.concatenate([x, pad], axis=0)
    return np.asarray(x)


def _put_batch(arrays: tuple, devices=None) -> tuple:
    """Move a tuple of host arrays to device in ONE device_put call
    (jax batches pytree transfers; per-array puts each pay a tunnel
    round trip). Multi-device: rows shard over the 'mols' mesh axis."""
    import jax

    if devices is not None and len(devices) > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from nvmolkit_tpu.parallel.mesh import MOL_AXIS, data_parallel_mesh

        mesh = data_parallel_mesh(devices)
        return jax.device_put(
            arrays,
            tuple(
                NamedSharding(mesh, P(MOL_AXIS, *([None] * (a.ndim - 1))))
                for a in arrays
            ),
        )
    return jax.device_put(arrays)


def _pad_rows(x, target: int, devices=None):
    """Zero-pad the leading axis to ``target`` rows and move to device(s).

    With multiple devices the rows are sharded over the 'mols' mesh axis
    (power-of-two padding keeps the axis divisible by any 2^k mesh)."""
    if x.shape[0] != target:
        pad = np.zeros((target - x.shape[0],) + x.shape[1:], dtype=x.dtype)
        x = np.concatenate([x, pad], axis=0)
    if devices is not None and len(devices) > 1:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from nvmolkit_tpu.parallel.mesh import MOL_AXIS, data_parallel_mesh

        mesh = data_parallel_mesh(devices)
        spec = P(MOL_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(np.asarray(x), NamedSharding(mesh, spec))
    return jnp.asarray(x)


def unpack_fingerprint(fp) -> np.ndarray:
    """Packed uint32 words -> 0/1 uint8 bits (last axis expanded x32)."""
    return unpack_bits_np(np.asarray(fp))


def pack_fingerprint(fp) -> np.ndarray:
    """0/1 bits -> packed uint32 words (last axis contracted /32)."""
    return pack_bits_np(np.asarray(fp))


class MorganFingerprintGenerator:
    """RDKit-style Morgan fingerprint generator with batched TPU backend.

    Parameters mirror the reference (``src/morgan_fingerprint.h:31-60``):
    ``radius`` and ``fpSize`` (one of 128..4096, a multiple of 32).
    """

    def __init__(self, radius: int, fpSize: int, useChirality: bool = False):
        if fpSize not in _SUPPORTED_FP_SIZES:
            raise ValueError(f"fpSize must be one of {_SUPPORTED_FP_SIZES}, got {fpSize}")
        if radius < 0:
            raise ValueError(f"radius must be >= 0, got {radius}")
        self.radius = radius
        self.fpSize = fpSize
        self.useChirality = useChirality

    def GetFingerprint(self, mol: Mol) -> np.ndarray:
        """Single-molecule CPU fingerprint (reference backend)."""
        return morgan_fingerprint_cpu(mol, self.radius, self.fpSize, self.useChirality)

    def GetFingerprintsCpu(self, mols: list[Mol]) -> np.ndarray:
        return np.stack([self.GetFingerprint(m) for m in mols])

    def GetFingerprints(
        self,
        mols: list[Mol],
        num_threads: int = 0,
        hardwareOptions: HardwareOptions | None = None,
        stream=None,
    ) -> AsyncResult:
        """Batched accelerator fingerprints, rows in input order.

        ``num_threads`` only affects host featurization, which on this
        path runs on Python ``Mol`` objects (GIL-bound — threading would
        not speed it up); ``GetFingerprintsFromSmiles`` honors it for
        real in the native C++ featurizer."""
        check_stream_arg(stream)
        del num_threads
        opts = hardwareOptions or HardwareOptions()
        buckets = opts.atomBuckets
        order: dict[int, list[int]] = {}
        fallback: list[int] = []
        for idx, mol in enumerate(mols):
            na = mol.num_atoms
            if na > buckets[-1] or any(mol.degree(i) > 8 for i in range(na)):
                # beyond accelerator limits (>largest bucket atoms or >8
                # bonds/atom): CPU fallback, the reference's RDKit-CPU
                # drain (nvmolkit/fingerprints.py:83)
                fallback.append(idx)
                continue
            for b in buckets:
                if na <= b:
                    order.setdefault(b, []).append(idx)
                    break

        # independent chunk kernels + one concat/gather (see
        # GetFingerprintsFromSmiles: a shared scatter-assembled output
        # buffer serializes the chunks by data dependency)
        chunk_idx: list[np.ndarray] = [np.zeros(0, np.int64)]
        chunk_fps: list[jnp.ndarray] = [
            jnp.zeros((0, self.fpSize // 32), dtype=jnp.uint32)
        ]
        for bucket, indices in sorted(order.items()):
            for start in range(0, len(indices), _MORGAN_CHUNK):
                chunk = indices[start : start + _MORGAN_CHUNK]
                fps = morgan_fingerprints_jax(
                    [mols[i] for i in chunk], self.radius, self.fpSize, bucket,
                    use_chirality=self.useChirality,
                )
                chunk_idx.append(np.asarray(chunk, np.int64))
                chunk_fps.append(fps)
        all_idx = np.concatenate(chunk_idx + [np.asarray(fallback, np.int64)])
        inv = np.empty(len(mols), np.int64)
        inv[all_idx.astype(np.int64)] = np.arange(len(all_idx))
        if fallback:
            from nvmolkit_tpu.ops.morgan_cpu import morgan_fingerprint_cpu_unbounded

            rows = np.stack(
                [
                    morgan_fingerprint_cpu_unbounded(
                        mols[i], self.radius, self.fpSize, self.useChirality
                    )
                    for i in fallback
                ]
            )
            chunk_fps.append(jnp.asarray(rows))
        out = jnp.concatenate(chunk_fps, axis=0)[jnp.asarray(inv)]
        return AsyncResult(out)

    def GetFingerprintsFromSmiles(
        self,
        smiles: list[str],
        num_threads: int = 0,
        hardwareOptions: HardwareOptions | None = None,
    ) -> AsyncResult:
        """Fast path: SMILES parsed + featurized by the native C++
        compiler (zero Python molecule objects), then the batched TPU
        kernel. Falls back to ``GetFingerprints`` when the native library
        is unavailable."""
        from nvmolkit_tpu.chem.native import morgan_batches_from_smiles, native_available

        opts = hardwareOptions or HardwareOptions()
        if not native_available():
            from nvmolkit_tpu.chem.smiles import mol_from_smiles

            return self.GetFingerprints(
                [mol_from_smiles(s) for s in smiles], hardwareOptions=opts
            )
        from nvmolkit_tpu.ops.morgan import morgan_kernel

        from nvmolkit_tpu.parallel.distributed import resolve_devices

        devices = resolve_devices(opts.deviceIds) if opts.deviceIds else None
        # every chunk kernel is dispatched independently (no shared
        # output buffer: scatter-assembling chunks into one array chains
        # them by data dependency — measured 3x the kernel time); one
        # concatenate + row gather reorders at the end.
        #
        # Featurization is SLICED so the (host, 1-core) C++ featurizer
        # overlaps the in-flight device kernels: featurize slice 1,
        # dispatch it (async), featurize slice 2 while the device chews
        # on slice 1, ... Serializing all featurization before the first
        # dispatch left the device idle for the full featurize time
        # (~1/3 of e2e wall at 10k mols, round-4 profiling).
        chunk_idx: list[np.ndarray] = []
        chunk_fps: list[jnp.ndarray] = []
        slice_len = max(2048, _MORGAN_CHUNK // 4) if len(smiles) > 4096 else len(smiles)
        for s0 in range(0, len(smiles), max(1, slice_len)):
            sub = smiles[s0 : s0 + slice_len]
            batches = morgan_batches_from_smiles(
                sub, opts.atomBuckets, n_threads=num_threads,
                use_chirality=self.useChirality,
            )
            for bucket, (indices, b) in sorted(batches.items()):
                for start in range(0, len(indices), _MORGAN_CHUNK):
                    sl = slice(start, start + _MORGAN_CHUNK)
                    n = len(indices[sl])
                    pad = _chunk_pad(n)
                    # ONE transfer for all 7 feature arrays: each
                    # device_put pays a full tunnel round trip, and
                    # per-array puts dominated e2e wall (round-4)
                    args = _put_batch(
                        tuple(
                            _pad_host(b[k][sl], pad)
                            for k in (
                                "inv0", "adj_atoms", "adj_code", "adj_mask",
                                "own_bits", "atom_mask", "degree",
                            )
                        ),
                        devices,
                    )
                    fps = morgan_kernel(
                        *args, radius=self.radius, fp_size=self.fpSize
                    )
                    # start the device->host copy NOW: each chunk's
                    # result streams back while later chunks featurize
                    # and compute, so the final fetch only drains the
                    # last chunk instead of the whole output (the
                    # tunnel's ~2.5 MB result was ~40% of e2e wall)
                    try:
                        fps.copy_to_host_async()
                    except Exception:
                        pass  # backends without async host copies
                    chunk_idx.append(indices[sl] + s0)
                    chunk_fps.append((fps, n))
        all_idx = np.concatenate(chunk_idx)
        inv = np.empty(len(smiles), np.int64)
        inv[all_idx] = np.arange(len(all_idx))
        # bucket-order -> input-order reordering happens lazily at
        # materialization: a device row gather of the full output is
        # ~half the kernel time on TPU (round-4 profiling), while the
        # same permutation on the fetched host array is ~free. Chunks
        # stay separate (not device-concatenated) so the async per-chunk
        # host copies above are what materialization consumes.
        return _ChunkedRowResult(chunk_fps, inv)


class _ChunkedRowResult(AsyncResult):
    """AsyncResult over per-chunk device arrays (pad rows still
    attached) plus a final row permutation. ``numpy()`` drains the
    in-flight async host copies, trims pads, concatenates and reorders
    on the host (~free); ``jax()`` concatenates/gathers on device only
    if actually requested."""

    def __init__(self, chunks, order):
        super().__init__(None)
        self._chunks = chunks          # [(device_array, n_valid)]
        self._order = order

    def numpy(self) -> np.ndarray:
        if self._chunks is not None:
            parts = [np.asarray(c)[:n] for c, n in self._chunks]
            out = np.concatenate(parts, axis=0)
            out = np.ascontiguousarray(out[self._order])
            self._array = out
            self._chunks = None
            self._order = None
        return super().numpy()

    def jax(self):
        import jax.numpy as _jnp

        if self._chunks is not None:
            arr = _jnp.concatenate(
                [c[:n] for c, n in self._chunks], axis=0
            )[_jnp.asarray(self._order)]
            self._array = arr
            self._chunks = None
            self._order = None
        return super().jax()

    def block_until_ready(self):
        if self._chunks is not None:
            self.numpy()
        return super().block_until_ready()


class _RowOrderedResult(AsyncResult):
    """AsyncResult whose rows need a final permutation, applied on the
    host at ``.numpy()`` (free) or on device only if ``.jax()`` is
    actually requested."""

    def __init__(self, array, order):
        super().__init__(array)
        self._order = order

    def numpy(self) -> np.ndarray:
        out = super().numpy()
        if self._order is not None:
            out = np.ascontiguousarray(out[self._order])
            self._array = out
            self._order = None
        return out

    def jax(self):
        arr = super().jax()
        if self._order is not None:
            arr = arr[jnp.asarray(self._order)]
            self._array = arr
            self._order = None
        return arr
