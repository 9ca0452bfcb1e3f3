"""Headline benchmark: cross-Tanimoto similarity throughput (pairs/sec/chip).

Target (BASELINE.md): >= 1e9 Tanimoto pairs/sec/chip on TPU, computed over
packed 2048-bit Morgan-style fingerprints — the reference's tensor-core
BMMA headline workload (``src/similarity_kernels.cu:33``), rebuilt as an
MXU bits-matmul.

Prints exactly one JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from nvmolkit_tpu.ops.similarity import cross_similarity

BASELINE_PAIRS_PER_SEC = 1e9
FP_BITS = 2048
N = 16384
M = 16384


def make_fingerprints(n: int, bits: int, mean_on: int = 64, seed: int = 0) -> np.ndarray:
    """Random packed fingerprints with Morgan-like density (~mean_on bits)."""
    rng = np.random.default_rng(seed)
    dense = rng.random((n, bits)) < (mean_on / bits)
    from nvmolkit_tpu.ops.packed_bits import pack_bits_np

    return pack_bits_np(dense.astype(np.uint8))


def main() -> None:
    fps_a = jnp.asarray(make_fingerprints(N, FP_BITS, seed=0))
    fps_b = jnp.asarray(make_fingerprints(M, FP_BITS, seed=1))

    # A scalar checksum keeps the host<->device transfer out of the timing
    # while forcing the full similarity matrix to be computed. Multiple
    # enqueued iterations amortize the dispatch/tunnel round-trip latency
    # (~30 ms on the axon-tunneled chip used in CI).
    @jax.jit
    def sim_checksum(a, b):
        return jnp.sum(cross_similarity(a, b, metric="tanimoto"))

    float(sim_checksum(fps_a, fps_b))  # compile + warm-up

    # Three measurement batches, best one wins: the tunneled CI chip
    # occasionally stalls for tens of seconds, which would otherwise
    # poison a single measurement.
    reps = 20
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        vals = [sim_checksum(fps_a, fps_b) for _ in range(reps)]
        float(vals[-1])  # one sync; all reps executed on device
        best = min(best, time.perf_counter() - t0)

    pairs_per_sec = (N * M * reps) / best
    print(
        json.dumps(
            {
                "metric": "tanimoto_cross_similarity",
                "value": pairs_per_sec,
                "unit": "pairs/sec/chip",
                "vs_baseline": pairs_per_sec / BASELINE_PAIRS_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
