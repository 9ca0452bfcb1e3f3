"""Judged-scale smoke tests, gated behind NVMOLKIT_SCALE_TESTS=1
(minutes-long on the CPU mesh; exercised routinely on the real chip by
bench.py). The 100k fused-Butina configuration is BASELINE.md's judged
workload; CI runs this tier on every push at a reduced size
(NVMOLKIT_SCALE_N=25000 in ci.yml's scale job) so the judged-scale code
paths execute routinely, with the full size used when the variable is
unset."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("NVMOLKIT_SCALE_TESTS") != "1",
    reason="set NVMOLKIT_SCALE_TESTS=1 to run judged-scale tests",
)

# full judged size by default; CI overrides to 25k for wall-clock
SCALE_N = int(os.environ.get("NVMOLKIT_SCALE_N", "100000"))


def test_fused_butina_scale_clustered():
    import jax.numpy as jnp

    from bench import make_clustered_fingerprints
    from nvmolkit_tpu.clustering import fused_butina

    # centers scale with N to keep cluster geometry comparable
    n_centers = max(50, SCALE_N // 50)
    fps = jnp.asarray(
        make_clustered_fingerprints(SCALE_N, 2048, n_centers=n_centers)
    )
    clusters, sizes = fused_butina(fps, cutoff=0.6)
    assert sum(sizes) == SCALE_N
    # drawn around n_centers centers: the clustering must recover that scale
    assert 0.75 * n_centers <= len(clusters) <= 1.3 * n_centers


def test_butina_matrix_vs_fused_10k():
    import jax.numpy as jnp

    from bench import make_clustered_fingerprints
    from nvmolkit_tpu.clustering import butina, fused_butina
    from nvmolkit_tpu.ops.similarity import cross_similarity

    n = min(10_000, SCALE_N)
    fps = jnp.asarray(
        make_clustered_fingerprints(n, 2048, n_centers=max(30, n // 33))
    )
    sim = cross_similarity(fps, fps)
    ids = butina(1.0 - sim, cutoff=0.6)
    n_matrix = int(np.asarray(ids.numpy()).max()) + 1
    clusters, _ = fused_butina(fps, cutoff=0.6)
    assert abs(len(clusters) - n_matrix) <= max(3, n_matrix // 50)
