"""Judged-scale smoke tests, gated behind NVMOLKIT_SCALE_TESTS=1
(minutes-long on the CPU mesh; exercised routinely on the real chip by
bench.py). The 100k fused-Butina configuration is BASELINE.md's judged
workload."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("NVMOLKIT_SCALE_TESTS") != "1",
    reason="set NVMOLKIT_SCALE_TESTS=1 to run judged-scale tests",
)


def test_fused_butina_100k_clustered():
    import jax.numpy as jnp

    from bench import make_clustered_fingerprints
    from nvmolkit_tpu.clustering import fused_butina

    fps = jnp.asarray(make_clustered_fingerprints(100_000, 2048))
    clusters, sizes = fused_butina(fps, cutoff=0.6)
    assert sum(sizes) == 100_000
    # drawn around 2000 centers: the clustering must recover that scale
    assert 1500 <= len(clusters) <= 2600


def test_butina_matrix_vs_fused_10k():
    import jax.numpy as jnp

    from bench import make_clustered_fingerprints
    from nvmolkit_tpu.clustering import butina, fused_butina
    from nvmolkit_tpu.ops.similarity import cross_similarity

    fps = jnp.asarray(make_clustered_fingerprints(10_000, 2048, n_centers=300))
    sim = cross_similarity(fps, fps)
    ids = butina(1.0 - sim, cutoff=0.6)
    n_matrix = int(np.asarray(ids.numpy()).max()) + 1
    clusters, _ = fused_butina(fps, cutoff=0.6)
    assert abs(len(clusters) - n_matrix) <= max(3, n_matrix // 50)
