"""Batched eigensolver benchmark (the reference's
``benchmarks/eigen_solver_bench.cu`` role): metric-matrix projection is
the coordinate-generation hot spot."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from _common import emit  # noqa: E402

import numpy as np  # noqa: E402


def main(n_systems: int = 2048, n_atoms: int = 32, reps: int = 10):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    a = rng.standard_normal((n_systems, n_atoms, n_atoms)).astype(np.float32)
    sym = jnp.asarray(a + a.transpose(0, 2, 1))

    @jax.jit
    def solve(m):
        w, v = jnp.linalg.eigh(m)
        return w.sum() + v.sum()

    float(solve(sym))  # compile
    t0 = time.perf_counter()
    vals = [solve(sym) for _ in range(reps)]
    float(vals[-1])
    dt = (time.perf_counter() - t0) / reps
    emit("batched_eigh", n_systems / dt, "systems/sec",
         n_systems=n_systems, n_atoms=n_atoms)


if __name__ == "__main__":
    args = sys.argv[1:]
    main(int(args[0]) if args else 2048, int(args[1]) if len(args) > 1 else 32)
