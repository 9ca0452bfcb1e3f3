"""Generator-driven property-based differential tests.

The reference's test mass comes largely from sweeping real datasets
through independent implementations (RDKit vs GPU kernels,
``tests/test_substruct_search.cu`` 1,989 LoC, ``test_mmff.cu`` 2,105
LoC). This module plays that role without external data: a seeded
random-molecule generator (tests/molgen.py) drives hundreds of
structures through every pair of independent implementations the
package carries:

  * SMILES parsing:   Python parser  vs  native C++ compiler
  * Morgan:           TPU kernel     vs  scalar CPU oracle
  * substructure:     python / device / native engines (count agreement)
  * force fields:     batched jit energies vs scalar recomputes
  * Butina:           fused device kernel vs numpy oracle
  * bucket boundaries: every pipeline at atom counts straddling the
    padding buckets (15/16/17, 23/24/25, 31/32/33)

Each test is seeded and deterministic. Failures print the offending
SMILES so any bug becomes a one-line reproducer.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from tests.molgen import (
    random_smiles_batch,
    random_smiles_with_atoms,
)

from nvmolkit_tpu.chem.native import (
    mols_from_smiles,
    mols_from_smiles_native,
    native_available,
)
from nvmolkit_tpu.chem.smiles import mol_from_smiles

N_WILD = 120      # wild structures for parser/fingerprint sweeps
N_SANE = 60       # used where chemistry must be processable end-to-end


@pytest.fixture(scope="module")
def wild_smiles():
    return random_smiles_batch(101, N_WILD)


@pytest.fixture(scope="module")
def sane_smiles():
    """Structures that embed + parametrize cleanly: generated wild, then
    filtered through UFF typing (the FF stack's entrance check)."""
    from nvmolkit_tpu.models.uff.params import uff_atom_type

    out = []
    seed = 0
    while len(out) < N_SANE and seed < 40:
        seed += 1
        for smi in random_smiles_batch(200 + seed, 40):
            try:
                m = mol_from_smiles(smi)
                for i in range(m.num_atoms):
                    uff_atom_type(m, i)
            except Exception:
                continue
            out.append(smi)
            if len(out) >= N_SANE:
                break
    assert len(out) >= 32
    return out


# ---------------------------------------------------------------------------
# 1. parser differential: Python vs native C++
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
class TestParserAgreement:
    def test_atom_and_bond_tables_agree(self, wild_smiles):
        native = mols_from_smiles_native(wild_smiles, strict=False)
        for smi, nm in zip(wild_smiles, native):
            pm = mol_from_smiles(smi)
            assert nm is not None, f"native rejected {smi!r} that python accepts"
            assert nm.num_atoms == pm.num_atoms, smi
            assert nm.num_bonds == pm.num_bonds, smi
            for i, (a, b) in enumerate(zip(nm.atoms, pm.atoms)):
                assert (
                    a.atomic_num, a.formal_charge, a.is_aromatic,
                    a.in_ring, a.total_hs, a.min_ring_size,
                ) == (
                    b.atomic_num, b.formal_charge, b.is_aromatic,
                    b.in_ring, b.total_hs, b.min_ring_size,
                ), (smi, i)
            nb = {(min(x.begin, x.end), max(x.begin, x.end), x.bond_type)
                  for x in nm.bonds}
            pb = {(min(x.begin, x.end), max(x.begin, x.end), x.bond_type)
                  for x in pm.bonds}
            assert nb == pb, smi

    def test_neighbor_order_agrees(self, wild_smiles):
        """Bond insertion order drives neighbor lists, which downstream
        code (bounds builder, typing) iterates — the two parsers must
        produce identical orderings."""
        native = mols_from_smiles_native(wild_smiles[:40], strict=False)
        for smi, nm in zip(wild_smiles[:40], native):
            pm = mol_from_smiles(smi)
            for i in range(pm.num_atoms):
                assert nm.neighbors(i) == pm.neighbors(i), (smi, i)


# ---------------------------------------------------------------------------
# 2. Morgan: device kernel vs scalar CPU oracle
# ---------------------------------------------------------------------------

class TestMorganDifferential:
    @pytest.mark.parametrize("radius,fp_size", [(2, 1024), (3, 2048)])
    def test_random_structures_bit_exact(self, wild_smiles, radius, fp_size):
        from nvmolkit_tpu.fingerprints import MorganFingerprintGenerator
        from nvmolkit_tpu.ops.morgan_cpu import morgan_fingerprint_cpu

        mols = [mol_from_smiles(s) for s in wild_smiles[:48]]
        gen = MorganFingerprintGenerator(radius=radius, fpSize=fp_size)
        fps = gen.GetFingerprints(mols).numpy()
        for k, (m, smi) in enumerate(zip(mols, wild_smiles)):
            ref = morgan_fingerprint_cpu(m, radius=radius, fp_size=fp_size)
            assert np.array_equal(fps[k], ref), smi

    def test_bucket_boundaries_bit_exact(self):
        from nvmolkit_tpu.fingerprints import MorganFingerprintGenerator
        from nvmolkit_tpu.ops.morgan_cpu import morgan_fingerprint_cpu

        sizes = [15, 16, 17, 23, 24, 25, 31, 32, 33]
        smis = [random_smiles_with_atoms(900 + i, n) for i, n in enumerate(sizes)]
        mols = [mol_from_smiles(s) for s in smis]
        assert [m.num_atoms for m in mols] == sizes
        gen = MorganFingerprintGenerator(radius=3, fpSize=2048)
        fps = gen.GetFingerprints(mols).numpy()
        for k, m in enumerate(mols):
            ref = morgan_fingerprint_cpu(m, radius=3, fp_size=2048)
            assert np.array_equal(fps[k], ref), (smis[k], sizes[k])

    def test_smiles_fast_path_matches_mol_path(self, wild_smiles):
        """GetFingerprintsFromSmiles (native featurizer) must equal
        GetFingerprints (Python Mol path) bit for bit."""
        if not native_available():
            pytest.skip("native lib unavailable")
        from nvmolkit_tpu.fingerprints import MorganFingerprintGenerator

        gen = MorganFingerprintGenerator(radius=3, fpSize=2048)
        sub = wild_smiles[:48]
        via_smiles = gen.GetFingerprintsFromSmiles(sub).numpy()
        via_mols = gen.GetFingerprints(
            [mol_from_smiles(s) for s in sub]
        ).numpy()
        for k, smi in enumerate(sub):
            assert np.array_equal(via_smiles[k], via_mols[k]), smi


# ---------------------------------------------------------------------------
# 3. substructure: three engines agree on counts
# ---------------------------------------------------------------------------

QUERY_SET = [
    "C", "CC", "CCO", "C=O", "C~C~C", "[R]", "[!R]", "c1ccccc1",
    "[NX3]", "[OX2H1]", "[$(CO)]", "[NX3;!$(NC=O)]", "[r5]",
    "[#6;!R]", "C(F)", "[c;$(c1ccccc1)]",
]


class TestSubstructEngineAgreement:
    def test_three_engine_counts_agree(self, wild_smiles):
        from nvmolkit_tpu.substructure import (
            SubstructSearchConfig,
            countSubstructMatches,
        )

        targets = [mol_from_smiles(s) for s in wild_smiles[:40]]
        ref = None
        engines = {
            "python": SubstructSearchConfig(
                useDeviceEngine=False, useNativeEngine=False
            ),
            "native": SubstructSearchConfig(useDeviceEngine=False),
            "device": SubstructSearchConfig(useDeviceEngine=True),
        }
        for name, cfg in engines.items():
            counts = np.asarray(countSubstructMatches(targets, QUERY_SET, cfg))
            if ref is None:
                ref = counts
            else:
                bad = np.argwhere(counts != ref)
                assert counts.shape == ref.shape
                assert not len(bad), (
                    name,
                    [(wild_smiles[t], QUERY_SET[q], int(ref[t, q]),
                      int(counts[t, q])) for t, q in bad[:5]],
                )

    def test_self_path_queries_match(self, sane_smiles):
        """Every molecule must match a SMARTS spelled from one of its
        own linear paths (guaranteed-positive adversarial cases)."""
        from nvmolkit_tpu.substructure import (
            SubstructSearchConfig,
            countSubstructMatches,
        )

        rng = np.random.default_rng(5)
        targets, queries = [], []
        for smi in sane_smiles[:24]:
            m = mol_from_smiles(smi)
            # random 3-atom path -> element SMARTS like [#6]~[#8]~[#6]
            start = int(rng.integers(m.num_atoms))
            path = [start]
            while len(path) < 3:
                nbrs = [x for x in m.neighbors(path[-1]) if x not in path]
                if not nbrs:
                    break
                path.append(int(rng.choice(nbrs)))
            if len(path) < 2:
                continue
            q = "~".join(f"[#{m.atoms[i].atomic_num}]" for i in path)
            targets.append(m)
            queries.append(q)
        assert len(targets) >= 12
        for engine_cfg in (
            SubstructSearchConfig(useDeviceEngine=True),
            SubstructSearchConfig(useDeviceEngine=False),
        ):
            for t, (m, q) in enumerate(zip(targets, queries)):
                c = np.asarray(countSubstructMatches([m], [q], engine_cfg))
                assert c[0, 0] >= 1, (sane_smiles[t], q)


# ---------------------------------------------------------------------------
# 4. force fields: batched energies vs scalar recomputes on random
#    geometries (including bucket-boundary sizes)
# ---------------------------------------------------------------------------

def _random_positions(rng, n_atoms, spread=3.0):
    return (rng.random((n_atoms, 3)) - 0.5) * 2 * spread


def _scalar_mmff_energy(terms, pos, diel=1.0):
    """Independent scalar recompute of every MMFF term (f64)."""
    import math

    e = 0.0
    p = pos.astype(np.float64)

    def r(i, j):
        return float(np.linalg.norm(p[i] - p[j]))

    bt = terms.bonds
    for k in range(bt.n_terms):
        i, j = bt.atoms[k][:2]
        dr = r(i, j) - float(bt.params["r0"][k])
        kb = float(bt.params["kb"][k])
        e += 0.5 * 143.9325 * kb * dr * dr * (
            1.0 - 2.0 * dr + (7.0 / 12.0) * 4.0 * dr * dr
        )
    at = terms.angles
    for k in range(at.n_terms):
        i, j, l = at.atoms[k][:3]
        u, v = p[i] - p[j], p[l] - p[j]
        cos = float(
            np.dot(u, v) / (np.linalg.norm(u) * np.linalg.norm(v))
        )
        cos = max(-1.0, min(1.0, cos))
        th = math.degrees(math.acos(cos))
        dt = th - float(at.params["theta0"][k])
        ka = float(at.params["ka"][k])
        if float(at.params["is_linear"][k]) > 0.5:
            e += 143.9325 * ka * (1.0 + cos)
        else:
            e += 0.5 * 0.043844 * ka * dt * dt * (1.0 - 0.006981317 * dt)
    vt = terms.vdw
    for k in range(vt.n_terms):
        i, j = vt.atoms[k][:2]
        rr = max(r(i, j), 0.1)
        rs = float(vt.params["rstar"][k])
        eps = float(vt.params["eps"][k])
        ratio = 1.07 * rs / (rr + 0.07 * rs)
        e += eps * ratio**7 * (1.12 * rs**7 / (rr**7 + 0.12 * rs**7) - 2.0)
    et = terms.ele
    for k in range(et.n_terms):
        i, j = et.atoms[k][:2]
        qq = float(et.params["qq"][k])
        scale = 0.75 if float(et.params["is_1_4"][k]) > 0.5 else 1.0
        e += 332.0716 * qq * scale / (diel * (max(r(i, j), 0.1) + 0.05))
    return e


class TestFFRandomGeometry:
    def test_mmff_bonds_angles_nonbonded_on_random_geometry(self, sane_smiles):
        """Batched MMFF energy vs a scalar recompute, term families
        bond+angle+vdW+ele only (torsion/oop/sb scalar oracles live in
        test_bruteforce_ff.py), on RANDOM (non-physical) geometries —
        the clip floors (r^2 >= 1e-2) and mask lanes get exercised far
        outside embedded-structure ranges."""
        from nvmolkit_tpu.models.mmff import (
            MMFFProperties, make_batched_mmff, mmff_energy_and_grad,
        )
        from nvmolkit_tpu.models.mmff.providers import default_provider

        rng = np.random.default_rng(17)
        props = MMFFProperties(
            stretchBendTerm=False, oopTerm=False, torsionTerm=False
        )
        provider = default_provider()
        mols, all_pos, refs = [], [], []
        for smi in sane_smiles[:16]:
            m = mol_from_smiles(smi)
            if m.num_atoms > 32:
                continue
            try:
                terms = provider.build_terms(m, props)
            except Exception:
                continue
            pos = _random_positions(rng, m.num_atoms)
            # keep pairs off the r^2 clamp floor (0.1 A) where the
            # batched kernel and the scalar oracle legitimately differ
            d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
            np.fill_diagonal(d, 1.0)
            if d.min() < 0.35:
                continue
            mols.append(m)
            all_pos.append(pos)
            refs.append(_scalar_mmff_energy(terms, pos))
        assert len(mols) >= 6
        A = 32
        batch = make_batched_mmff(mols, A, props)
        pos_pad = np.zeros((len(mols), A, 3), np.float32)
        for k, (m, pos) in enumerate(zip(mols, all_pos)):
            pos_pad[k, : m.num_atoms] = pos
        e, g = mmff_energy_and_grad(jnp.asarray(pos_pad), batch)
        e = np.asarray(e, np.float64)
        for k in range(len(mols)):
            scale = max(1.0, abs(refs[k]))
            assert abs(e[k] - refs[k]) / scale < 5e-4, (
                mols[k], e[k], refs[k]
            )

    def test_uff_energy_finite_and_grad_consistent(self, sane_smiles):
        """UFF batched energy on random geometries: finite, and the
        autodiff gradient matches central finite differences."""
        from nvmolkit_tpu.models.uff import make_batched_uff
        from nvmolkit_tpu.models.uff.energy import uff_energy, uff_energy_and_grad

        rng = np.random.default_rng(23)
        mols = []
        for smi in sane_smiles:
            m = mol_from_smiles(smi)
            if 4 <= m.num_atoms <= 16:
                mols.append(m)
            if len(mols) >= 4:
                break
        assert len(mols) >= 2
        A = 16
        batch = make_batched_uff(mols, max_atoms=A)
        pos = np.zeros((len(mols), A, 3), np.float32)
        for k, m in enumerate(mols):
            pos[k, : m.num_atoms] = _random_positions(rng, m.num_atoms, 2.0)
        pj = jnp.asarray(pos)
        e, g = uff_energy_and_grad(pj, batch)
        assert np.isfinite(np.asarray(e)).all()
        g = np.asarray(g)
        # central differences on a few random coordinates
        h = 1e-3
        for _ in range(10):
            s = int(rng.integers(len(mols)))
            a = int(rng.integers(mols[s].num_atoms))
            d = int(rng.integers(3))
            pp, pm_ = pos.copy(), pos.copy()
            pp[s, a, d] += h
            pm_[s, a, d] -= h
            ep = float(np.asarray(uff_energy(jnp.asarray(pp), batch))[s])
            em = float(np.asarray(uff_energy(jnp.asarray(pm_), batch))[s])
            fd = (ep - em) / (2 * h)
            scale = max(1.0, abs(fd))
            assert abs(fd - g[s, a, d]) / scale < 5e-2, (s, a, d, fd, g[s, a, d])


# ---------------------------------------------------------------------------
# 5. Butina: fused kernel vs numpy oracle on odd sizes
# ---------------------------------------------------------------------------

class TestButinaProperty:
    @pytest.mark.parametrize("n", [63, 64, 65, 127, 128, 129, 200])
    def test_fused_matches_oracle_at_boundary_sizes(self, n):
        from nvmolkit_tpu.ops.butina import butina_cpu, fused_butina_kernel
        from nvmolkit_tpu.ops.packed_bits import pack_bits_np

        rng = np.random.default_rng(n)
        centers = rng.random((max(4, n // 16), 256)) < 0.25
        assign = rng.integers(0, len(centers), n)
        dense = centers[assign] ^ (rng.random((n, 256)) < 0.05)
        fps = pack_bits_np(dense.astype(np.uint8))

        # oracle hit matrix at the same threshold
        inter = (dense[:, None] & dense[None, :]).sum(-1)
        pop = dense.sum(-1)
        union = pop[:, None] + pop[None, :] - inter
        sim = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        thresh = 0.6
        ids_ref, cents_ref, k_ref = butina_cpu(sim >= thresh)

        ids, cents, k = fused_butina_kernel(jnp.asarray(fps), thresh)
        assert int(k) == k_ref, n
        np.testing.assert_array_equal(np.asarray(ids), ids_ref)
        np.testing.assert_array_equal(np.asarray(cents)[:k_ref], cents_ref)


# ---------------------------------------------------------------------------
# 6. bucket boundaries through embed + optimize
# ---------------------------------------------------------------------------

class TestBucketBoundaryPipeline:
    def test_embed_optimize_at_boundary_sizes(self):
        """Molecules straddling the 16/24/32 buckets embed and minimize
        together in one call; each system's results must be identical in
        meaning (converged, finite energy, right atom counts) to what
        the pipeline produces for that molecule alone."""
        from nvmolkit_tpu.embedMolecules import EmbedMolecules, EmbedParameters
        from nvmolkit_tpu.mmffOptimization import MMFFOptimizeMoleculesConfs

        sizes = [15, 16, 17, 23, 24, 25]
        smis = []
        for i, n in enumerate(sizes):
            smi = random_smiles_with_atoms(700 + i, n)
            # FF-typeable fallback: plain chain always types
            from nvmolkit_tpu.models.uff.params import uff_atom_type

            m = mol_from_smiles(smi)
            try:
                for j in range(m.num_atoms):
                    uff_atom_type(m, j)
            except Exception:
                smi = "C" * n
            smis.append(smi)
        mols = [mol_from_smiles(s) for s in smis]
        res = EmbedMolecules(
            mols, EmbedParameters(randomSeed=3), confsPerMolecule=2,
            maxIterations=8,
        )
        cm = np.asarray(res.conf_mask)
        assert cm.any(axis=1).sum() >= len(mols) - 1, cm
        embedded = [m for m in mols if m.conformers]
        energies, not_conv = MMFFOptimizeMoleculesConfs(embedded, maxIters=100)
        for m, es in zip(embedded, energies):
            assert np.isfinite(np.asarray(es, np.float64)).all(), (m, es)
