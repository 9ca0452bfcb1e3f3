"""ETKDG embedding pipeline tests.

Mirrors the reference's embedding validation strategy
(``testutils/conformer_checkers``: bounds satisfaction + chirality
preservation; ``test_embed_molecules.py``: conformer counts).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from nvmolkit_tpu.chem import mol_from_smiles
from nvmolkit_tpu.chem.bounds import topological_bounds
from nvmolkit_tpu.embedMolecules import (
    EmbedFailureCounts,
    EmbedMolecules,
    EmbedParameters,
)
from nvmolkit_tpu.ops.triangle_smooth import triangle_smooth_bounds


def test_triangle_smoothing_chain():
    # 3-atom chain: bounds 1-2 and 2-3 exact, 1-3 must tighten to <= sum
    upper = np.full((1, 4, 4), 1000.0, np.float32)
    lower = np.zeros((1, 4, 4), np.float32)
    for i, j, d in [(0, 1, 1.5), (1, 2, 1.5)]:
        upper[0, i, j] = upper[0, j, i] = d
        lower[0, i, j] = lower[0, j, i] = d
    np.fill_diagonal(upper[0], 0)
    mask = np.zeros((1, 4), bool)
    mask[0, :3] = True
    ub, lb, ok = triangle_smooth_bounds(
        jnp.asarray(upper), jnp.asarray(lower), jnp.asarray(mask)
    )
    assert bool(ok[0])
    assert float(ub[0, 0, 2]) == pytest.approx(3.0, abs=1e-4)
    assert float(lb[0, 0, 2]) >= 0.0


def test_triangle_smoothing_detects_inconsistency():
    upper = np.full((1, 3, 3), 1000.0, np.float32)
    lower = np.zeros((1, 3, 3), np.float32)
    # 1-2 and 2-3 short, but 1-3 lower bound huge -> inconsistent
    for i, j, d in [(0, 1, 1.0), (1, 2, 1.0)]:
        upper[0, i, j] = upper[0, j, i] = d
        lower[0, i, j] = lower[0, j, i] = d
    lower[0, 0, 2] = lower[0, 2, 0] = 10.0
    np.fill_diagonal(upper[0], 0)
    mask = np.ones((1, 3), bool)
    _, _, ok = triangle_smooth_bounds(
        jnp.asarray(upper), jnp.asarray(lower), jnp.asarray(mask)
    )
    assert not bool(ok[0])


def test_bounds_matrix_sane():
    m = mol_from_smiles("CCO")
    u, l = topological_bounds(m)
    assert u.shape == (3, 3)
    # 1-2 bounds bracket the natural bond length ~1.4-1.5
    assert 1.3 < l[0, 1] < u[0, 1] < 1.7
    # 1-3 wider than 1-2
    assert u[0, 2] > u[0, 1]
    assert (l <= u + 1e-6).all()


def _bond_length_errors(m, pos):
    from nvmolkit_tpu.models.uff.builder import build_uff_terms

    terms = build_uff_terms(m)
    errs = []
    for t in range(terms.bonds.n_terms):
        i, j = terms.bonds.atoms[t]
        r = np.linalg.norm(pos[i] - pos[j])
        errs.append(abs(r - terms.bonds.params["r0"][t]))
    return np.asarray(errs)


@pytest.mark.parametrize("smiles", ["CCO", "CCCC", "c1ccccc1", "CC(C)CO"])
def test_embed_single_molecules(smiles):
    m = mol_from_smiles(smiles)
    res = EmbedMolecules([m], confsPerMolecule=2, maxIterations=15)
    cm = np.asarray(res.conf_mask)
    assert cm.sum() >= 1, f"no conformer embedded for {smiles}"
    assert len(m.conformers) == cm.sum()
    # embedded geometry respects bonds within ~15%
    pos = m.conformers[0]
    errs = _bond_length_errors(m, pos)
    assert errs.max() < 0.25, f"bond errors {errs}"


def test_embed_batch_counts():
    smiles = ["CCO", "CCN", "CCC", "c1ccncc1"]
    mols = [mol_from_smiles(s) for s in smiles]
    fails = EmbedFailureCounts()
    res = EmbedMolecules(mols, confsPerMolecule=3, maxIterations=15, failures=fails)
    cm = np.asarray(res.conf_mask)
    assert cm.shape == (4, 3)
    # embedding these small molecules should mostly succeed
    assert cm.sum() >= 8
    per_mol = res.per_molecule()
    for mi, m in enumerate(mols):
        assert len(per_mol[mi]) == cm[mi].sum()


def test_embed_chunked_batch_size():
    """HardwareOptions.batchSize chunks the system axis into multiple
    launches (HBM guard); results must stay structurally identical."""
    from nvmolkit_tpu.utils.config import HardwareOptions

    smiles = ["CCO", "CCN", "CCC", "c1ccncc1", "CC(C)O", "CCCl"]
    mols = [mol_from_smiles(s) for s in smiles]
    res = EmbedMolecules(
        mols, confsPerMolecule=2, maxIterations=15,
        hardwareOptions=HardwareOptions(batchSize=3),
    )
    cm = np.asarray(res.conf_mask)
    assert cm.shape == (6, 2)
    assert cm.sum() >= 10
    per_mol = res.per_molecule()
    for mi, m in enumerate(mols):
        assert len(per_mol[mi]) == cm[mi].sum()
        for conf in per_mol[mi]:
            assert conf.shape == (m.num_atoms, 3)
            assert np.isfinite(conf).all()


def test_embed_chunk_cap_scales_with_bucket():
    from nvmolkit_tpu.embedMolecules import _embed_chunk_cap

    assert _embed_chunk_cap(32) > _embed_chunk_cap(64) > _embed_chunk_cap(128)
    # 128-atom bucket: cap must keep the [S, 4A, 4A] Hessian set under
    # the documented 3 GB budget
    assert _embed_chunk_cap(128) * 280 * 128 * 128 <= 3e9
    assert _embed_chunk_cap(256) >= 8


def test_embed_chirality_preserved():
    m = mol_from_smiles("C[C@H](N)C(=O)O")  # L-alanine-like
    res = EmbedMolecules([m], confsPerMolecule=4, maxIterations=20)
    cm = np.asarray(res.conf_mask)
    assert cm.sum() >= 1
    # all embedded conformers have the same chiral volume sign
    from nvmolkit_tpu.models.dist_geom import build_chiral_sets

    cidx, clb, cub = build_chiral_sets(m)
    assert len(cidx) == 1
    signs = []
    for conf in m.conformers:
        pts = conf[cidx[0]]
        v = np.dot(pts[0] - pts[3], np.cross(pts[1] - pts[3], pts[2] - pts[3]))
        signs.append(np.sign(v))
        assert clb[0] <= v <= cub[0]
    assert len(set(signs)) == 1


def test_embed_rejects_nonrandom_coords():
    m = mol_from_smiles("CC")
    with pytest.raises(ValueError):
        EmbedMolecules([m], params=EmbedParameters(useRandomCoords=False))


def test_embed_etk_stage_planarizes_aromatics():
    m = mol_from_smiles("c1ccccc1C=O")  # benzaldehyde: sp2 everywhere
    res = EmbedMolecules(
        [m], confsPerMolecule=2, maxIterations=15,
        params=EmbedParameters(useBasicKnowledge=True),
    )
    cm = np.asarray(res.conf_mask)
    assert cm.sum() >= 1
    pos = m.conformers[0][:6]  # ring atoms
    centered = pos - pos.mean(axis=0)
    s = np.linalg.svd(centered, compute_uv=False)
    assert s[2] < 0.25  # near-planar ring


def test_embed_prune_rms():
    m = mol_from_smiles("CCO")
    res = EmbedMolecules(
        [m], confsPerMolecule=6, maxIterations=15,
        params=EmbedParameters(pruneRmsThresh=10.0),  # absurdly large: prune to 1
    )
    cm = np.asarray(res.conf_mask)
    assert cm.sum() == 1
    assert len(m.conformers) == 1


def test_embed_exp_torsion_provider():
    # a provider that biases the butane central torsion to ~180 (anti)
    m = mol_from_smiles("CCCC")

    def provider(mol):
        idx = np.asarray([[0, 1, 2, 3]], np.int32)
        coeffs = np.zeros((1, 6), np.float32)
        coeffs[0, 0] = 5.0  # F1 (1 + cos(phi - pi)): minimum at phi=pi... phase pi
        phase = np.zeros((1, 6), np.float32)
        phase[0, 0] = 0.0   # E = F1 (1 + cos phi): minimum at phi = pi (anti)
        return idx, coeffs, phase

    res = EmbedMolecules(
        [m], confsPerMolecule=3, maxIterations=15,
        params=EmbedParameters(
            useExpTorsionAnglePrefs=True, useBasicKnowledge=False,
            etkMinimizeIters=300,
        ),
        torsionProvider=provider,
    )
    cm = np.asarray(res.conf_mask)
    assert cm.sum() >= 1
    import math
    for conf in m.conformers:
        p = conf
        b1, b2, b3 = p[1] - p[0], p[2] - p[1], p[3] - p[2]
        n1, n2 = np.cross(b1, b2), np.cross(b2, b3)
        m1 = np.cross(n1, b2 / np.linalg.norm(b2))
        phi = math.degrees(math.atan2(np.dot(m1, n2), np.dot(n1, n2)))
        assert abs(abs(phi) - 180.0) < 60.0, f"dihedral {phi} not biased anti"


def test_prune_conformers_unit(rng):
    from nvmolkit_tpu.ops.pruning import prune_conformers

    base = rng.random((5, 3))
    confs = np.stack([base, base + 1e-4, base + rng.random((5, 3)) * 3.0])
    kept = prune_conformers(confs, threshold=0.5)
    assert 0 in kept and 2 in kept and 1 not in kept
    # disabled threshold keeps everything
    assert len(prune_conformers(confs, threshold=-1)) == 3


# ---------------------------------------------------------------------------
# round 2: experimental-torsion library (default ON)
# ---------------------------------------------------------------------------

def test_torsion_provider_rules_match():
    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.models.etkdg_torsions import default_torsion_provider

    prov = default_torsion_provider()
    idx, coeffs, phase = prov(mol_from_smiles("CC(=O)NC"))
    assert len(idx) == 1  # the amide bond gets the twofold planar rule
    assert coeffs[0, 1] > 4.0 and abs(phase[0, 1] - 3.14159) < 1e-3
    # generic butane gets the threefold staggering rule
    idx2, coeffs2, _ = prov(mol_from_smiles("CCCC"))
    assert len(idx2) == 1 and coeffs2[0, 2] > 0
    # ring central bonds get no rule
    idx3, *_ = prov(mol_from_smiles("C1CCCCC1"))
    assert len(idx3) == 0


def test_torsion_rules_loadable(tmp_path):
    from nvmolkit_tpu.models.etkdg_torsions import (
        ExperimentalTorsionProvider,
        load_torsion_rules,
    )
    from nvmolkit_tpu.chem import mol_from_smiles

    f = tmp_path / "torsions.txt"
    f.write_text("# custom library\n[*][CX4][CX4][*] 3 1.5 0.0\n")
    rules = load_torsion_rules(f)
    assert len(rules) == 1
    prov = ExperimentalTorsionProvider(rules)
    idx, coeffs, _ = prov(mol_from_smiles("CCCC"))
    assert len(idx) == 1 and abs(float(coeffs[0, 2]) - 1.5) < 1e-6


def test_embed_amide_prefers_planar_torsion():
    """Embedding an amide with the default ET library produces (near-)
    planar amide torsions, the library's defining behavior."""
    import math
    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.embedMolecules import EmbedMolecules

    m = mol_from_smiles("CC(=O)NC")  # quartet O=C-N-C is (2,1,3,4)
    EmbedMolecules([m], confsPerMolecule=4, maxIterations=20)
    assert m.conformers
    import numpy as np

    def dihedral(p, i, j, k, l):
        b1, b2, b3 = p[j] - p[i], p[k] - p[j], p[l] - p[k]
        n1, n2 = np.cross(b1, b2), np.cross(b2, b3)
        m1 = np.cross(n1, b2 / np.linalg.norm(b2))
        return math.degrees(math.atan2(np.dot(m1, n2), np.dot(n1, n2)))

    for conf in m.conformers:
        phi = abs(dihedral(np.asarray(conf), 2, 1, 3, 4))
        # minima of 6.0(1+cos(2phi - pi)) are at 0 and 180
        assert phi < 40.0 or phi > 140.0, f"amide torsion not planar: {phi}"


def test_embed_preserves_named_stereocenter():
    """End-to-end chirality preservation: L-alanine-like C[C@H](N)C(=O)O;
    every accepted conformer's chiral volume must have the declared
    sign (the reference validates with conformer_checkers)."""
    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.embedMolecules import EmbedMolecules
    from nvmolkit_tpu.models.dist_geom import build_chiral_sets
    import numpy as np

    for smi in ("C[C@H](N)C(=O)O", "C[C@@H](N)C(=O)O"):
        m = mol_from_smiles(smi)
        idx, lb, ub = build_chiral_sets(m)
        assert len(idx) == 1, smi
        EmbedMolecules([m], confsPerMolecule=4, maxIterations=20)
        assert m.conformers, smi
        for conf in m.conformers:
            p = np.asarray(conf)
            a, b, c, d = idx[0]
            v = np.dot(p[a] - p[d], np.cross(p[b] - p[d], p[c] - p[d]))
            assert lb[0] <= v <= ub[0], (smi, v, lb[0], ub[0])


def test_embed_lbfgs_backend():
    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.embedMolecules import EmbedMolecules, EmbedParameters
    import numpy as np
    import pytest

    mols = [mol_from_smiles(s) for s in ("CCCCO", "CC(C)CC(=O)O")]
    res = EmbedMolecules(
        mols, EmbedParameters(minimizerBackend="lbfgs"),
        confsPerMolecule=2, maxIterations=10,
    )
    assert int(np.asarray(res.conf_mask).sum()) >= 3
    with pytest.raises(ValueError, match="minimizerBackend"):
        EmbedMolecules(
            [mol_from_smiles("CCO")],
            EmbedParameters(minimizerBackend="nope"),
        )


def test_fused_retry_attempt_matches_staged_sequence():
    """The single-program retry attempt (_fused_retry_attempt) must
    reproduce the staged sequence (gather -> coordgen -> three
    minimizations -> checks) given the same PRNG key."""
    import jax
    import jax.numpy as jnp

    from nvmolkit_tpu.chem import mol_from_smiles
    from nvmolkit_tpu.embedMolecules import (
        _check_embeddings,
        _fused_retry_attempt,
    )
    from nvmolkit_tpu.models.dist_geom import (
        build_chiral_sets,
        dg_eg,
        random_distance_matrices,
    )
    from nvmolkit_tpu.chem.bounds import topological_bounds
    from nvmolkit_tpu.ops.lbfgs_flat import batched_lbfgs_flat_minimize
    from nvmolkit_tpu.ops.triangle_smooth import triangle_smooth_bounds

    mols = [mol_from_smiles(s) for s in ("CCO", "CCCC", "CCN", "CCOC")]
    A = 16
    M = len(mols)
    ub = np.zeros((M, A, A), np.float32)
    lb = np.zeros((M, A, A), np.float32)
    am = np.zeros((M, A), bool)
    for k, m in enumerate(mols):
        na = m.num_atoms
        u, l = topological_bounds(m)
        ub[k, :na, :na] = u
        lb[k, :na, :na] = l
        am[k, :na] = True
    ub_j, lb_j, cons = triangle_smooth_bounds(
        jnp.asarray(ub), jnp.asarray(lb), jnp.asarray(am)
    )
    assert bool(np.asarray(cons).all())
    am_j = jnp.asarray(am)

    # minimal check tables: chiral sets only, everything else empty
    C = 1
    chk = (
        jnp.zeros((M, C, 4), jnp.int32), jnp.zeros((M, C), jnp.float32),
        jnp.zeros((M, C), jnp.float32), jnp.zeros((M, C), bool),
        jnp.zeros((M, 1, 4), jnp.int32), jnp.zeros((M, 1), bool),
        jnp.zeros((M, 1, 3), jnp.int32), jnp.zeros((M, 1), bool),
        jnp.zeros((M, 1, 4), jnp.int32), jnp.zeros((M, 1), jnp.float32),
        jnp.zeros((M, 1), bool),
        jnp.zeros((M, 1, 2), jnp.int32), jnp.zeros((M, 1), jnp.float32),
        jnp.ones((M, 1), jnp.float32), jnp.zeros((M, 1), bool),
    )
    del build_chiral_sets  # chiral-free fixture keeps the tables empty

    weights = (
        jnp.float32(1.0), jnp.float32(0.1), jnp.float32(0.2), jnp.float32(1.0)
    )
    scalars = (jnp.float32(0.35), jnp.float32(0.5))
    iters = (60, 40, 30)
    sel = jnp.asarray(np.asarray([2, 0, 3, 1], np.int64))
    key = jax.random.PRNGKey(7)

    coord_cfg = (1.0, True, 1)
    fused_pos, fused_oks = _fused_retry_attempt(
        batched_lbfgs_flat_minimize, key, sel, ub_j, lb_j, am_j, chk, {},
        weights, scalars, iters, False, coord_cfg,
    )

    # staged reference sequence with identical inputs
    ub_g, lb_g, am_g = ub_j[sel], lb_j[sel], am_j[sel]
    tri = jnp.triu(jnp.ones((A, A), bool), 1)[None]
    pm = am_g[:, :, None] & am_g[:, None, :] & tri
    chk_g = tuple(x[sel] for x in chk)
    base = {
        "ub2": ub_g * ub_g, "lb2": lb_g * lb_g, "pair_mask": pm,
        "atom_mask": am_g, "chiral_idx": chk_g[0], "chiral_lb": chk_g[1],
        "chiral_ub": chk_g[2], "chiral_mask": chk_g[3],
    }
    coords4, eig_ok = random_distance_matrices(
        key, ub_g, lb_g, am_g, n_dims=4, num_zero_fail=1
    )
    r1 = batched_lbfgs_flat_minimize(
        dg_eg, coords4, am_g, max_iters=iters[0],
        energy_args=dict(base, chiral_weight=weights[0], fourth_dim_weight=weights[1]),
    )
    r2 = batched_lbfgs_flat_minimize(
        dg_eg, r1.positions, am_g, max_iters=iters[1],
        energy_args=dict(base, chiral_weight=weights[2], fourth_dim_weight=weights[3]),
    )
    pos3 = r2.positions[..., :3]
    oks = _check_embeddings(pos3, ub_g, lb_g, pm, *chk_g, *scalars)

    np.testing.assert_allclose(
        np.asarray(fused_pos), np.asarray(pos3), atol=1e-5
    )
    staged_oks = jnp.concatenate([eig_ok[None], jnp.stack(oks)])
    assert (np.asarray(fused_oks) == np.asarray(staged_oks)).all()


def test_embed_parameter_presets():
    """RDKit preset constructors map onto the tier flags."""
    from nvmolkit_tpu.embedMolecules import (
        ETDG,
        ETKDG,
        ETKDGv2,
        ETKDGv3,
        KDG,
        srETKDGv3,
    )

    p = ETKDG()
    assert p.useExpTorsionAnglePrefs and p.useBasicKnowledge
    assert p.forceTransAmides
    assert ETKDGv2().useBasicKnowledge
    assert ETKDGv3().useMacrocycleTorsions
    assert srETKDGv3().useSmallRingTorsions
    assert not KDG().useExpTorsionAnglePrefs and KDG().useBasicKnowledge
    assert ETDG().useExpTorsionAnglePrefs and not ETDG().useBasicKnowledge
    # overrides pass through
    assert ETKDGv3(randomSeed=7).randomSeed == 7


def test_force_trans_amides_pins_omega():
    """forceTransAmides must drive amide omega torsions to ~180 deg
    (trans) across embedded conformers of N-methylacetamide."""
    from nvmolkit_tpu.embedMolecules import EmbedMolecules, EmbedParameters

    def omega_cos(pos):
        # CC(=O)NC atoms: 0=CH3, 1=C, 2=O, 3=N, 4=CH3 -> omega quartet
        # (0, 1, 3, 4)
        p0, p1, p2, p3 = pos[0], pos[1], pos[3], pos[4]
        b1, b2, b3 = p1 - p0, p2 - p1, p3 - p2
        n1 = np.cross(b1, b2)
        n2 = np.cross(b2, b3)
        return float(
            np.dot(n1, n2) / (np.linalg.norm(n1) * np.linalg.norm(n2))
        )

    m = mol_from_smiles("CC(=O)NC")
    EmbedMolecules(
        [m], EmbedParameters(forceTransAmides=True, randomSeed=3),
        confsPerMolecule=6, maxIterations=15,
    )
    assert len(m.conformers) >= 3
    for conf in m.conformers:
        # trans omega: cos(omega) ~ -1
        assert omega_cos(conf) < -0.8, omega_cos(conf)


def test_num_zero_fail_rejects_rank_deficient():
    """numZeroFail>0 flags systems whose metric matrix cannot span the
    embedding dimensions. Exact planar (rank-2) bounds must fail the
    4-D check; an exact 3-D point set passes with num_zero_fail=1 (its
    one structural zero is the 4th dim... which IS counted, so it needs
    num_zero_fail=2 to pass); and a flexible chain embeds end-to-end
    with the strict setting thanks to bounds slack."""
    import jax

    from nvmolkit_tpu.embedMolecules import (
        EmbedFailureCounts,
        EmbedMolecules,
        EmbedParameters,
    )
    from nvmolkit_tpu.models.dist_geom import random_distance_matrices

    rng = np.random.default_rng(5)
    A = 12
    d = np.zeros((2, A, A), np.float32)
    mask = np.zeros((2, A), bool)
    for s, dim in enumerate((2, 3)):  # planar vs 3-D point set
        pts = rng.normal(size=(8, dim)) * 2.0
        dm = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
        d[s, :8, :8] = dm
        mask[s, :8] = True
    _c, ok1 = random_distance_matrices(
        jax.random.PRNGKey(0), jnp.asarray(d), jnp.asarray(d),
        jnp.asarray(mask), n_dims=4, num_zero_fail=1,
    )
    _c, ok2 = random_distance_matrices(
        jax.random.PRNGKey(0), jnp.asarray(d), jnp.asarray(d),
        jnp.asarray(mask), n_dims=4, num_zero_fail=2,
    )
    ok1, ok2 = np.asarray(ok1), np.asarray(ok2)
    assert not ok1[0] and not ok1[1]   # both have a zero 4th dim
    assert not ok2[0] and ok2[1]       # rank-2 fails even at 2 zeros

    fail = EmbedFailureCounts()
    chain = mol_from_smiles("CCCCCC")
    res = EmbedMolecules(
        [chain], EmbedParameters(numZeroFail=1), confsPerMolecule=2,
        maxIterations=10, failures=fail,
    )
    assert np.asarray(res.conf_mask).sum() >= 1


def test_top_k_eig_power_matches_eigh():
    """The batched power eigensolver must agree with eigh's dominant
    eigenpairs (values to 1e-4 rel, subspace residual small) on random
    padded PSD-ish metric matrices."""
    import jax

    from nvmolkit_tpu.models.dist_geom import _top_k_eig_power

    rng = np.random.default_rng(11)
    S, A, k = 8, 24, 4
    mask = np.zeros((S, A), bool)
    g = np.zeros((S, A, A), np.float32)
    for s in range(S):
        n = int(rng.integers(6, A + 1))
        mask[s, :n] = True
        x = rng.normal(size=(n, 5)).astype(np.float32)
        gs = x @ x.T  # PSD, rank <= 5
        g[s, :n, :n] = gs
    vals, vecs = _top_k_eig_power(
        jnp.asarray(g), jnp.asarray(mask), k, jax.random.PRNGKey(0)
    )
    vals = np.asarray(vals)
    vecs = np.asarray(vecs)
    for s in range(S):
        ref = np.linalg.eigh(g[s])[0][::-1][:k]
        np.testing.assert_allclose(vals[s], ref, rtol=1e-3, atol=1e-3)
        for j in range(k):
            v = vecs[s, :, j]
            resid = g[s] @ v - vals[s, j] * v
            assert np.linalg.norm(resid) < 1e-2 * max(1.0, abs(vals[s, j]))


def test_hybridization_array_matches_oracle(smiles100):
    from nvmolkit_tpu.models.etk import _hybridization_array
    from nvmolkit_tpu.models.uff.builder import _hybridization

    for smi in smiles100:
        m = mol_from_smiles(smi)
        hyb = _hybridization_array(m)
        for i in range(m.num_atoms):
            assert hyb[i] == _hybridization(m, i), f"{smi} atom {i}"


def test_build_etk_terms_batch_matches_oracle(smiles100):
    """Whole-batch ETK term assembly must equal the per-mol builder
    term-for-term (same emission order) with and without the torsion
    provider."""
    from nvmolkit_tpu.models.etk import build_etk_terms_batch
    from nvmolkit_tpu.models.etk import _build_etk_terms_uncached
    from nvmolkit_tpu.models.etkdg_torsions import default_torsion_provider

    tp = default_torsion_provider()
    mols = [mol_from_smiles(s) for s in smiles100[:40]]
    batch = build_etk_terms_batch(mols, tp)
    for m, got in zip(mols, batch):
        want = _build_etk_terms_uncached(m, tp)
        np.testing.assert_array_equal(got.improper_idx, want.improper_idx)
        np.testing.assert_array_equal(got.improper_k, want.improper_k)
        np.testing.assert_array_equal(got.torsion_idx, want.torsion_idx)
        np.testing.assert_array_equal(got.torsion_coeffs, want.torsion_coeffs)
        np.testing.assert_array_equal(got.torsion_phase, want.torsion_phase)
