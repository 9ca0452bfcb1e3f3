"""E/Z double-bond stereo tests (reference: double-bond stereo check
stage + findDoubleBonds role)."""
import math

import numpy as np
import pytest

from nvmolkit_tpu.chem import mol_from_smiles
from nvmolkit_tpu.chem.stereo import find_stereo_double_bonds
from nvmolkit_tpu.embedMolecules import EmbedMolecules


def _dihedral(p, i, j, k, l):
    b1, b2, b3 = p[j] - p[i], p[k] - p[j], p[l] - p[k]
    n1, n2 = np.cross(b1, b2), np.cross(b2, b3)
    m1 = np.cross(n1, b2 / np.linalg.norm(b2))
    return math.degrees(math.atan2(np.dot(m1, n2), np.dot(n1, n2)))


def test_perception_trans():
    m = mol_from_smiles("F/C=C/F")
    sdbs = find_stereo_double_bonds(m)
    assert len(sdbs) == 1
    assert not sdbs[0].is_cis


def test_perception_cis():
    m = mol_from_smiles("F/C=C\\F")
    sdbs = find_stereo_double_bonds(m)
    assert len(sdbs) == 1
    assert sdbs[0].is_cis


def test_perception_none_without_markers():
    m = mol_from_smiles("FC=CF")
    assert find_stereo_double_bonds(m) == []
    # ring double bonds excluded
    m = mol_from_smiles("C1=CCCCC1")
    assert find_stereo_double_bonds(m) == []


@pytest.mark.parametrize("smiles,want_cis", [("F/C=C/F", False), ("F/C=C\\F", True)])
def test_embedding_respects_ez(smiles, want_cis):
    m = mol_from_smiles(smiles)
    res = EmbedMolecules([m], confsPerMolecule=3, maxIterations=20)
    cm = np.asarray(res.conf_mask)
    assert cm.sum() >= 1
    sdb = find_stereo_double_bonds(m)[0]
    for conf in m.conformers:
        phi = _dihedral(conf, sdb.i, sdb.j, sdb.k, sdb.l)
        if want_cis:
            assert abs(phi) < 60.0, f"expected cis, got dihedral {phi}"
        else:
            assert abs(phi) > 120.0, f"expected trans, got dihedral {phi}"


# ---------------------------------------------------------------------------
# round 2: explicit check stages (double-bond geometry / stereo / chiral-dist)
# ---------------------------------------------------------------------------

def test_find_double_bond_ends_ethene():
    from nvmolkit_tpu.chem.stereo import find_double_bond_ends

    m = mol_from_smiles("CC=CC")
    ends = find_double_bond_ends(m)
    # both ends of the double bond have exactly one heavy substituent
    assert (0, 1, 2) in ends and (3, 2, 1) in ends


def test_find_double_bond_ends_skips_cumulene_center():
    from nvmolkit_tpu.chem.stereo import find_double_bond_ends

    m = mol_from_smiles("CC=C=CC")  # allene: central sp carbon
    ends = find_double_bond_ends(m)
    # the central atom (idx 2) must never appear as the substituent i
    assert all(i != 2 for (i, j, k) in ends)


def test_ring_cis_double_bonds():
    from nvmolkit_tpu.chem.stereo import find_ring_cis_double_bonds

    m = mol_from_smiles("C1=CCCCC1")  # cyclohexene
    cis = find_ring_cis_double_bonds(m)
    assert len(cis) == 1 and cis[0].is_cis


def test_ring_cis_skips_large_rings():
    from nvmolkit_tpu.chem.stereo import find_ring_cis_double_bonds

    m = mol_from_smiles("C1=CCCCCCCCC1")  # 10-ring: E or Z possible
    assert find_ring_cis_double_bonds(m) == []


def test_embed_failure_counters_cover_new_stages():
    from nvmolkit_tpu.embedMolecules import EmbedFailureCounts

    f = EmbedFailureCounts()
    for name in ("double_bond_geometry", "double_bond_stereo", "chiral_dist_check"):
        assert getattr(f, name) == 0


def test_stereo_check_rejects_wrong_ez():
    """A hand-built wrong-stereo conformer must fail the E/Z check."""
    import jax.numpy as jnp
    from nvmolkit_tpu.embedMolecules import _check_embeddings

    # trans-specified quartet but cis geometry: i and l on the same side
    pos = np.zeros((1, 8, 3), np.float32)
    pos[0, 0] = (-0.5, 1.0, 0.0)   # i
    pos[0, 1] = (0.0, 0.0, 0.0)    # j
    pos[0, 2] = (1.4, 0.0, 0.0)    # k
    pos[0, 3] = (1.9, 1.0, 0.0)    # l  (same side as i -> cis geometry)
    A = 8
    trivial_pair_mask = np.zeros((1, A, A), bool)
    args = dict(
        pos3=jnp.asarray(pos),
        ub=jnp.full((1, A, A), 100.0, jnp.float32),
        lb=jnp.zeros((1, A, A), jnp.float32),
        pair_mask=jnp.asarray(trivial_pair_mask),
        chiral_idx=jnp.zeros((1, 1, 4), jnp.int32),
        chiral_lb=jnp.zeros((1, 1), jnp.float32),
        chiral_ub=jnp.zeros((1, 1), jnp.float32),
        chiral_mask=jnp.zeros((1, 1), bool),
        tetra_idx=jnp.zeros((1, 1, 4), jnp.int32),
        tetra_mask=jnp.zeros((1, 1), bool),
        dbe_idx=jnp.zeros((1, 1, 3), jnp.int32),
        dbe_mask=jnp.zeros((1, 1), bool),
        sdb_idx=jnp.asarray([[[0, 1, 2, 3]]], jnp.int32),
        sdb_sign=jnp.asarray([[1.0]], jnp.float32),   # trans specified
        sdb_mask=jnp.asarray([[True]]),
        cd_idx=jnp.zeros((1, 1, 2), jnp.int32),
        cd_lb=jnp.zeros((1, 1), jnp.float32),
        cd_ub=jnp.ones((1, 1), jnp.float32),
        cd_mask=jnp.zeros((1, 1), bool),
        max_violation_ratio=0.35,
        min_tetra_volume=0.5,
    )
    *_, ok_dbstereo, _ = _check_embeddings(**args)
    assert not bool(ok_dbstereo[0])

    # cis-specified: the same geometry must pass
    args["sdb_sign"] = jnp.asarray([[-1.0]], jnp.float32)
    *_, ok_dbstereo, _ = _check_embeddings(**args)
    assert bool(ok_dbstereo[0])


def test_geometry_check_rejects_linear_double_bond():
    import jax.numpy as jnp
    from nvmolkit_tpu.embedMolecules import _check_embeddings

    pos = np.zeros((1, 8, 3), np.float32)
    pos[0, 0] = (-1.5, 0.0, 0.0)   # i collinear with j, k
    pos[0, 1] = (0.0, 0.0, 0.0)    # j
    pos[0, 2] = (1.4, 0.0, 0.0)    # k
    A = 8
    args = dict(
        pos3=jnp.asarray(pos),
        ub=jnp.full((1, A, A), 100.0, jnp.float32),
        lb=jnp.zeros((1, A, A), jnp.float32),
        pair_mask=jnp.zeros((1, A, A), bool),
        chiral_idx=jnp.zeros((1, 1, 4), jnp.int32),
        chiral_lb=jnp.zeros((1, 1), jnp.float32),
        chiral_ub=jnp.zeros((1, 1), jnp.float32),
        chiral_mask=jnp.zeros((1, 1), bool),
        tetra_idx=jnp.zeros((1, 1, 4), jnp.int32),
        tetra_mask=jnp.zeros((1, 1), bool),
        dbe_idx=jnp.asarray([[[0, 1, 2]]], jnp.int32),
        dbe_mask=jnp.asarray([[True]]),
        sdb_idx=jnp.zeros((1, 1, 4), jnp.int32),
        sdb_sign=jnp.ones((1, 1), jnp.float32),
        sdb_mask=jnp.zeros((1, 1), bool),
        cd_idx=jnp.zeros((1, 1, 2), jnp.int32),
        cd_lb=jnp.zeros((1, 1), jnp.float32),
        cd_ub=jnp.ones((1, 1), jnp.float32),
        cd_mask=jnp.zeros((1, 1), bool),
        max_violation_ratio=0.35,
        min_tetra_volume=0.5,
    )
    _, _, _, ok_dbgeom, _, _ = _check_embeddings(**args)
    assert not bool(ok_dbgeom[0])

    # bent geometry passes
    pos[0, 0] = (-0.5, 1.0, 0.0)
    args["pos3"] = jnp.asarray(pos)
    _, _, _, ok_dbgeom, _, _ = _check_embeddings(**args)
    assert bool(ok_dbgeom[0])


def test_embed_ring_double_bond_stays_cis():
    """Cyclohexene embedding must keep the in-ring substituents cis."""
    from nvmolkit_tpu.chem.stereo import find_ring_cis_double_bonds

    m = mol_from_smiles("C1=CCCCC1")
    EmbedMolecules([m], confsPerMolecule=2, maxIterations=20)
    assert m.conformers, "cyclohexene failed to embed"
    sdb = find_ring_cis_double_bonds(m)[0]
    for conf in m.conformers:
        phi = _dihedral(np.asarray(conf), sdb.i, sdb.j, sdb.k, sdb.l)
        assert abs(phi) < 60.0, f"ring double bond not cis: {phi}"


def test_relaxed_bounds_mode():
    from nvmolkit_tpu.chem.bounds import topological_bounds

    m = mol_from_smiles("C1CC1C(F)(F)F")  # strained-ish
    u0, l0 = topological_bounds(m)
    u1, l1 = topological_bounds(m, relaxed=True)
    # relaxed mode widens the windows on average (vdW floors scaled down,
    # wider 1-3/1-4 tolerances); conflict-resolution midpoints can move
    # individual entries slightly either way
    assert l1.mean() < l0.mean()
    assert u1[u1 < 100].mean() > u0[u0 < 100].mean()
