"""Double-bond stereochemistry (E/Z) perception from SMILES directions.

Counterpart of the reference's double-bond stereo machinery
(``src/embedder_utils.h`` ``findDoubleBonds`` / stereoDoubleBonds and the
double-bond stereo check stage). SMILES semantics: in ``F/C=C/F`` the
directional single bonds flank the double bond; equal directions (after
normalizing each bond to point along the path toward/away from the
double bond) mean the substituents are on opposite sides (trans/E),
opposite directions mean the same side (cis/Z).
"""
from __future__ import annotations

import dataclasses

from nvmolkit_tpu.chem.mol import BondDir, BondType, Mol


@dataclasses.dataclass(frozen=True)
class StereoDoubleBond:
    """Quartet (i, j, k, l) around the double bond j=k; is_cis refers to
    the i/l substituents."""

    i: int
    j: int
    k: int
    l: int
    is_cis: bool


def _directed_neighbor(mol: Mol, center: int, exclude: int):
    """A neighbor of ``center`` connected by a directional single bond,
    with the direction normalized to the center->neighbor orientation."""
    for bi in mol.atom_bonds(center):
        b = mol.bonds[bi]
        if b.direction == BondDir.NONE or b.bond_type != BondType.SINGLE:
            continue
        other = b.other(center)
        if other == exclude:
            continue
        d = b.direction
        if b.begin != center:  # stored orientation opposite to center->other
            d = BondDir.DOWN if d == BondDir.UP else BondDir.UP
        return other, d
    return None


def find_stereo_double_bonds(mol: Mol) -> list[StereoDoubleBond]:
    out = []
    for b in mol.bonds:
        if b.bond_type != BondType.DOUBLE or b.in_ring:
            continue
        j, k = b.begin, b.end
        left = _directed_neighbor(mol, j, k)
        right = _directed_neighbor(mol, k, j)
        if left is None or right is None:
            continue
        (i, di) = left
        (l, dl) = right
        # normalize both to the path direction i -> j and k -> l:
        # left is center->neighbor (j->i), flip to i->j
        di = BondDir.DOWN if di == BondDir.UP else BondDir.UP
        # equal normalized directions -> substituents on opposite sides
        is_cis = di != dl
        out.append(StereoDoubleBond(i=i, j=j, k=k, l=l, is_cis=is_cis))
    return out
