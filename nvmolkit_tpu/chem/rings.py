"""Ring perception: ring membership + smallest ring size per atom/bond.

A bond is in a ring iff it is not a bridge of the molecular graph
(computed with an iterative DFS lowlink pass). Smallest ring size through
each ring bond is found with a BFS that excludes the bond itself.
This provides what the TPU pipelines need from RDKit's RingInfo:
``IsInRing`` flags for Morgan invariants and small-ring sizes for
force-field atom typing.
"""
from __future__ import annotations

from collections import deque
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from nvmolkit_tpu.chem.mol import Mol


def _find_bridges(mol: "Mol") -> set[int]:
    """Return bond indices that are bridges (not in any cycle)."""
    n = mol.num_atoms
    disc = [-1] * n
    low = [0] * n
    bridges: set[int] = set()
    timer = 0
    for root in range(n):
        if disc[root] != -1:
            continue
        # iterative DFS: stack holds (atom, parent_bond, bond_iter_pos)
        stack = [(root, -1, 0)]
        disc[root] = low[root] = timer
        timer += 1
        while stack:
            u, pbond, pos = stack[-1]
            bonds = mol.atom_bonds(u)
            if pos < len(bonds):
                stack[-1] = (u, pbond, pos + 1)
                bi = bonds[pos]
                if bi == pbond:
                    continue
                v = mol.bonds[bi].other(u)
                if disc[v] == -1:
                    disc[v] = low[v] = timer
                    timer += 1
                    stack.append((v, bi, 0))
                else:
                    low[u] = min(low[u], disc[v])
            else:
                stack.pop()
                if stack:
                    parent = stack[-1][0]
                    low[parent] = min(low[parent], low[u])
                    if low[u] > disc[parent]:
                        bridges.add(pbond)
    return bridges


def _smallest_ring_through_bond(mol: "Mol", bond_idx: int, cap: int = 24) -> int:
    """BFS shortest path between bond endpoints avoiding the bond itself."""
    b = mol.bonds[bond_idx]
    start, goal = b.begin, b.end
    dist = {start: 0}
    q = deque([start])
    while q:
        u = q.popleft()
        if dist[u] >= cap:
            break
        for bi in mol.atom_bonds(u):
            if bi == bond_idx:
                continue
            v = mol.bonds[bi].other(u)
            if v not in dist:
                dist[v] = dist[u] + 1
                if v == goal:
                    return dist[v] + 1  # path length + the excluded bond
                q.append(v)
    return 0


def perceive_rings(mol: "Mol") -> None:
    bridges = _find_bridges(mol)
    for a in mol.atoms:
        a.in_ring = False
        a.min_ring_size = 0
    for bi, b in enumerate(mol.bonds):
        b.in_ring = bi not in bridges
        if b.in_ring:
            size = _smallest_ring_through_bond(mol, bi)
            for ai in (b.begin, b.end):
                atom = mol.atoms[ai]
                atom.in_ring = True
                if size and (atom.min_ring_size == 0 or size < atom.min_ring_size):
                    atom.min_ring_size = size
