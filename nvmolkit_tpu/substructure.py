"""Batch substructure search — public API.

Mirrors the reference's ``nvmolkit/substructure.py``:
``getSubstructMatches(targets, queries, config)`` returns a
:class:`SubstructMatchResults` CSR triple (atom_indices / match_indptr /
pair_indptr) over the (target x query) grid, plus ``countSubstructMatches``
and ``hasSubstructMatch`` reductions and a ``SubstructSearchConfig``
mirroring ``substruct_results.h:36-43``.
"""
from __future__ import annotations

import dataclasses

import numpy as np

import enum

from nvmolkit_tpu.chem.mol import Mol
from nvmolkit_tpu.chem.smarts import QueryMol, parse_smarts
from nvmolkit_tpu.ops.substruct import featurize_target, find_matches, find_matches_vf2


class SubstructAlgorithm(enum.Enum):
    """Mirror of the reference's algorithm selector
    (``substruct_results.h:26-29``): GSI = level-by-level BFS join
    (default, vectorized), VF2 = depth-first backtracking."""

    GSI = "gsi"
    VF2 = "vf2"


@dataclasses.dataclass
class SubstructSearchConfig:
    """Mirror of the reference config (``substruct_results.h:36-43``).

    ``workerThreads`` sizes the native C++ matcher's thread pool
    (-1/0 = all cores); ``useNativeEngine=False`` forces the Python
    reference engine (also the automatic fallback when the native
    library cannot be built)."""

    batchSize: int = 1024
    workerThreads: int = -1
    preprocessingThreads: int = -1
    executorsPerRunner: int = 2
    deviceIds: list[int] = dataclasses.field(default_factory=list)
    # reference defaults (``nvmolkit/substructure.py:59-71``):
    # maxMatches 0 = unlimited, uniquify off
    maxMatches: int = 0
    uniquify: bool = False
    algorithm: SubstructAlgorithm = SubstructAlgorithm.GSI
    useNativeEngine: bool = True
    # run the BFS join on the accelerator (ops/substruct_device.py —
    # the reference's GPU GSI kernel role); unsupported/overflowed
    # pairs drain to the host engines
    useDeviceEngine: bool = False
    deviceFrontierCap: int = 128
    # reference spelling for deviceIds (``nvmolkit/substructure.py:72``)
    gpuIds: list[int] | None = None

    def __post_init__(self):
        if self.gpuIds is not None and not self.deviceIds:
            self.deviceIds = list(self.gpuIds)


@dataclasses.dataclass
class SubstructMatchResults:
    """CSR triple over the (target, query) grid, pair index
    ``p = target_idx * n_queries + query_idx``:

      atom_indices  flat target-atom ids of every match, query-atom order
      match_indptr  [n_matches+1] start of each match in atom_indices
      pair_indptr   [n_pairs+1]   start of each pair's matches in
                    match_indptr
    """

    atom_indices: np.ndarray
    match_indptr: np.ndarray
    pair_indptr: np.ndarray
    n_targets: int
    n_queries: int
    overflowed: list[tuple[int, int]]

    def matches(self, target_idx: int, query_idx: int) -> list[tuple[int, ...]]:
        p = target_idx * self.n_queries + query_idx
        out = []
        for m in range(self.pair_indptr[p], self.pair_indptr[p + 1]):
            s, e = self.match_indptr[m], self.match_indptr[m + 1]
            out.append(tuple(self.atom_indices[s:e].tolist()))
        return out

    def counts(self) -> np.ndarray:
        """[n_targets, n_queries] match counts."""
        per_pair = np.diff(self.pair_indptr)
        return per_pair.reshape(self.n_targets, self.n_queries)


def _as_query(q) -> QueryMol:
    if isinstance(q, QueryMol):
        return q
    if isinstance(q, str):
        return parse_smarts(q)
    raise TypeError(f"query must be a SMARTS string or QueryMol, got {type(q)}")


def getSubstructMatches(
    targets: list[Mol],
    queries: list,
    config: SubstructSearchConfig | None = None,
) -> SubstructMatchResults:
    cfg = config or SubstructSearchConfig()
    # reference semantics: maxMatches == 0 means unlimited
    mm = cfg.maxMatches if cfg.maxMatches > 0 else (2**31 - 1)
    qmols = [_as_query(q) for q in queries]
    # SSSR ring-membership counts are the most expensive target feature;
    # only R<n> primitives read them, so skip the perception entirely
    # when no query uses one (features are cached per Mol either way).
    from nvmolkit_tpu.ops.substruct import query_uses_prop

    need_rc = any(query_uses_prop(q, "ring_count") for q in qmols)
    tfs = [featurize_target(t, need_ring_count=need_rc) for t in targets]

    from nvmolkit_tpu.chem.native_substruct import (
        native_substruct_available,
        native_substruct_search,
    )
    from nvmolkit_tpu.ops.substruct import _is_connected

    use_native = (
        cfg.useNativeEngine
        and cfg.algorithm == SubstructAlgorithm.GSI
        and native_substruct_available()
    )

    device_matches: dict[tuple[int, int], "np.ndarray"] = {}
    device_capped: set[tuple[int, int]] = set()
    if cfg.useDeviceEngine and cfg.algorithm == SubstructAlgorithm.GSI:
        from nvmolkit_tpu.ops.substruct_device import (
            compile_query,
            device_substruct_matches,
        )

        compiled = [compile_query(q) for q in qmols]
        all_pairs = [
            (ti, qi) for ti in range(len(tfs)) for qi in range(len(qmols))
        ]
        device_matches, _unresolved, device_capped = device_substruct_matches(
            all_pairs, tfs, qmols, compiled,
            max_matches=mm, uniquify=cfg.uniquify,
            frontier_cap=cfg.deviceFrontierCap,
        )

    native_matches = None
    native_overflowed: set[tuple[int, int]] = set()
    if use_native and cfg.useDeviceEngine:
        # drain whole query columns the device engine cannot run
        # (recursive SMARTS, oversized queries) to the native C++ engine
        # rather than the Python matcher
        device_qis = {qi for (_ti, qi) in device_matches}
        connected_ids = [
            qi for qi, q in enumerate(qmols)
            if qi not in device_qis and _is_connected(q)
        ]
        if connected_ids:
            nm, nover = native_substruct_search(
                tfs,
                [qmols[qi] for qi in connected_ids],
                max_matches=mm,
                uniquify=cfg.uniquify,
                n_threads=max(0, cfg.workerThreads),
            )
            native_matches = {}
            for ti in range(len(tfs)):
                for k, qi in enumerate(connected_ids):
                    native_matches[(ti, qi)] = nm[ti][k]
            native_overflowed = {
                (ti, connected_ids[k]) for (ti, k) in nover
            }
    elif use_native and not cfg.useDeviceEngine:
        # disconnected queries go through the Python component combiner
        connected_ids = [qi for qi, q in enumerate(qmols) if _is_connected(q)]
        if connected_ids:
            nm, nover = native_substruct_search(
                tfs,
                [qmols[qi] for qi in connected_ids],
                max_matches=mm,
                uniquify=cfg.uniquify,
                n_threads=max(0, cfg.workerThreads),
            )
            native_matches = {}
            for ti in range(len(tfs)):
                for k, qi in enumerate(connected_ids):
                    native_matches[(ti, qi)] = nm[ti][k]
            native_overflowed = {
                (ti, connected_ids[k]) for (ti, k) in nover
            }
        else:
            native_matches = {}

    atom_indices: list[np.ndarray] = []
    match_indptr = [0]
    pair_indptr = [0]
    overflowed: list[tuple[int, int]] = []
    cursor_atoms = 0
    matcher = (
        find_matches_vf2 if cfg.algorithm == SubstructAlgorithm.VF2 else find_matches
    )
    for ti, tf in enumerate(tfs):
        for qi, q in enumerate(qmols):
            if (ti, qi) in device_matches:
                m = device_matches[(ti, qi)]
                over = (ti, qi) in device_capped
            elif native_matches is not None and (ti, qi) in native_matches:
                m = native_matches[(ti, qi)]
                over = (ti, qi) in native_overflowed
            else:
                m, over = matcher(
                    q, tf, max_matches=mm, uniquify=cfg.uniquify
                )
            if over:
                overflowed.append((ti, qi))
            for row in m:
                atom_indices.append(row)
                cursor_atoms += len(row)
                match_indptr.append(cursor_atoms)
            pair_indptr.append(len(match_indptr) - 1)

    return SubstructMatchResults(
        atom_indices=(
            np.concatenate(atom_indices) if atom_indices else np.zeros(0, np.int32)
        ),
        match_indptr=np.asarray(match_indptr, np.int64),
        pair_indptr=np.asarray(pair_indptr, np.int64),
        n_targets=len(targets),
        n_queries=len(qmols),
        overflowed=overflowed,
    )


def countSubstructMatches(
    targets: list[Mol], queries: list, config: SubstructSearchConfig | None = None
) -> np.ndarray:
    return getSubstructMatches(targets, queries, config).counts()


def hasSubstructMatch(
    targets: list[Mol], queries: list, config: SubstructSearchConfig | None = None
) -> np.ndarray:
    cfg = config or SubstructSearchConfig()
    cfg = dataclasses.replace(cfg, maxMatches=1)
    return getSubstructMatches(targets, queries, cfg).counts() > 0
