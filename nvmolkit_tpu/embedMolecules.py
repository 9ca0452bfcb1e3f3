"""ETKDG-style conformer embedding — public API.

Mirrors the reference's ``nvmolkit/embedMolecules.py`` /
``src/etkdg.cpp:92-486`` pipeline, TPU-first:

  stage 1  topological bounds (host, cached per molecule)
  stage 2  triangle smoothing          — batched Floyd-Warshall on device
  stage 3  random distance matrices    — device PRNG
  stage 4  metric-matrix projection    — batched eigh
  stage 5  DG 4-D minimization         — batched BFGS (chiral w=1.0,
           fourth-dim w=0.1, 400 iters; mirroring etkdg.cpp:341-371)
  stage 6  fourth-dim compression      — batched BFGS (0.2 / 1.0, 200)
  stage 7  stereo/sanity checks        — bounds satisfaction + chiral
           volume + tetrahedral-collapse checks, vectorized
  retry    failed conformers re-enter the next iteration with a fresh
           PRNG key (the reference's Scheduler/active-mask machinery,
           etkdg_impl.h:210-286, becomes a host retry loop over masks)
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from nvmolkit_tpu.chem.bounds import topological_bounds
from nvmolkit_tpu.chem.mol import Mol
from nvmolkit_tpu.models.dist_geom import (
    build_chiral_sets,
    random_distance_matrices,
)
from nvmolkit_tpu.ops.bfgs import batched_bfgs_minimize
from nvmolkit_tpu.ops.triangle_smooth import triangle_smooth_bounds
from nvmolkit_tpu.types import Dense3DResult
from nvmolkit_tpu.utils.config import HardwareOptions


@dataclasses.dataclass
class EmbedParameters:
    """RDKit ``EmbedParameters`` mirror (the reference passes RDKit's
    struct straight through, ``src/etkdg.h:39-59``).

    ``useRandomCoords`` must stay True (the reference enforces the same,
    ``embedMolecules.py:70-77``).
    """

    useRandomCoords: bool = True
    randomSeed: int = 42
    # eigen-projection knobs (RDKit semantics; models/dist_geom.py):
    # box side for randomized eigencomponents, randomize-vs-zero for
    # non-positive eigenvalues, and the zero-eigenvalue failure count.
    # numZeroFail defaults OFF (0) here, unlike RDKit's 1: this
    # pipeline embeds heavy-atom graphs whose rigid planar systems
    # (benzene) have exactly rank-2 metric matrices — a strict zero
    # count would reject them forever. RDKit's all-atom bounds carry
    # enough slack to dodge that; set 1 for strict RDKit parity on
    # flexible molecules.
    boxSizeMult: float = 2.0
    randNegEig: bool = True
    numZeroFail: int = 0
    # pin amide omega torsions trans during the ETK 3-D stage (RDKit's
    # forceTransAmides adjusts the 1-4 bounds instead; here it is an
    # ETK torsion term with its minimum at omega=180 — same observable
    # behavior, device-friendly mechanism)
    forceTransAmides: bool = False
    maxViolationRatio: float = 0.35   # bounds-check acceptance
    minTetrahedralVolume: float = 0.5  # |6V| floor for sp3 centers
    chiralWeightFirst: float = 1.0
    fourthDimWeightFirst: float = 0.1
    chiralWeightSecond: float = 0.2
    fourthDimWeightSecond: float = 1.0
    firstMinimizeIters: int = 400
    fourthDimMinimizeIters: int = 200
    useBasicKnowledge: bool = True    # ETK improper (planarity) 3-D stage
    # experimental-torsion preferences: ON by default (the embedded
    # library, models/etkdg_torsions); pass torsionProvider to override
    useExpTorsionAnglePrefs: bool = True
    # opt-in ring-bond torsion tiers (ETKDGv3's useSmallRingTorsions /
    # useMacrocycleTorsions): 3-6-ring pucker staggering and 9+-ring
    # anti-bias rule sets
    useSmallRingTorsions: bool = False
    useMacrocycleTorsions: bool = False
    etkMinimizeIters: int = 150
    pruneRmsThresh: float = -1.0      # <=0 disables RMS pruning
    ignoreSmoothingFailures: bool = False  # embed with relaxed unsmoothed bounds
    # "flat" (default: per-system stepping L-BFGS — no lockstep
    # line-search sync, fastest measured end-to-end once the torsion
    # library's host matching stopped dominating), "bfgs"
    # (reference-matching NR BFGS with the full inverse Hessian), or
    # "lbfgs" (two-loop with synchronous line search — use when the
    # flat backend's extra state presses on memory-tight buckets)
    minimizerBackend: str = "flat"


def ETKDG(**overrides) -> EmbedParameters:
    """RDKit ``ETKDG()`` preset: experimental torsions + basic
    knowledge (v1 knob set)."""
    return EmbedParameters(
        useExpTorsionAnglePrefs=True, useBasicKnowledge=True,
        forceTransAmides=True, **overrides,
    )


def ETKDGv2(**overrides) -> EmbedParameters:
    """RDKit ``ETKDGv2()`` preset (v2 torsion handling; same knob
    surface here — the embedded torsion library is versionless)."""
    return ETKDG(**overrides)


def ETKDGv3(**overrides) -> EmbedParameters:
    """RDKit ``ETKDGv3()`` preset: v3 torsions + macrocycle tiers."""
    return ETKDG(useMacrocycleTorsions=True, **overrides)


def srETKDGv3(**overrides) -> EmbedParameters:
    """RDKit ``srETKDGv3()`` preset: v3 with small-ring torsions."""
    return ETKDG(useSmallRingTorsions=True, **overrides)


def KDG(**overrides) -> EmbedParameters:
    """RDKit ``KDG()`` preset: basic knowledge only."""
    return EmbedParameters(
        useExpTorsionAnglePrefs=False, useBasicKnowledge=True, **overrides
    )


def ETDG(**overrides) -> EmbedParameters:
    """RDKit ``ETDG()`` preset: experimental torsions only."""
    return EmbedParameters(
        useExpTorsionAnglePrefs=True, useBasicKnowledge=False, **overrides
    )


@dataclasses.dataclass
class EmbedFailureCounts:
    """Per-stage failure counters (the reference's getFailures())."""

    double_bond_geometry: int = 0
    double_bond_stereo: int = 0
    chiral_dist_check: int = 0

    smoothing: int = 0
    initial_coords: int = 0   # numZeroFail eigen-rank check
    first_minimize: int = 0
    bounds_check: int = 0
    chiral_check: int = 0
    tetrahedral_check: int = 0


def _tetrahedral_centers(mol: Mol) -> np.ndarray:
    """sp3-ish carbons with 4 neighbors: quartets for collapse checks."""
    quads = []
    for i, atom in enumerate(mol.atoms):
        if atom.atomic_num not in (6, 7) or atom.is_aromatic:
            continue
        nbrs = mol.neighbors(i)
        if len(nbrs) == 4:
            quads.append(nbrs)
    return (
        np.asarray(quads, np.int32) if quads else np.zeros((0, 4), np.int32)
    )


def EmbedMolecules(
    molecules: list[Mol],
    params: EmbedParameters | None = None,
    confsPerMolecule: int = 1,
    maxIterations: int = 10,
    hardwareOptions: HardwareOptions | None = None,
    failures: EmbedFailureCounts | None = None,
    torsionProvider=None,
    debugMode: bool = False,
    output=None,
    targetGpu: int = -1,
) -> Dense3DResult:
    """Generate conformers for every molecule; also appends them to each
    ``Mol``'s conformer list. Returns a Dense3DResult (conf_mask marks
    successfully embedded conformers).

    ``output`` follows the reference's ``CoordinateOutput``
    (``nvmolkit/embedMolecules.py:41-53``): the default CONFORMERS
    appends embedded coordinates to each molecule's conformer list;
    DEVICE skips the writeback and hands back only the device-resident
    result (chain it onward with ``positionsFrom=``). ``targetGpu``
    >= 0 selects that chip when ``hardwareOptions.deviceIds`` is
    unset."""
    from nvmolkit_tpu.types import CoordinateOutput as _CO

    params = params or EmbedParameters()
    if not params.useRandomCoords:
        raise ValueError("only useRandomCoords=True is supported")
    opts = hardwareOptions or HardwareOptions()
    if targetGpu >= 0 and not opts.deviceIds:
        opts = dataclasses.replace(opts, deviceIds=[targetGpu])
    fail = failures if failures is not None else EmbedFailureCounts()

    n_mols = len(molecules)
    buckets: dict[int, list[int]] = {}
    for mi, m in enumerate(molecules):
        for b in opts.atomBuckets:
            if m.num_atoms <= b:
                buckets.setdefault(b, []).append(mi)
                break
        else:
            raise ValueError(
                f"molecule {mi} has {m.num_atoms} atoms > largest bucket"
            )

    from nvmolkit_tpu.utils.config import working_dtype as _wd

    max_atoms_out = max(b for b in buckets)
    out_pos = np.zeros((n_mols, confsPerMolecule, max_atoms_out, 3), _wd())
    out_conf_mask = np.zeros((n_mols, confsPerMolecule), bool)
    out_atom_mask = np.zeros((n_mols, max_atoms_out), bool)
    for mi, m in enumerate(molecules):
        out_atom_mask[mi, : m.num_atoms] = True

    key = jax.random.PRNGKey(params.randomSeed)

    from nvmolkit_tpu.utils.profiling import StageTimer

    timer = StageTimer() if debugMode else None
    import os as _os

    _dbg = _os.environ.get("NVMOLKIT_EMBED_DEBUG")
    # _embed_bucket is a prep/drain generator: next() runs the host
    # precompute and dispatches attempt 1's device programs (async),
    # the exhausting drain fetches results and runs the retry loop.
    # Interleaving prep(i+1) before drain(i) hides chunk i+1's host
    # work (bounds, chiral sets, ETK term build — ~0.45 s/1k mols)
    # under chunk i's device minimizations, the reference's
    # OpenMP-preprocessing overlap (etkdg.cpp:172-190).
    pending_gen = None
    for bucket, mol_ids in sorted(buckets.items()):
        # Chunk the (mol, conf) system axis so one launch's working set
        # fits HBM: the DG stage's batched BFGS carries a few copies of
        # the [S, 4A, 4A] inverse Hessian, which at large S on the
        # 128/256-atom buckets exceeds a v5e chip's 16 GB and kills the
        # TPU worker outright. HardwareOptions.batchSize (-1 = auto)
        # overrides the memory-derived cap — the reference's
        # systems-per-dispatch knob (hardware_options.h:26-36).
        cap = opts.batchSize if opts.batchSize > 0 else _embed_chunk_cap(bucket)
        mols_per_chunk = max(1, cap // max(1, confsPerMolecule))
        # NOTE: splitting a single oversized chunk in half to create a
        # pipelining partner was measured SLOWER on v5e (2369 vs 3609
        # conf/s): the DG stage's ~400 sequential while_loop steps do
        # not shrink with batch size, so two half chunks pay the loop
        # latency twice. The generator overlap below therefore only
        # engages for workloads that are already multi-chunk
        # (multi-bucket batches, memory-capped big runs).
        for start in range(0, len(mol_ids), mols_per_chunk):
            if _dbg:
                print(
                    f"[embed] bucket={bucket} chunk={start}:{start + mols_per_chunk}"
                    f" of {len(mol_ids)} mols x {confsPerMolecule} confs",
                    flush=True,
                )
            key, sub = jax.random.split(key)
            gen = _embed_bucket(
                molecules, mol_ids[start : start + mols_per_chunk], bucket,
                confsPerMolecule, maxIterations, params, sub, out_pos,
                out_conf_mask, fail, torsionProvider, timer, opts,
            )
            next(gen)          # prep + attempt-1 dispatch (async)
            if pending_gen is not None:
                next(pending_gen, None)  # drain the previous chunk
            pending_gen = gen
    if pending_gen is not None:
        next(pending_gen, None)
    if timer is not None:
        print(timer.report())

    # RMS pruning during writeback (rdkit_extensions/conformer_pruning role)
    if params.pruneRmsThresh > 0:
        from nvmolkit_tpu.ops.pruning import prune_conformers

        for mi, m in enumerate(molecules):
            conf_ids = np.nonzero(out_conf_mask[mi])[0]
            if len(conf_ids) > 1:
                kept_local = prune_conformers(
                    out_pos[mi, conf_ids, : m.num_atoms], params.pruneRmsThresh
                )
                dropped = set(conf_ids.tolist()) - set(conf_ids[kept_local].tolist())
                for ci in dropped:
                    out_conf_mask[mi, ci] = False

    # writeback to Mol conformer lists (skipped under DEVICE output)
    if output != _CO.DEVICE:
        for mi, m in enumerate(molecules):
            for ci in range(confsPerMolecule):
                if out_conf_mask[mi, ci]:
                    m.add_conformer(
                        out_pos[mi, ci, : m.num_atoms].astype(np.float64)
                    )

    return Dense3DResult(
        positions=jnp.asarray(out_pos),
        conf_mask=jnp.asarray(out_conf_mask),
        atom_mask=jnp.asarray(out_atom_mask),
    )


def _embed_chunk_cap(bucket: int, budget_bytes: float = 3e9) -> int:
    """Max systems per embed launch for one atom bucket.

    Two per-launch bounds:

    * memory — the DG-stage BFGS inverse Hessian ([S, 4A, 4A] f32, ~4
      live copies through the while_loop body) plus the [S, A, A]
      bounds/mask set is ~280*A^2 bytes per system; 3 GB of HBM is
      budgeted per launch.
    * wall time — a single 400-iteration DG minimize launch over more
      than ~4k systems runs long enough to trip the tunneled CI chip's
      RPC watchdog, which kills the TPU worker process outright
      (observed at S=8192, A=32; S=4096 is reliable). 4096 caps every
      bucket.
    """
    per_system = 280.0 * bucket * bucket
    return max(8, min(4096, int(budget_bytes / per_system)))


def _embed_bucket(
    molecules, mol_ids, bucket, confs_per_mol, max_iterations, params, key,
    out_pos, out_conf_mask, fail, torsion_provider=None, timer=None,
    opts=None,
):
    import contextlib

    def stage(name):
        return timer.stage(name) if timer is not None else contextlib.nullcontext()
    A = bucket
    M = len(mol_ids)

    from nvmolkit_tpu.parallel.distributed import resolve_devices

    devices = resolve_devices(opts.deviceIds if opts is not None else [])
    multi = len(devices) > 1

    # f32 default; f64 end-to-end under NVMOLKIT_X64=1 (the reference
    # embeds in f64 throughout, src/forcefields/mmff.h:334-341): every
    # floating array is cast at device-put time so bounds, coordinates
    # and FF math all run in the working dtype
    from nvmolkit_tpu.utils.config import working_dtype

    _wdt = working_dtype()

    def _to_working(x):
        if hasattr(x, "dtype") and np.issubdtype(np.dtype(x.dtype), np.floating):
            return np.asarray(x, _wdt) if isinstance(x, np.ndarray) else x.astype(_wdt)
        return x

    # host: bounds + chiral sets + double-bond check data per unique molecule
    from nvmolkit_tpu.chem.stereo import (
        find_double_bond_ends,
        find_stereo_double_bonds,
    )

    from nvmolkit_tpu.chem.bounds import topological_bounds_batch

    bucket_mols = [molecules[mi] for mi in mol_ids]
    with stage("topological_bounds"):
        # native C++ batch builder (csrc/topo_bounds.cpp); Python
        # per-molecule fallback is the semantic oracle
        batch_bounds = topological_bounds_batch(bucket_mols, A)
    if batch_bounds is not None:
        upper, lower = batch_bounds
    else:
        upper = np.zeros((M, A, A), np.float32)
        lower = np.zeros((M, A, A), np.float32)
    atom_mask = np.zeros((M, A), bool)
    max_chiral = 1
    chiral_data = []
    tetra_data = []
    dbe_data = []
    sdb_data = []
    for k, mi in enumerate(mol_ids):
        m = molecules[mi]
        na = m.num_atoms
        if batch_bounds is None:
            u, l = topological_bounds(m)
            upper[k, :na, :na] = u
            lower[k, :na, :na] = l
        atom_mask[k, :na] = True
        cidx, clb, cub = build_chiral_sets(m)
        chiral_data.append((cidx, clb, cub))
        tq = _tetrahedral_centers(m)
        tetra_data.append(tq)
        max_chiral = max(max_chiral, len(cidx))
        dbe_data.append(find_double_bond_ends(m))
        sdb_data.append(find_stereo_double_bonds(m))
    max_tetra = max(1, max((len(t) for t in tetra_data), default=1))

    C = max_chiral
    chiral_idx = np.zeros((M, C, 4), np.int32)
    chiral_lb = np.zeros((M, C), np.float32)
    chiral_ub = np.zeros((M, C), np.float32)
    chiral_mask = np.zeros((M, C), bool)
    for k, (cidx, clb, cub) in enumerate(chiral_data):
        if len(cidx):
            chiral_idx[k, : len(cidx)] = cidx
            chiral_lb[k, : len(cidx)] = clb
            chiral_ub[k, : len(cidx)] = cub
            chiral_mask[k, : len(cidx)] = True
    T = max_tetra
    tetra_idx = np.zeros((M, T, 4), np.int32)
    tetra_mask = np.zeros((M, T), bool)
    for k, tq in enumerate(tetra_data):
        if len(tq):
            tetra_idx[k, : len(tq)] = tq
            tetra_mask[k, : len(tq)] = True

    # double-bond geometry check triples (i, j, k)
    D = max(1, max((len(d) for d in dbe_data), default=1))
    dbe_idx = np.zeros((M, D, 3), np.int32)
    dbe_mask = np.zeros((M, D), bool)
    for k, triples in enumerate(dbe_data):
        if triples:
            dbe_idx[k, : len(triples)] = triples
            dbe_mask[k, : len(triples)] = True

    # double-bond stereo check quartets + signs (-1 cis, +1 trans)
    Q = max(1, max((len(s) for s in sdb_data), default=1))
    sdb_idx = np.zeros((M, Q, 4), np.int32)
    sdb_sign = np.zeros((M, Q), np.float32)
    sdb_mask = np.zeros((M, Q), bool)
    for k, sdbs in enumerate(sdb_data):
        for q, s in enumerate(sdbs):
            sdb_idx[k, q] = (s.i, s.j, s.k, s.l)
            sdb_sign[k, q] = -1.0 if s.is_cis else 1.0
            sdb_mask[k, q] = True

    # optional ETK 3-D refinement stage (etkdg_stage_etk_minimization
    # role) — provider resolved BEFORE the smoothing dispatch so the
    # host term build below can overlap the smoothing device program
    use_etk = params.useBasicKnowledge or params.useExpTorsionAnglePrefs
    tp = None
    if use_etk:
        from nvmolkit_tpu.models.etk import build_etk_terms, etk_eg, pad_etk_batch

        if params.useExpTorsionAnglePrefs:
            if torsion_provider is None:
                from nvmolkit_tpu.models.etkdg_torsions import (
                    ExperimentalTorsionProvider,
                    default_torsion_provider,
                )

                if params.useSmallRingTorsions or params.useMacrocycleTorsions:
                    tp = ExperimentalTorsionProvider(
                        use_small_rings=params.useSmallRingTorsions,
                        use_macrocycles=params.useMacrocycleTorsions,
                    )
                else:
                    tp = default_torsion_provider()
            else:
                tp = torsion_provider

    # device: triangle smoothing once per unique molecule
    with stage("triangle_smoothing"):
        ub_j, lb_j, consistent = triangle_smooth_bounds(
            jnp.asarray(upper), jnp.asarray(lower), jnp.asarray(atom_mask)
        )
    if use_etk:
        # Host ETK term build (per-molecule torsion matching, the
        # biggest host-side cost at ~1.5 ms/mol) overlapped with the
        # smoothing program the host would otherwise just block on.
        # Results cache on each Mol, so the later _etk_resolved() pad +
        # device put is all that remains before the ETK stage dispatch.
        with stage("etk_term_build"):
            if tp is not None and hasattr(tp, "precompute"):
                # native (C++) batch matcher: one ctypes call matches the
                # whole torsion library over every molecule; the per-mol
                # loop below then only assembles cached claims
                tp.precompute([molecules[mi] for mi in mol_ids])
            from nvmolkit_tpu.models.etk import build_etk_terms_batch

            # whole-chunk vectorized term assembly (caches per Mol)
            build_etk_terms_batch(
                [molecules[mi] for mi in mol_ids], tp,
                force_trans_amides=params.forceTransAmides,
            )
    consistent = np.asarray(consistent)

    # relaxed-bounds retry for smoothing failures: the reference
    # recomputes bounds without 1-5 terms and with vdW scaling, then
    # smooths again (src/embedder_utils.cpp:316-343); with
    # ignoreSmoothingFailures it embeds with the relaxed unsmoothed
    # bounds instead of giving up.
    if not consistent.all():
        retry_rows = np.nonzero(~consistent)[0]
        upper_r = upper[retry_rows].copy()
        lower_r = lower[retry_rows].copy()
        for r, k in enumerate(retry_rows):
            m = molecules[mol_ids[k]]
            na = m.num_atoms
            u, l = topological_bounds(m, relaxed=True)
            upper_r[r, :na, :na] = u
            lower_r[r, :na, :na] = l
        ub_r, lb_r, cons_r = triangle_smooth_bounds(
            jnp.asarray(upper_r), jnp.asarray(lower_r),
            jnp.asarray(atom_mask[retry_rows]),
        )
        ub_j = ub_j.at[retry_rows].set(ub_r)
        lb_j = lb_j.at[retry_rows].set(lb_r)
        cons_r = np.asarray(cons_r)
        consistent[retry_rows] = cons_r
        if params.ignoreSmoothingFailures and not cons_r.all():
            # proceed with relaxed, unsmoothed bounds
            still = retry_rows[~cons_r]
            ub_j = ub_j.at[still].set(jnp.asarray(upper_r[~cons_r]))
            lb_j = lb_j.at[still].set(jnp.asarray(lower_r[~cons_r]))
            consistent[still] = True

    fail.smoothing += int((~consistent).sum()) * confs_per_mol
    ub_np, lb_np = np.asarray(ub_j), np.asarray(lb_j)

    # chiral distance-matrix check pairs: all pairs among atoms that
    # participate in any chiral set, bounded by the smoothed bounds
    # matrix (the reference's ETKDGChiralDistMatrixCheckStage,
    # etkdg_stage_stereochem_checks.cu:615-656).
    cd_pairs_per_mol = []
    for k, (cidx, _clb, _cub) in enumerate(chiral_data):
        atoms_in_sets = sorted(set(np.asarray(cidx).ravel().tolist())) if len(cidx) else []
        pairs = [
            (a, b)
            for x, a in enumerate(atoms_in_sets)
            for b in atoms_in_sets[x + 1 :]
        ]
        cd_pairs_per_mol.append(pairs)
    P = max(1, max((len(p) for p in cd_pairs_per_mol), default=1))
    cd_idx = np.zeros((M, P, 2), np.int32)
    cd_lb = np.zeros((M, P), np.float32)
    cd_ub = np.ones((M, P), np.float32)
    cd_mask = np.zeros((M, P), bool)
    for k, pairs in enumerate(cd_pairs_per_mol):
        for p, (a, b) in enumerate(pairs):
            cd_idx[k, p] = (a, b)
            cd_lb[k, p] = lb_np[k, a, b]
            cd_ub[k, p] = ub_np[k, a, b]
            cd_mask[k, p] = True

    # expand unique molecules -> (mol, conf) systems; with multiple
    # devices the system axis is padded to the device count and every
    # per-system array is row-sharded over the 'mols' mesh axis (the
    # reference's multi-GPU batch assignment, hardware_options.h:26-36)
    sys_mol = np.repeat(np.arange(M), confs_per_mol)       # [S]
    S = len(sys_mol)
    needed = np.ones(S, bool) & consistent[sys_mol]
    if multi and S % len(devices):
        n_pad = len(devices) - S % len(devices)
        sys_mol = np.concatenate([sys_mol, np.zeros(n_pad, sys_mol.dtype)])
        needed = np.concatenate([needed, np.zeros(n_pad, bool)])
        S += n_pad

    if multi:
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as _P

        from nvmolkit_tpu.parallel.mesh import MOL_AXIS, data_parallel_mesh

        _mesh = data_parallel_mesh(devices)

        def _put(x):
            x = _to_working(x)
            spec = _P(MOL_AXIS, *([None] * (x.ndim - 1)))
            return _jax.device_put(x, NamedSharding(_mesh, spec))
    else:
        def _put(x):
            return jnp.asarray(_to_working(x))

    ub_s = _put(ub_np[sys_mol])
    lb_s = _put(lb_np[sys_mol])
    am_s = _put(atom_mask[sys_mol])
    pair_mask = (
        am_s[:, :, None]
        & am_s[:, None, :]
        & jnp.triu(jnp.ones((A, A), bool), 1)[None]
    )
    ub2 = ub_s * ub_s
    lb2 = lb_s * lb_s
    ci_s = _put(chiral_idx[sys_mol])
    clb_s = _put(chiral_lb[sys_mol])
    cub_s = _put(chiral_ub[sys_mol])
    cm_s = _put(chiral_mask[sys_mol])
    ti_s = _put(tetra_idx[sys_mol])
    tm_s = _put(tetra_mask[sys_mol])
    dbe_i_s = _put(dbe_idx[sys_mol])
    dbe_m_s = _put(dbe_mask[sys_mol])
    sdb_i_s = _put(sdb_idx[sys_mol])
    sdb_sg_s = _put(sdb_sign[sys_mol])
    sdb_m_s = _put(sdb_mask[sys_mol])
    cd_i_s = _put(cd_idx[sys_mol])
    cd_lb_s = _put(cd_lb[sys_mol])
    cd_ub_s = _put(cd_ub[sys_mol])
    cd_m_s = _put(cd_mask[sys_mol])

    from nvmolkit_tpu.models.dist_geom import dg_eg

    base_args = {
        "ub2": ub2, "lb2": lb2, "pair_mask": pair_mask,
        "chiral_idx": ci_s, "chiral_lb": clb_s, "chiral_ub": cub_s,
        "chiral_mask": cm_s, "atom_mask": am_s,
    }
    args_first = dict(
        base_args,
        chiral_weight=jnp.float32(params.chiralWeightFirst),
        fourth_dim_weight=jnp.float32(params.fourthDimWeightFirst),
    )
    args_second = dict(
        base_args,
        chiral_weight=jnp.float32(params.chiralWeightSecond),
        fourth_dim_weight=jnp.float32(params.fourthDimWeightSecond),
    )

    if use_etk:
        # Pad + device-put of the (already host-built, Mol-cached) ETK
        # terms, resolved only when the first ETK stage is about to
        # dispatch so it overlaps attempt 1's DG + fourth-dim
        # minimizations (XLA async dispatch).
        _etk_state: dict = {}

        def _etk_resolved():
            if "batch" not in _etk_state:
                from nvmolkit_tpu.models.etk import attach_etk_selection

                etk_host = [
                    build_etk_terms(
                        molecules[mi], tp,
                        force_trans_amides=params.forceTransAmides,
                    )
                    for mi in mol_ids
                ]
                etk_pad = pad_etk_batch(etk_host)
                # merged selection one-hot built ONCE here; without it
                # etk_energy would rebuild it on every minimize step
                _etk_state["batch"] = attach_etk_selection(
                    {k: _put(v[sys_mol]) for k, v in etk_pad.items()}, A
                )
                _etk_state["args"] = {
                    "ub2": ub2, "lb2": lb2, "pair_mask": pair_mask,
                    "etk": _etk_state["batch"], "atom_mask": am_s,
                    "bounds_weight": jnp.float32(1.0),
                }
            return _etk_state

    # Retry compaction: attempt 1 runs the full batch, but later
    # attempts only re-embed the (typically few) still-failing systems.
    # Without this, every retry repeats coordgen + three BFGS stages for
    # ALL systems (the reference instead re-dispatches only unfinished
    # conformers through its Scheduler, etkdg_impl.h:210-233). Sub-batch
    # sizes come from a pow4 ladder so jit recompiles stay bounded.
    dev_quant = len(devices) if multi else 1
    ladder = []
    sz = S
    while True:
        ladder.append(sz)
        nxt = max(16, (sz + 3) // 4)
        nxt = ((nxt + dev_quant - 1) // dev_quant) * dev_quant
        if nxt >= sz:
            break
        sz = nxt
    ladder = sorted(set(ladder))
    tri = jnp.triu(jnp.ones((A, A), bool), 1)[None]
    chk_full = (
        ci_s, clb_s, cub_s, cm_s, ti_s, tm_s, dbe_i_s, dbe_m_s,
        sdb_i_s, sdb_sg_s, sdb_m_s, cd_i_s, cd_lb_s, cd_ub_s, cd_m_s,
    )

    if params.minimizerBackend == "bfgs":
        minimize = batched_bfgs_minimize
    elif params.minimizerBackend == "lbfgs":
        from nvmolkit_tpu.ops.lbfgs import batched_lbfgs_minimize

        minimize = batched_lbfgs_minimize
    elif params.minimizerBackend == "flat":
        from nvmolkit_tpu.ops.lbfgs_flat import batched_lbfgs_flat_minimize

        minimize = batched_lbfgs_flat_minimize
    else:
        raise ValueError(
            f"minimizerBackend must be 'bfgs', 'lbfgs' or 'flat', "
            f"got {params.minimizerBackend!r}"
        )

    check_scalars = (
        jnp.float32(params.maxViolationRatio),
        jnp.float32(params.minTetrahedralVolume),
    )
    stage_iters = (
        params.firstMinimizeIters,
        params.fourthDimMinimizeIters,
        params.etkMinimizeIters,
    )
    dg_weights = (
        jnp.float32(params.chiralWeightFirst),
        jnp.float32(params.fourthDimWeightFirst),
        jnp.float32(params.chiralWeightSecond),
        jnp.float32(params.fourthDimWeightSecond),
    )
    coord_cfg = (
        float(params.boxSizeMult), bool(params.randNegEig),
        int(params.numZeroFail),
    )

    acc_buf = None           # [S, A, 3] device-resident accepted positions
    accepted_sys: list[int] = []

    def _dispatch_attempt(k_att):
        """Dispatch one attempt's device programs (async dispatch only —
        no fetch) and return the row bookkeeping plus device handles;
        None when every system is done."""
        active = np.nonzero(needed)[0]
        if len(active) == 0:
            return None
        sub_S = next(s for s in ladder if s >= len(active))
        if sub_S < S:
            # Oversample: ladder padding lanes run EXTRA independent
            # tries (fresh PRNG rows) of the failing systems instead of
            # discarded placeholder work — any passing duplicate fills
            # the slot, roughly halving the expected rounds to drain
            # the straggler tail.
            idx_np = np.resize(active, sub_S).astype(np.int64)
            row_to_sys = idx_np
            row_valid = np.ones(sub_S, bool)
            # failure counters only consider each system's first row,
            # preserving one-try-per-round counter semantics
            first_row = np.arange(sub_S) < len(active)
        else:
            idx_np = None
            row_to_sys = np.arange(S)
            row_valid = needed.copy()
            first_row = np.ones(S, bool)

        if not multi and sub_S < S:
            # Fused retry: the whole attempt (compaction gathers,
            # coordgen, three minimizations, stereo checks) is ONE
            # device program. The staged path costs ~25 launches per
            # attempt (21 compaction gathers + 5 stages), and on the
            # tunneled chip each launch pays ~30 ms of round-trip
            # latency — more than the sub-batch's compute.
            with stage("fused_retry"):
                pos3, oks_arr = _fused_retry_attempt(
                    minimize, k_att, jnp.asarray(idx_np), ub_s, lb_s, am_s,
                    chk_full,
                    _etk_resolved()["batch"] if use_etk else {},
                    dg_weights, check_scalars, stage_iters, use_etk,
                    coord_cfg,
                )
            oks_dev = oks_arr
        elif not multi:
            # Full-batch attempt in TWO launches: the ETK terms were
            # already built during triangle smoothing (see the
            # etk_term_build stage above), so the DG-stage dispatch here
            # overlaps only the ETK pad + device_put of those Mol-cached
            # terms; the ETK stage + checks then go up as one program.
            with stage("dg_stages"):
                pos3, eig_ok = _fused_dg_stages(
                    minimize, k_att, ub_s, lb_s, am_s, chk_full[:4],
                    dg_weights, stage_iters[:2], coord_cfg,
                )
            etk_b = _etk_resolved()["batch"] if use_etk else {}
            with stage("etk_checks"):
                pos3, oks_arr = _fused_etk_checks(
                    minimize, pos3, ub_s, lb_s, am_s, chk_full, etk_b,
                    check_scalars, stage_iters[2], use_etk,
                )
            oks_dev = jnp.concatenate([eig_ok[None], oks_arr])
        else:
            if sub_S >= S:
                ub_a, lb_a, am_a, pm = ub_s, lb_s, am_s, pair_mask
                a_first, a_second = args_first, args_second
                a_etk = None  # resolved lazily right before the ETK stage
                chk = chk_full
            else:
                sel = jnp.asarray(idx_np)

                def g(x, _sel=sel):
                    return _put(x[_sel])

                ub_a, lb_a, am_a = g(ub_s), g(lb_s), g(am_s)
                pm = am_a[:, :, None] & am_a[:, None, :] & tri
                u2, l2 = ub_a * ub_a, lb_a * lb_a
                base = {
                    "ub2": u2, "lb2": l2, "pair_mask": pm, "atom_mask": am_a,
                    "chiral_idx": g(ci_s), "chiral_lb": g(clb_s),
                    "chiral_ub": g(cub_s), "chiral_mask": g(cm_s),
                }
                a_first = dict(
                    base,
                    chiral_weight=dg_weights[0],
                    fourth_dim_weight=dg_weights[1],
                )
                a_second = dict(
                    base,
                    chiral_weight=dg_weights[2],
                    fourth_dim_weight=dg_weights[3],
                )
                if use_etk:
                    a_etk = {
                        "ub2": u2, "lb2": l2, "pair_mask": pm,
                        "etk": {
                            k: g(v) for k, v in _etk_resolved()["batch"].items()
                        },
                        "atom_mask": am_a, "bounds_weight": jnp.float32(1.0),
                    }
                chk = tuple(g(x) for x in chk_full)

            with stage("coordgen"):
                cg_out = random_distance_matrices(
                    k_att, ub_a, lb_a, am_a, n_dims=4,
                    box_size_mult=coord_cfg[0], rand_neg_eig=coord_cfg[1],
                    num_zero_fail=coord_cfg[2],
                )  # [sub_S, A, 4]
                if coord_cfg[2] > 0:
                    coords4, eig_ok = cg_out
                else:
                    coords4 = cg_out
                    eig_ok = jnp.ones(coords4.shape[0], bool)

            with stage("first_minimization"):
                res1 = minimize(
                    dg_eg, coords4, am_a, max_iters=params.firstMinimizeIters,
                    energy_args=a_first,
                )
            with stage("fourth_dim_minimization"):
                res2 = minimize(
                    dg_eg, res1.positions, am_a,
                    max_iters=params.fourthDimMinimizeIters, energy_args=a_second,
                )
            pos3 = res2.positions[..., :3]  # [sub_S, A, 3]
            if use_etk:
                from nvmolkit_tpu.models.etk import etk_eg

                if a_etk is None:
                    a_etk = _etk_resolved()["args"]
                with stage("etk_minimization"):
                    res3 = minimize(
                        etk_eg, pos3, am_a, max_iters=params.etkMinimizeIters,
                        energy_args=a_etk,
                    )
                pos3 = res3.positions

            with stage("stereo_checks"):
                oks_list = _check_embeddings(
                    pos3, ub_a, lb_a, pm, *chk,
                    params.maxViolationRatio, params.minTetrahedralVolume,
                )
            # one stacked fetch instead of six (each device->host fetch
            # pays a full tunnel round trip)
            oks_dev = jnp.concatenate([eig_ok[None], jnp.stack(oks_list)])
        try:
            # start the device->host copy as soon as the checks finish
            # (the drain's blocking fetch then finds the bytes staged —
            # one tunnel round trip saved per attempt)
            oks_dev.copy_to_host_async()
        except Exception:
            pass
        return row_to_sys, row_valid, first_row, pos3, oks_dev

    key, k0 = jax.random.split(key)
    pending = _dispatch_attempt(k0)
    # ---- prep complete: attempt 1's device programs are in flight ----
    # Yield so EmbedMolecules can run the NEXT chunk's host precompute
    # (bounds, chiral sets, ETK term build) while this chunk's device
    # work executes — the reference overlaps preprocessing with
    # in-flight batches via OpenMP workers (etkdg.cpp:172-190); here the
    # prep/drain generator split plus XLA async dispatch plays that role.
    yield

    names = (
        ("initial_coords",),
        ("bounds_check",),
        ("chiral_check",),
        ("tetrahedral_check",),
        ("double_bond_geometry",),
        ("double_bond_stereo",),
        ("chiral_dist_check",),
    )
    for attempt in range(max_iterations):
        if pending is None:
            break
        row_to_sys, row_valid, first_row, pos3, oks_dev = pending
        oks = list(np.asarray(oks_dev))
        ok = np.ones(len(row_valid), bool)
        passed_so_far = np.ones(len(row_valid), bool)
        for (name,), o in zip(names, oks):
            newly_failed = row_valid & first_row & passed_so_far & ~o
            setattr(fail, name, getattr(fail, name) + int(newly_failed.sum()))
            passed_so_far &= o
            ok &= o

        acc_rows = np.nonzero(row_valid & ok)[0]
        if multi:
            # sharded path: fetch per attempt (a scatter into a shared
            # buffer would force cross-shard resharding)
            pos_np = np.asarray(pos3)
            for j in acc_rows:
                s = row_to_sys[j]
                mi = mol_ids[sys_mol[s]]
                ci = s % confs_per_mol
                na = molecules[mi].num_atoms
                out_pos[mi, ci, :na] = pos_np[j, :na]
                out_conf_mask[mi, ci] = True
                needed[s] = False
        else:
            # device-resident acceptance: scatter the passing rows into
            # a per-chunk [S, A, 3] buffer and fetch positions ONCE at
            # the end of the chunk — the per-attempt position fetch was
            # a full tunnel round trip each (the reference's analog
            # keeps accepted conformers in device memory until the
            # final collect, etkdg_impl.h:210-286)
            if len(acc_rows):
                if acc_buf is None:
                    acc_buf = jnp.zeros((S, A, 3), pos3.dtype)
                n_pad = 1 << max(3, int(np.ceil(np.log2(len(acc_rows)))))
                src = np.zeros(n_pad, np.int32)
                src[: len(acc_rows)] = acc_rows
                dst = np.full(n_pad, S, np.int32)  # pads scatter-drop
                dst[: len(acc_rows)] = row_to_sys[acc_rows]
                acc_buf = _scatter_accept(
                    acc_buf, pos3, jnp.asarray(src), jnp.asarray(dst)
                )
            for j in acc_rows:
                s = row_to_sys[j]
                mi = mol_ids[sys_mol[s]]
                ci = s % confs_per_mol
                out_conf_mask[mi, ci] = True
                needed[s] = False
                accepted_sys.append(int(s))

        if attempt + 1 < max_iterations:
            key, k_att = jax.random.split(key)
            pending = _dispatch_attempt(k_att)
        else:
            pending = None

    if acc_buf is not None and accepted_sys:
        pos_all = np.asarray(acc_buf)  # ONE fetch per chunk
        for s in accepted_sys:
            mi = mol_ids[sys_mol[s]]
            ci = s % confs_per_mol
            na = molecules[mi].num_atoms
            out_pos[mi, ci, :na] = pos_all[s, :na]


@jax.jit
def _scatter_accept(buf, pos3, src_idx, dst_idx):
    """buf[dst] = pos3[src]; dst pads point past the buffer (dropped)."""
    return buf.at[dst_idx].set(pos3[src_idx], mode="drop")


import functools as _functools


def _dg_stages_impl(
    minimize, key, ub, lb, am, chiral, dg_weights, dg_iters, coord_cfg
):
    """coordgen + first + fourth-dim minimizations (traced helper).

    ``coord_cfg`` = (boxSizeMult, randNegEig, numZeroFail) — static.
    Returns (pos3, eig_ok) where eig_ok flags systems that passed the
    numZeroFail eigen-rank check (all-True when the check is off)."""
    from nvmolkit_tpu.models.dist_geom import dg_eg

    A = ub.shape[1]
    tri = jnp.triu(jnp.ones((A, A), bool), 1)[None]
    pm = am[:, :, None] & am[:, None, :] & tri
    base = {
        "ub2": ub * ub, "lb2": lb * lb, "pair_mask": pm, "atom_mask": am,
        "chiral_idx": chiral[0], "chiral_lb": chiral[1],
        "chiral_ub": chiral[2], "chiral_mask": chiral[3],
    }
    a_first = dict(
        base, chiral_weight=dg_weights[0], fourth_dim_weight=dg_weights[1]
    )
    a_second = dict(
        base, chiral_weight=dg_weights[2], fourth_dim_weight=dg_weights[3]
    )
    box, rand_neg, num_zero = coord_cfg
    out = random_distance_matrices(
        key, ub, lb, am, n_dims=4,
        box_size_mult=box, rand_neg_eig=rand_neg, num_zero_fail=num_zero,
    )
    if num_zero > 0:
        coords4, eig_ok = out
    else:
        coords4 = out
        eig_ok = jnp.ones(ub.shape[0], bool)
    res1 = minimize(
        dg_eg, coords4, am, max_iters=dg_iters[0], energy_args=a_first
    )
    res2 = minimize(
        dg_eg, res1.positions, am, max_iters=dg_iters[1], energy_args=a_second
    )
    return res2.positions[..., :3], eig_ok


def _etk_checks_impl(
    minimize, pos3, ub, lb, am, chk, etk_batch, check_scalars, etk_iters, use_etk
):
    """Optional ETK 3-D refinement + the six stereo checks (traced)."""
    A = ub.shape[1]
    tri = jnp.triu(jnp.ones((A, A), bool), 1)[None]
    pm = am[:, :, None] & am[:, None, :] & tri
    if use_etk:
        from nvmolkit_tpu.models.etk import etk_eg

        a_etk = {
            "ub2": ub * ub, "lb2": lb * lb, "pair_mask": pm,
            "etk": etk_batch, "atom_mask": am,
            "bounds_weight": jnp.float32(1.0),
        }
        pos3 = minimize(
            etk_eg, pos3, am, max_iters=etk_iters, energy_args=a_etk
        ).positions
    oks = _check_embeddings(pos3, ub, lb, pm, *chk, *check_scalars)
    return pos3, jnp.stack(oks)


@_functools.partial(
    jax.jit, static_argnames=("minimize", "dg_iters", "coord_cfg")
)
def _fused_dg_stages(
    minimize, key, ub, lb, am, chiral, dg_weights, dg_iters, coord_cfg
):
    return _dg_stages_impl(
        minimize, key, ub, lb, am, chiral, dg_weights, dg_iters, coord_cfg
    )


@_functools.partial(jax.jit, static_argnames=("minimize", "etk_iters", "use_etk"))
def _fused_etk_checks(
    minimize, pos3, ub, lb, am, chk, etk_batch, check_scalars, etk_iters, use_etk
):
    return _etk_checks_impl(
        minimize, pos3, ub, lb, am, chk, etk_batch, check_scalars,
        etk_iters, use_etk,
    )


@_functools.partial(
    jax.jit, static_argnames=("minimize", "stage_iters", "use_etk", "coord_cfg")
)
def _fused_retry_attempt(
    minimize, key, sel, ub_s, lb_s, am_s, chk_full, etk_batch,
    dg_weights, check_scalars, stage_iters, use_etk, coord_cfg,
):
    """One whole retry attempt as a single device program.

    Gathers the still-failing systems out of the full-batch arrays,
    regenerates coordinates, runs the three minimization stages and the
    stereo checks — one launch, one (pos3, oks) result where oks row 0
    is the numZeroFail eigen-rank check. The reference keeps retries
    on-device through its CUDA-graph Scheduler
    (``etkdg_impl.h:210-233``); this is the XLA equivalent.
    """

    def take(x):
        return x[sel]

    ub, lb, am = take(ub_s), take(lb_s), take(am_s)
    chk = tuple(take(x) for x in chk_full)
    pos3, eig_ok = _dg_stages_impl(
        minimize, key, ub, lb, am, chk[:4], dg_weights, stage_iters[:2],
        coord_cfg,
    )
    pos3, oks = _etk_checks_impl(
        minimize, pos3, ub, lb, am, chk,
        {k: take(v) for k, v in etk_batch.items()},
        check_scalars, stage_iters[2], use_etk,
    )
    return pos3, jnp.concatenate([eig_ok[None], oks], axis=0)


@jax.jit
def _check_embeddings(
    pos3, ub, lb, pair_mask, chiral_idx, chiral_lb, chiral_ub, chiral_mask,
    tetra_idx, tetra_mask, dbe_idx, dbe_mask, sdb_idx, sdb_sign, sdb_mask,
    cd_idx, cd_lb, cd_ub, cd_mask, max_violation_ratio, min_tetra_volume,
):
    """Vectorized acceptance checks (the reference's stereochem-check
    stages, etkdg_stage_stereochem_checks.h:55-195): bounds violation,
    chiral volume, tetrahedral collapse, double-bond geometry
    (linearity), double-bond E/Z stereo, and chiral distance-matrix."""
    S, A, _ = pos3.shape
    diff = pos3[:, :, None, :] - pos3[:, None, :, :]
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    ratio_hi = jnp.where(pair_mask, d / jnp.maximum(ub, 1e-6) - 1.0, 0.0)
    ratio_lo = jnp.where(pair_mask, lb / jnp.maximum(d, 1e-6) - 1.0, 0.0)
    worst = jnp.maximum(jnp.max(ratio_hi, axis=(1, 2)), jnp.max(ratio_lo, axis=(1, 2)))
    ok_bounds = worst < max_violation_ratio

    flat = pos3.reshape(S * A, 3)

    def gather_pts(idx):  # [S, K, Q] -> [S, K, Q, 3]
        K, Qa = idx.shape[1], idx.shape[2]
        base = (jnp.arange(S)[:, None, None] * A + idx).reshape(S * K * Qa)
        return flat[base].reshape(S, K, Qa, 3)

    def vol(idx):  # [S, K, 4] -> [S, K]
        pts = gather_pts(idx)
        v1 = pts[:, :, 0] - pts[:, :, 3]
        v2 = pts[:, :, 1] - pts[:, :, 3]
        v3 = pts[:, :, 2] - pts[:, :, 3]
        return jnp.sum(v1 * jnp.cross(v2, v3), axis=-1)

    cvol = vol(chiral_idx)
    c_ok = (cvol >= chiral_lb) & (cvol <= chiral_ub)
    ok_chiral = jnp.all(jnp.where(chiral_mask, c_ok, True), axis=1)

    tvol = jnp.abs(vol(tetra_idx))
    t_ok = tvol > min_tetra_volume
    ok_tetra = jnp.all(jnp.where(tetra_mask, t_ok, True), axis=1)

    # double-bond geometry: unit(p_j - p_i) . unit(p_j - p_k) must not be
    # -1 (linear collapse); tolerance 1e-3 per the reference kernel
    # (etkdg_stage_stereochem_checks.cu doubleBondGeometryKernel).
    dpts = gather_pts(dbe_idx)  # [S, D, 3(atoms), 3(xyz)]
    u1 = dpts[:, :, 1] - dpts[:, :, 0]
    u2 = dpts[:, :, 1] - dpts[:, :, 2]
    n1 = jnp.sqrt(jnp.sum(u1 * u1, axis=-1) + 1e-12)
    n2 = jnp.sqrt(jnp.sum(u2 * u2, axis=-1) + 1e-12)
    ddot = jnp.sum(u1 * u2, axis=-1) / (n1 * n2)
    g_ok = (ddot + 1.0) >= 1e-3
    ok_dbgeom = jnp.all(jnp.where(dbe_mask, g_ok, True), axis=1)

    # double-bond stereo: sign of the angle between the two flanking
    # cross products around the bond axis; sign = -1 for cis/Z. The
    # conformer fails when sign * cos(angle) > 0 (reference
    # doubleBondStereoKernel: fail if (angle - pi/2) * sign < 0).
    spts = gather_pts(sdb_idx)  # quartet (i, j, k, l)
    axis = spts[:, :, 2] - spts[:, :, 1]          # j -> k
    c1 = jnp.cross(spts[:, :, 0] - spts[:, :, 1], axis)
    c2 = jnp.cross(spts[:, :, 3] - spts[:, :, 2], axis)
    denom = jnp.sqrt(
        jnp.sum(c1 * c1, axis=-1) * jnp.sum(c2 * c2, axis=-1) + 1e-12
    )
    cosang = jnp.sum(c1 * c2, axis=-1) / denom
    s_ok = (sdb_sign * cosang) <= 0.0
    ok_dbstereo = jnp.all(jnp.where(sdb_mask, s_ok, True), axis=1)

    # chiral distance-matrix check: pairs of chiral-set atoms must stay
    # within the (smoothed) bounds with a 0.1 * upper slack (reference
    # chiralDistMatrixCheck kernel).
    cpts = gather_pts(cd_idx)  # [S, P, 2, 3]
    cdiff = cpts[:, :, 0] - cpts[:, :, 1]
    cdist = jnp.sqrt(jnp.sum(cdiff * cdiff, axis=-1) + 1e-12)
    slack = 0.1 * cd_ub
    bad = ((cdist < cd_lb) & (cd_lb - cdist > slack)) | (
        (cdist > cd_ub) & (cdist - cd_ub > slack)
    )
    ok_cdist = jnp.all(jnp.where(cd_mask, ~bad, True), axis=1)
    return ok_bounds, ok_chiral, ok_tetra, ok_dbgeom, ok_dbstereo, ok_cdist
