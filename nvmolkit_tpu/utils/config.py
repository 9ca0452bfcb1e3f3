"""Hardware/batching configuration.

TPU-native analog of the reference's ``BatchHardwareOptions``
(``src/hardware_options.h:26-36``) / Python ``HardwareOptions``
(``nvmolkit/types.py:26-122``): the knobs that autotune searches over and
users thread through batch APIs. GPU ids / streams become TPU mesh axes
and bucket sizes.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any


@dataclasses.dataclass
class HardwareOptions:
    """Batching/scheduling knobs threaded through batch APIs.

    Mirrors the reference semantics (``-1`` means "auto"):
      * ``preprocessingThreads`` — host threads for featurization /
        parametrization (the reference's OpenMP preprocessing pool).
      * ``batchSize`` — systems per device dispatch.
      * ``batchesPerDevice`` — in-flight batches per chip (XLA async
        dispatch depth; the reference's ``batchesPerGpu`` stream count).
      * ``deviceIds`` — which chips to use; empty = all
        (the reference's ``gpuIds``).
      * ``atomBuckets`` — pad-to sizes for molecule bucketing (TPU-only
        knob; replaces the reference's fixed 32/64/128 size classes).
    """

    preprocessingThreads: int = -1
    batchSize: int = -1
    batchesPerDevice: int = -1
    deviceIds: list[int] = dataclasses.field(default_factory=list)
    # Finer low-end granularity pays directly in the minimizers: the
    # nonbonded pair tables and eval work scale with A^2, and a 17-atom
    # drug-like molecule in a 24-bucket runs ~19% faster per BFGS step
    # than in a 32-bucket (round-4 v5e measurement). Each populated
    # bucket costs one XLA compile (cached), so granularity stays
    # coarser as sizes grow.
    atomBuckets: tuple[int, ...] = (16, 24, 32, 48, 64, 96, 128, 192, 256)
    # reference spellings accepted as constructor aliases
    # (``HardwareOptions(batchSize=200, batchesPerGpu=4, gpuIds=[0])``,
    # ``nvmolkit/types.py:39-90``); canonical fields win when both given
    batchesPerGpu: dataclasses.InitVar[int | None] = None
    gpuIds: dataclasses.InitVar["list[int] | None"] = None

    _FIELDS = (
        "preprocessingThreads",
        "batchSize",
        "batchesPerDevice",
        "deviceIds",
        "atomBuckets",
    )

    def __post_init__(
        self, batchesPerGpu: int | None = None, gpuIds: "list[int] | None" = None
    ) -> None:
        if batchesPerGpu is not None and self.batchesPerDevice == -1:
            self.batchesPerDevice = batchesPerGpu
        if gpuIds is not None and not self.deviceIds:
            self.deviceIds = list(gpuIds)
        for name in ("preprocessingThreads", "batchSize", "batchesPerDevice"):
            v = getattr(self, name)
            if not isinstance(v, int) or (v < 1 and v != -1):
                raise ValueError(f"{name} must be a positive int or -1 (auto), got {v!r}")
        if not all(isinstance(d, int) and d >= 0 for d in self.deviceIds):
            raise ValueError(f"deviceIds must be non-negative ints, got {self.deviceIds!r}")
        buckets = tuple(int(b) for b in self.atomBuckets)
        if not buckets or any(b < 1 for b in buckets) or list(buckets) != sorted(set(buckets)):
            raise ValueError(f"atomBuckets must be strictly increasing positive ints, got {self.atomBuckets!r}")
        self.atomBuckets = buckets

    def to_dict(self) -> dict[str, Any]:
        return {
            "preprocessingThreads": self.preprocessingThreads,
            "batchSize": self.batchSize,
            "batchesPerDevice": self.batchesPerDevice,
            "deviceIds": list(self.deviceIds),
            "atomBuckets": list(self.atomBuckets),
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "HardwareOptions":
        aliases = {"batchesPerGpu", "gpuIds"}
        unknown = set(d) - set(cls._FIELDS) - aliases
        if unknown:
            # Reference rejects unknown keys on JSON round-trip (types.py:111-122).
            raise ValueError(f"Unknown HardwareOptions keys: {sorted(unknown)}")
        kwargs = dict(d)
        if "atomBuckets" in kwargs:
            kwargs["atomBuckets"] = tuple(kwargs["atomBuckets"])
        return cls(**kwargs)

    def to_json(self) -> str:
        return json.dumps(self.to_dict())

    @classmethod
    def from_json(cls, s: str) -> "HardwareOptions":
        return cls.from_dict(json.loads(s))


# Reference-spelling read accessors (assigned post-class so the
# dataclass InitVar machinery keeps the constructor aliases above).
HardwareOptions.batchesPerGpu = property(lambda self: self.batchesPerDevice)
HardwareOptions.gpuIds = property(lambda self: list(self.deviceIds))


def working_dtype():
    """Position/energy dtype for the batch pipelines.

    f32 by default (TPU-first); numpy float64 when the package runs in
    double-precision mode (``NVMOLKIT_X64=1`` before import, or
    ``jax_enable_x64`` flipped by the embedding application) — the
    reference's precision contract (``src/forcefields/mmff.h:334-341``).
    """
    import jax
    import numpy as np

    return np.float64 if jax.config.jax_enable_x64 else np.float32
