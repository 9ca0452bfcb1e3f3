"""JSON persistence of tuned configurations.

Mirrors the reference's ``autotune/_persistence.py:35-53``: tuned
``HardwareOptions`` / ``SubstructSearchConfig`` round-trip through JSON
with unknown-key rejection.
"""
from __future__ import annotations

import dataclasses
import enum
import json
from pathlib import Path

from nvmolkit_tpu.substructure import SubstructSearchConfig
from nvmolkit_tpu.utils.config import HardwareOptions

_KINDS = {
    "HardwareOptions": HardwareOptions,
    "SubstructSearchConfig": SubstructSearchConfig,
}


def save_options(path, options) -> None:
    kind = type(options).__name__
    if kind not in _KINDS:
        raise TypeError(f"cannot persist {kind}")
    if isinstance(options, HardwareOptions):
        payload = options.to_dict()
    else:
        payload = {
            k: (v.value if isinstance(v, enum.Enum) else v)
            for k, v in dataclasses.asdict(options).items()
        }
    Path(path).write_text(json.dumps({"kind": kind, "options": payload}, indent=2))


def load_options(path):
    data = json.loads(Path(path).read_text())
    kind = data.get("kind")
    if kind not in _KINDS:
        raise ValueError(f"unknown options kind {kind!r}")
    if kind == "HardwareOptions":
        return HardwareOptions.from_dict(data["options"])
    cls = _KINDS[kind]
    fields = {f.name for f in dataclasses.fields(cls)}
    unknown = set(data["options"]) - fields
    if unknown:
        raise ValueError(f"unknown {kind} keys: {sorted(unknown)}")
    kwargs = dict(data["options"])
    if kind == "SubstructSearchConfig" and isinstance(kwargs.get("algorithm"), str):
        from nvmolkit_tpu.substructure import SubstructAlgorithm

        kwargs["algorithm"] = SubstructAlgorithm(kwargs["algorithm"])
    return cls(**kwargs)
