"""Persistence for trained driver-side model state (tokenizers, PQ
codebooks) — the production seam between a training job and the fleet of
encode jobs that reuse its output.

Every trainer in this engine deliberately keeps its learned state small
and driver-resident (word-type merge lists, piece log-probs, codebook
tensors — kilobytes to low megabytes), which is exactly what makes the
encode path a broadcast scan. This module gives that state a stable
on-disk form: one JSON file, version-tagged, human-diffable, engine-
independent (nothing pickled — a Rust/DuckDB consumer can read it).

Round-trip contract (pinned in tests): ``load_model(save_model(m))``
encodes byte-identically to ``m``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

_FORMAT_VERSION = 1


def _to_dict(model: Any) -> dict:
    import numpy as np

    from datapump_spark.operators.bpe import BpeModel
    from datapump_spark.operators.unigram import UnigramModel

    if isinstance(model, BpeModel):
        return {"kind": "bpe", "merges": [list(m) for m in model.merges],
                "vocab": model.vocab}
    if isinstance(model, UnigramModel):
        return {"kind": "unigram", "logp": model.logp,
                "max_piece_len": model.max_piece_len}
    if isinstance(model, np.ndarray):
        return {"kind": "ndarray", "shape": list(model.shape),
                "dtype": str(model.dtype),
                "data": [float(x) for x in model.reshape(-1)]}
    raise TypeError(f"no persistence for {type(model).__name__}")


def _from_dict(d: dict) -> Any:
    import numpy as np

    from datapump_spark.operators.bpe import BpeModel
    from datapump_spark.operators.unigram import UnigramModel

    kind = d["kind"]
    if kind == "bpe":
        return BpeModel(merges=[tuple(m) for m in d["merges"]],
                        vocab=list(d["vocab"]))
    if kind == "unigram":
        return UnigramModel(logp=dict(d["logp"]),
                            max_piece_len=int(d["max_piece_len"]))
    if kind == "ndarray":
        return np.asarray(d["data"], dtype=d["dtype"]) \
            .reshape(tuple(d["shape"]))
    raise ValueError(f"unknown model kind {kind!r}")


def save_model(model: Any, path: str | Path) -> None:
    """Write ``model`` as version-tagged JSON (atomic: tmp + rename, so a
    concurrent encode job never sees a torn file)."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.with_name(p.name + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"format_version": _FORMAT_VERSION, **_to_dict(model)}, f)
    tmp.replace(p)


def load_model(path: str | Path) -> Any:
    with open(path) as f:
        d = json.load(f)
    v = d.get("format_version")
    if v != _FORMAT_VERSION:
        raise ValueError(f"unsupported model format_version {v!r}")
    return _from_dict(d)
