"""Checkpoint / resume for walker state.

The reference has NO checkpointing: field configuration and RNG state are
never persisted, every run starts from a random field and a wall-clock seed
(SURVEY.md section 5; field.h:52-57, main.cpp:37).  Here the entire Markov
chain state is one pytree (engine/state.py), so checkpointing is just
serializing its leaves plus a config fingerprint; resume restores the exact
chain (same key stream) and continues appending bins.

Format: a single .npz with the flattened state leaves plus metadata.
Writes are atomic (tmp file + rename) so an interrupted run never corrupts
the previous checkpoint.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Tuple

import jax
import numpy as np

# Bump whenever the state pytree's leaf structure changes (a loaded
# checkpoint from another version would otherwise fail with a raw
# KeyError/shape error instead of a diagnosis).  History:
#   1  round <=3 implicit format (no version field; LDRdf without the
#      exponent channel)
#   2  LDRdf grew the exponent-split `e` leaf (d425809)
FORMAT_VERSION = 2


def save_checkpoint(path: str | os.PathLike, states, meta: Dict[str, Any]) -> None:
    """Persist a walker-state pytree and a JSON-able metadata dict."""
    leaves, treedef = jax.tree_util.tree_flatten(states)
    payload = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    payload["__meta__"] = np.frombuffer(
        json.dumps({**meta, "format_version": FORMAT_VERSION,
                    "n_leaves": len(leaves),
                    "treedef": str(treedef)}).encode(), dtype=np.uint8)
    d = os.path.dirname(str(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".ckpt.tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            np.savez(fh, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str | os.PathLike, template) -> Tuple[Any, Dict[str, Any]]:
    """Restore a pytree saved by save_checkpoint.

    `template` supplies the treedef (e.g. a freshly initialized state of the
    same configuration); leaf shapes/dtypes are validated against it.
    """
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        leaves, treedef = jax.tree_util.tree_flatten(template)
        ver = meta.get("format_version", 1)
        if ver != FORMAT_VERSION:
            raise ValueError(
                f"checkpoint format version {ver} != current "
                f"{FORMAT_VERSION} (e.g. a pre-exponent-channel LDRdf "
                f"checkpoint cannot be loaded by this version) — restart "
                f"the run or migrate the checkpoint")
        n_saved = meta.get("n_leaves")
        if n_saved is not None and n_saved != len(leaves):
            raise ValueError(
                f"checkpoint has {n_saved} state leaves but the current "
                f"configuration expects {len(leaves)} — wrong checkpoint "
                f"for this run?")
        loaded = []
        for i, leaf in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            want = np.asarray(leaf)
            if arr.shape != want.shape:
                raise ValueError(
                    f"checkpoint leaf {i} shape {arr.shape} does not match "
                    f"current configuration {want.shape} — wrong checkpoint "
                    f"for this run?")
            loaded.append(jax.numpy.asarray(arr, dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, loaded), meta


def peek_meta(path: str | os.PathLike) -> Dict[str, Any]:
    """Read only the metadata dict of a checkpoint (cheap: no leaf loads).

    Needed before state construction when metadata determines array
    shapes — e.g. the auto-adapted n_stab sets the LDR stack's slot
    count, so run.py must know it before init_state."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
    meta.pop("treedef", None)
    return meta
