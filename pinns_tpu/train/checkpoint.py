"""Pytree checkpoint / resume.

The reference has NO weight checkpointing — only prediction-snapshot CSVs;
training cannot be resumed (SURVEY.md §5.4). Here the full training state
(params + optimizer state + ADMM state + collocation set + PRNG key + epoch)
serializes via flax msgpack, so a run restores bit-exactly and continues.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
from flax import serialization


def _is_key(x) -> bool:
    return hasattr(x, "dtype") and jax.dtypes.issubdtype(
        x.dtype, jax.dtypes.prng_key
    )


def _unwrap_keys(tree):
    """Typed PRNG keys -> raw uint32 data (msgpack can't serialize them)."""
    return jax.tree_util.tree_map(
        lambda x: jax.random.key_data(x) if _is_key(x) else x, tree
    )


def _rewrap_keys(tree, template):
    return jax.tree_util.tree_map(
        lambda x, t: jax.random.wrap_key_data(x) if _is_key(t) else x,
        tree,
        template,
    )


def save_checkpoint(path: str, state: Any, meta: Optional[Dict] = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # device -> host before serializing
    host_state = jax.device_get(_unwrap_keys(state))
    blob = serialization.to_bytes(host_state)
    with open(path, "wb") as fh:
        fh.write(blob)
    with open(path + ".json", "w") as fh:
        json.dump(meta or {}, fh)


def load_checkpoint(path: str, template: Any) -> Any:
    """Restore into `template` (a state with the same pytree structure)."""
    with open(path, "rb") as fh:
        blob = fh.read()
    restored = serialization.from_bytes(_unwrap_keys(template), blob)
    return _rewrap_keys(restored, template)


def load_meta(path: str) -> Dict:
    try:
        with open(path + ".json") as fh:
            return json.load(fh)
    except FileNotFoundError:  # checkpoints written without a sidecar
        return {}
