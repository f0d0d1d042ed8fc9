"""Checkpoint / resume for closed-loop rollout state.

The reference keeps all state in-memory with no persistence (SURVEY.md
section 5). Here the rollout state between scan segments is a plain
pytree (plant state, measurement windows, solver warm-start, step
index, PRNG key), so checkpointing is a flatten + savez and resume is
deterministic from (seed, segment index) -- noise for segment ``i`` is
drawn from ``fold_in(key, i)``, independent of how execution was
partitioned into runs.

Orbax is available in this image for large-scale multi-host
checkpointing; for the state sizes of this domain (a few KB to a few
MB) an atomic ``.npz`` is simpler and dependency-light. The format
stores the flattened leaves plus the treedef repr for validation.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def jnp_asarray_u32(x: np.ndarray) -> "jnp.ndarray":
    return jnp.asarray(x, dtype=jnp.uint32)


def _is_prng_key(x: Any) -> bool:
    return hasattr(x, "dtype") and jax.dtypes.issubdtype(
        x.dtype, jax.dtypes.prng_key
    )


def save_checkpoint(path: str, state: Any, metadata: dict | None = None):
    """Atomically save a pytree checkpoint to ``path`` (.npz). Typed
    PRNG keys are stored as their raw key data and re-wrapped on load."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {
        f"leaf_{i}": np.asarray(
            jax.random.key_data(x) if _is_prng_key(x) else x
        )
        for i, x in enumerate(leaves)
    }

    def _jsonable(v):
        # Metadata values routinely arrive as numpy/JAX scalars or
        # arrays (e.g. a segment index loaded from a previous
        # checkpoint); plain json.dumps rejects them.
        if isinstance(v, (np.generic, np.ndarray)) or hasattr(
            v, "tolist"
        ):
            return np.asarray(v).tolist()
        return v

    meta = {
        "treedef": str(treedef),
        "n_leaves": len(leaves),
        "metadata": {
            k: _jsonable(v) for k, v in (metadata or {}).items()
        },
    }
    out_dir = os.path.dirname(os.path.abspath(path))
    os.makedirs(out_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, __meta__=json.dumps(meta), **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_checkpoint(path: str, like: Any) -> Tuple[Any, dict]:
    """Load a checkpoint saved by :func:`save_checkpoint`.

    ``like`` provides the pytree structure (e.g. a freshly-initialized
    state of the same shape). Returns ``(state, metadata)``.

    Raises:
        ValueError: if the stored structure does not match ``like``.
    """
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["__meta__"]))
        leaves_like, treedef = jax.tree.flatten(like)
        if meta["n_leaves"] != len(leaves_like):
            raise ValueError(
                f"Checkpoint has {meta['n_leaves']} leaves; template has "
                f"{len(leaves_like)}."
            )
        if meta["treedef"] != str(treedef):
            raise ValueError(
                "Checkpoint pytree structure does not match the "
                f"template: stored {meta['treedef']}, template "
                f"{treedef}."
            )
        leaves = [data[f"leaf_{i}"] for i in range(meta["n_leaves"])]
        for i, tmpl in enumerate(leaves_like):
            if _is_prng_key(tmpl):
                leaves[i] = jax.random.wrap_key_data(
                    jnp_asarray_u32(leaves[i]),
                    impl=jax.random.key_impl(tmpl),
                )
            elif leaves[i].shape != np.shape(tmpl):
                raise ValueError(
                    f"Leaf {i} shape mismatch: checkpoint "
                    f"{leaves[i].shape} vs template {np.shape(tmpl)}."
                )
        state = jax.tree.unflatten(treedef, leaves)
    return state, meta["metadata"]
