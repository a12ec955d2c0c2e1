"""Checkpointing: full train-state via Orbax + reference-style model-only
artifacts.

The reference saves three model-only files per run — ``{name}_last`` every
epoch, ``{name}_best`` on best avg loss, ``{name}`` final — all under EMA
weights (`Train_Orignal.py:323-336`) and never persists optimizer state
(SURVEY.md §5: resume impossible). Here:

* ``save_state / restore_state`` — full resume (params + opt + EMA + step)
  via Orbax, the piece the reference lacks.
* ``save_model / load_model`` — msgpack (flax.serialization) model-only
  artifacts mirroring the last/best/final-EMA triple.
* reference ``.pth`` files load through s1s2.models.convert.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def save_model(params: Any, path: str) -> None:
    """Serialize a params pytree to msgpack (host numpy)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host))


def load_model(template: Any, path: str) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    try:
        return serialization.from_bytes(template, data)
    except (ValueError, KeyError) as e:
        raise ValueError(
            f"checkpoint {path!r} does not match the model architecture "
            "(check --base_ch and the dataset's channel counts); "
            f"underlying error: {e}"
        ) from e


def load_any_checkpoint(path: str, template: Optional[Any] = None):
    """Dispatch: ``.pth`` → torch converter, ``.msgpack`` → flax, else orbax
    directory. Returns a ``{"params": ...}`` variables dict for ``.pth`` and
    a bare params pytree otherwise (caller wraps)."""
    if path.endswith(".pth"):
        from s1s2.models.convert import load_pth_checkpoint

        return load_pth_checkpoint(path)
    if os.path.isfile(path):
        if template is None:
            raise ValueError("msgpack load requires a params template")
        return load_model(template, path)
    return restore_state(path)


# -- full state (orbax) -------------------------------------------------------


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_state(state: Any, path: str) -> None:
    _ckptr().save(os.path.abspath(path), jax.tree_util.tree_map(np.asarray, state), force=True)


def restore_state(path: str, template: Optional[Any] = None) -> Any:
    if template is not None:
        return _ckptr().restore(os.path.abspath(path), item=template)
    return _ckptr().restore(os.path.abspath(path))


def load_params(path: str, template: Any) -> Any:
    """Load ANY checkpoint form and return a BARE params pytree.

    Normalizes the three shapes ``load_any_checkpoint`` can produce:
    reference ``.pth`` → ``{"params": ...}`` variables (unwrap), msgpack
    model files → bare params (pass through), orbax full-state dirs →
    train state (take the EMA params). Use this wherever code needs just
    weights and must honor the "reference .pth loads anywhere a ckpt is
    accepted" contract."""
    loaded = load_any_checkpoint(path, template=template)
    if isinstance(loaded, dict):
        if set(loaded.keys()) == {"params"}:
            return loaded["params"]
        for key in ("ema_params", "params"):
            if key in loaded:
                return loaded[key]
    if hasattr(loaded, "ema_params"):
        return loaded.ema_params
    return loaded


def reference_artifact_paths(model_path: str):
    """``x.msgpack`` → (final, last, best) mirroring the reference's
    ``.pth → _last/_best`` naming (`Train_Orignal.py:268-269`)."""
    root, ext = os.path.splitext(model_path)
    return model_path, f"{root}_last{ext}", f"{root}_best{ext}"
