"""Checkpoint / resume via Orbax.

Reference counterpart: torch.save dicts of {model_state_dict, optimizer,
epoch, tr/val loss arrays} every N epochs + best-model save
(trainer.py:88-99, :126-139) and resume from config (trainer.py:54-71), plus
cross-stage hand-off of the frozen MISO1 parameters into enhancement
training/testing (run.py:101-109, :137-145).

Layout: <dir>/<step_or_tag>/ via orbax StandardCheckpointer; the train state
pytree (params, opt_state, step) plus a host-side metadata dict (epoch, loss
history, scheduler state).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(
    directory: str | Path,
    tag: str,
    state: Any,
    metadata: dict | None = None,
) -> Path:
    """Save a pytree under <directory>/<tag> (e.g. 'epoch005', 'best')."""
    path = (Path(directory) / tag).absolute()
    if path.exists():
        import shutil

        shutil.rmtree(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state))
    if metadata is not None:
        (path.parent / f"{tag}.meta.json").write_text(
            json.dumps(metadata, default=_json_default)
        )
    return path


def load_checkpoint(
    directory: str | Path, tag: str, target: Any
) -> tuple[Any, dict]:
    """Restore a pytree saved by save_checkpoint, shaped like ``target``.
    Returns (state, metadata)."""
    path = (Path(directory) / tag).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path, target)
    meta_path = path.parent / f"{tag}.meta.json"
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return state, meta


def latest_checkpoint(directory: str | Path) -> str | None:
    """Most recent epochNNN tag in a checkpoint dir ('best' excluded)."""
    root = Path(directory)
    if not root.exists():
        return None
    epochs = sorted(p.name for p in root.iterdir() if p.name.startswith("epoch"))
    return epochs[-1] if epochs else None


def _json_default(o):
    if isinstance(o, (np.floating, np.integer)):
        return o.item()
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(type(o))
