"""Checkpoint / resume for long renders and inverse-rendering runs.

The reference has NO checkpointing — an interrupted offline render loses
everything (SURVEY.md section 5); the closest analog is the realtime
accumulation state (film + frame counter, render.h:361-373).  Here both
long-running loops are resumable:

  * RenderCheckpoint — (film SUM, samples_done, rng seed, config) for
    offline renders: re-running continues at the next sample index; the
    per-(pixel,sample) RNG streams make the result identical to an
    uninterrupted render.
  * TrainCheckpoint — (params pytree, optimizer state pytree, step) for
    inverse rendering.

Format: a single .npz (portable, no framework dependency); pytrees are
flattened with jax.tree_util and keyed by path.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _flatten(tree: Any, prefix: str) -> Dict[str, np.ndarray]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = {f"{prefix}:{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    out[f"{prefix}:treedef"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    return out


def _unflatten(tree_like: Any, data: Dict[str, np.ndarray], prefix: str):
    leaves, treedef = jax.tree_util.tree_flatten(tree_like)
    new_leaves = [data[f"{prefix}:{i}"] for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_render_checkpoint(path: str, film_sum: np.ndarray,
                           samples_done: int, meta: Dict[str, Any]) -> None:
    np.savez_compressed(
        path, film_sum=np.asarray(film_sum),
        samples_done=np.int64(samples_done),
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8))
    # atomicity: np.savez writes in place; callers pass a temp + rename if
    # they need crash safety mid-write
    assert os.path.exists(path if path.endswith(".npz") else path + ".npz")


def load_render_checkpoint(path: str) -> Tuple[np.ndarray, int,
                                               Dict[str, Any]]:
    z = np.load(path if path.endswith(".npz") else path + ".npz")
    meta = json.loads(bytes(z["meta"]).decode())
    return z["film_sum"], int(z["samples_done"]), meta


def save_train_checkpoint(path: str, params: Any, opt_state: Any,
                          step: int, meta: Dict[str, Any]) -> None:
    data = {}
    data.update(_flatten(params, "params"))
    data.update(_flatten(opt_state, "opt"))
    data["step"] = np.int64(step)
    data["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **data)


def load_train_checkpoint(path: str, params_like: Any, opt_state_like: Any):
    z = np.load(path if path.endswith(".npz") else path + ".npz",
                allow_pickle=False)
    data = dict(z)
    params = _unflatten(params_like, data, "params")
    opt_state = _unflatten(opt_state_like, data, "opt")
    meta = json.loads(bytes(z["meta"]).decode())
    return params, opt_state, int(z["step"]), meta
