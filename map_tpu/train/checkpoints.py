"""Checkpoint I/O: step-named model checkpoints + shape-matched partial restore.

Parity: reference `code/trainer.py:517-527` ({global_step}.model files holding
the model state) and `code/models.py:97-112` (finetune transfer = copy every
tensor whose name AND shape match, silently skipping the rest — this is the
mechanism by which pretrain heads are dropped and backbone+embedding kept).

Format: flax msgpack serialization of the full variables dict
({'params': ..., optional 'batch_stats': ...}).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Tuple

import numpy as np
from flax import serialization, traverse_util

logger = logging.getLogger(__name__)


def model_checkpoint_path(model_dir: str, step: int) -> str:
    return os.path.join(model_dir, f"{step}.model")


def save_model(variables: Dict[str, Any], model_dir: str, step: int) -> str:
    os.makedirs(model_dir, exist_ok=True)
    path = model_checkpoint_path(model_dir, step)
    # Pull to host before serializing (np.asarray on a jax.Array is the D2H
    # fetch — under the trainer's async writer this runs on a worker thread).
    host_vars = serialization.to_state_dict(variables)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(
            _tree_map_np(host_vars)))
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint
    return path


def load_model(model_dir: str, step: int) -> Dict[str, Any]:
    path = model_checkpoint_path(model_dir, step)
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_model_file(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def save_model_file(variables: Dict[str, Any], path: str) -> None:
    host_vars = serialization.to_state_dict(variables)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(_tree_map_np(host_vars)))


def _tree_map_np(tree: Any) -> Any:
    if isinstance(tree, dict):
        return {k: _tree_map_np(v) for k, v in tree.items()}
    return np.asarray(tree)


def prune_checkpoints(model_dir: str, keep: int) -> None:
    """Keep only the newest `keep` step-named checkpoints (save_total_limit —
    a dead flag in the reference, arguments.py:34-36; functional here)."""
    import glob

    paths = glob.glob(os.path.join(model_dir, "*.model"))
    steps = []
    for p in paths:
        stem = os.path.basename(p)[:-len(".model")]
        if stem.isdigit():
            steps.append((int(stem), p))
    steps.sort()
    for _, p in steps[:-keep] if keep > 0 else []:
        try:
            os.remove(p)
        except OSError:
            pass


# ---------------------------------------------------------------------------
# Full-train-state checkpoints for mid-run resume. The reference has NO mid-run
# resume (optimizer state is never checkpointed, SURVEY.md §5.3); this is a
# framework addition: params + optimizer moments + step + trainer bookkeeping.
# ---------------------------------------------------------------------------

def resume_path(output_dir: str) -> str:
    return os.path.join(output_dir, "resume.state")


def save_train_state(output_dir: str, state, trainer_meta: Dict[str, Any]) -> str:
    payload = {
        "state": serialization.to_state_dict(state),
        "meta": trainer_meta,
    }
    os.makedirs(output_dir, exist_ok=True)
    path = resume_path(output_dir)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(_tree_map_np(payload)))
    os.replace(tmp, path)  # atomic
    return path


def load_train_state(output_dir: str, state_template):
    path = resume_path(output_dir)
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = serialization.from_state_dict(state_template, payload["state"])
    return state, payload["meta"]


def has_resume_state(output_dir: str) -> bool:
    return os.path.exists(resume_path(output_dir))


def partial_restore(variables: Dict[str, Any], target_state: Dict[str, Any]
                    ) -> Tuple[Dict[str, Any], int, int]:
    """Copy every tensor whose path AND shape match; keep the rest.

    Returns (merged_variables, loaded_count, skipped_count). Parity with
    load_from_target_model (models.py:97-107).
    """
    flat_self = traverse_util.flatten_dict(variables)
    flat_target = traverse_util.flatten_dict(target_state)
    loaded, skipped = 0, 0
    for k, v in flat_target.items():
        if k in flat_self and tuple(np.shape(flat_self[k])) == tuple(np.shape(v)):
            flat_self[k] = np.asarray(v).astype(np.asarray(flat_self[k]).dtype) \
                if isinstance(flat_self[k], np.ndarray) else v
            logger.info(f"Load tensor: {'/'.join(k)}, {tuple(np.shape(v))}")
            loaded += 1
        else:
            logger.info(f"Unmatched tensor in the target model: "
                        f"{'/'.join(k)}, {tuple(np.shape(v))}")
            skipped += 1
    return traverse_util.unflatten_dict(flat_self), loaded, skipped
