"""Background checkpoint writer: overlap checkpoint D2H + serialization with
training.

The reference blocks the train loop for the whole `torch.save`
(`code/trainer.py:517-519`); on this framework the dominant save cost at
production scale is the device->host fetch itself (the Criteo-x4 proof
measured ~110 s per save window through the tunnel, PERFORMANCE.md round 5).
Training steps never need those bytes — JAX arrays are immutable — so the
fetch + msgpack write can run on a worker thread while the main thread keeps
dispatching steps.

Donation caveat (the reason `snapshot_device_tree` exists): every train step
donates its input state (`train_step.py: donate_argnums=(0,)`), so a raw
reference held by the writer would be deleted at the next dispatch. The
snapshot makes an on-device copy first — a pure HBM copy, ~ms for the
canonical tables — and the worker fetches from that copy at leisure. Peak
HBM holds one extra copy of the snapshotted tree until the fetch completes.

Ordering/consistency contract (enforced by Trainer):
- at most ONE job is in flight; submitting joins the previous job first, so
  writes land in submission order and stale-snapshot HBM is bounded;
- every checkpoint READ (load_model / finetune restore / resume restore) and
  run completion calls wait() first;
- worker exceptions re-raise on the next wait()/submit() on the main thread.
"""

from __future__ import annotations

import logging
import threading
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


def snapshot_device_tree(tree: Any) -> Any:
    """On-device copy of every jax.Array leaf (donation-safe snapshot).

    Non-array leaves (python scalars, numpy arrays, None) pass through
    unchanged — they are host-owned already.
    """
    def leaf(x):
        if isinstance(x, jax.Array):
            return jnp.copy(x)
        return x

    return jax.tree_util.tree_map(leaf, tree)


class AsyncCheckpointWriter:
    """Single-worker FIFO checkpoint writer with depth-1 queueing."""

    def __init__(self) -> None:
        self._thread: Optional[threading.Thread] = None
        self._exc: Optional[BaseException] = None

    def submit(self, job: Callable[[], None], label: str = "checkpoint") -> None:
        """Run `job` on a worker thread; joins any in-flight job first."""
        self.wait()

        def run() -> None:
            try:
                job()
            except BaseException as e:  # re-raised on the main thread
                logger.exception(f"async {label} write failed")
                self._exc = e

        self._thread = threading.Thread(
            target=run, name=f"ckpt-writer-{label}", daemon=True)
        self._thread.start()

    def wait(self) -> None:
        """Join the in-flight job (if any) and re-raise its exception."""
        t, self._thread = self._thread, None
        if t is not None:
            t.join()
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc

    @property
    def busy(self) -> bool:
        return self._thread is not None and self._thread.is_alive()
