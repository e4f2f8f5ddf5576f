"""Full-train-state checkpointing.

Improves on the reference's model+optimizer-only save/load
(reference utils/Manager.py:289-343, which loses the step counter and
scheduler state on resume): the entire TrainState pytree — params, opt
state (including schedule counts), and step — serialises via
flax.serialization to `{scale}_step{N}.ckpt` / `best.ckpt` under
`data/model_params/{name}/` (the reference's artifact layout,
utils/Manager.py:294-305). Topology-independent: pytrees have no DDP
"module." prefix problem by construction.
"""
from __future__ import annotations

import os
import re
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Optional

import flax.serialization
import jax

from .state import TrainState

_executor = ThreadPoolExecutor(max_workers=1,
                               thread_name_prefix="ckpt-writer")
_pending: Optional[Future] = None
_pending_lock = threading.Lock()


def _path(ckpt_dir: str, scale: str, step) -> str:
    tag = step if isinstance(step, str) else f"step{int(step)}"
    return os.path.join(ckpt_dir, f"{scale}_{tag}.ckpt")


def _write(path: str, state_host) -> str:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(state_host))
    os.replace(tmp, path)  # atomic publish
    return path


def save_checkpoint(ckpt_dir: str, scale: str, state: TrainState,
                    best: bool = False, async_save: bool = False) -> str:
    """Write the full TrainState. With async_save the device→host copy is
    synchronous (cheap) but serialisation + disk IO happen on a writer
    thread, overlapping the next train steps; saves are serialised so a
    later save never races an earlier one."""
    global _pending
    os.makedirs(ckpt_dir, exist_ok=True)
    state_host = jax.device_get(state)
    path = _path(ckpt_dir, scale, "best" if best else int(state_host.step))
    if not async_save:
        wait_for_pending_saves()
        return _write(path, state_host)
    with _pending_lock:
        prev = _pending

        def job():
            if prev is not None:
                prev.result()
            return _write(path, state_host)

        _pending = _executor.submit(job)
    return path


def wait_for_pending_saves() -> None:
    """Block until every async checkpoint write has landed."""
    with _pending_lock:
        pending = _pending
    if pending is not None:
        pending.result()


def load_checkpoint(ckpt_dir: str, scale: str, template: TrainState,
                    step: Optional[int] = None,
                    best: bool = False) -> TrainState:
    """Load into the structure of `template` (shape/dtype checked)."""
    if best:
        path = _path(ckpt_dir, scale, "best")
    elif step is not None:
        path = _path(ckpt_dir, scale, step)
    else:
        latest = latest_step(ckpt_dir, scale)
        if latest is None:
            raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
        path = _path(ckpt_dir, scale, latest)
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def latest_step(ckpt_dir: str, scale: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    pat = re.compile(rf"^{re.escape(scale)}_step(\d+)\.ckpt$")
    steps = [int(m.group(1)) for f in os.listdir(ckpt_dir)
             if (m := pat.match(f))]
    return max(steps) if steps else None
