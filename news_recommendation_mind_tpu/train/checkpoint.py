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
from typing import Optional

import flax.serialization
import jax

from .state import TrainState


def _path(ckpt_dir: str, scale: str, step) -> str:
    tag = step if isinstance(step, str) else f"step{int(step)}"
    return os.path.join(ckpt_dir, f"{scale}_{tag}.ckpt")


def save_checkpoint(ckpt_dir: str, scale: str, state: TrainState,
                    best: bool = False) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    state = jax.device_get(state)
    path = _path(ckpt_dir, scale, "best" if best else int(state.step))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(state))
    os.replace(tmp, path)  # atomic publish
    return path


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
