"""Checkpointing via orbax.

Mirrors the reference's semantics (``ssl.py:102-127``,
``apis/ssl_train.py:157-166``):
* a PRETRAIN checkpoint (single detector tree) loads into BOTH teacher and
  student of an SSL state;
* an SSL checkpoint restores teacher/student separately;
* ``load_from_with_optimizer`` ("bootstrapped resume") restores model +
  optimizer but resets the iteration counter.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp


def save(path: str, payload: Dict[str, Any], step: int,
         meta: Optional[Dict[str, Any]] = None):
    """Save a checkpoint; ``meta`` (CLASSES, config text, versions, time —
    reference ``tools/train.py:210-220`` checkpoint meta) lands as a
    meta.json sidecar inside the step directory."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    step_dir = os.path.join(path, f"ckpt_{step}")
    ckptr.save(step_dir, payload, force=True)
    ckptr.wait_until_finished()
    if meta is not None:
        import json
        with open(os.path.join(step_dir, "meta.json"), "w") as f:
            json.dump(meta, f, indent=1, default=str)


def default_meta(classes=None, config_text=None, **extra):
    """Environment/version stamp for checkpoint meta."""
    import time
    import jax
    import flax
    import optax as _optax
    from .. import __version__ as pkg_version
    meta = dict(time=time.strftime("%Y-%m-%d %H:%M:%S"),
                detmatch_tpu=pkg_version, jax=jax.__version__,
                flax=flax.__version__, optax=_optax.__version__)
    if classes is not None:
        meta["CLASSES"] = list(classes)
    if config_text is not None:
        meta["config"] = config_text
    meta.update(extra)
    return meta


def restore(path: str, step: int, template: Dict[str, Any]):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(os.path.abspath(path),
                                      f"ckpt_{step}"), template)


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = []
    for d in os.listdir(path):
        if d.startswith("ckpt_"):
            try:
                steps.append(int(d.split("_")[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def load_from_with_optimizer(path: str, template: Dict[str, Any],
                             step: Optional[int] = None):
    """Bootstrapped resume (reference ``apis/ssl_train.py:157-166``):
    restore model state AND optimizer state from an SSL checkpoint but
    reset the iteration counter to 0 — used to continue SSL training
    under a new schedule.

    Args:
        template: {'state': ..., 'opt_state': ...} shape/dtype template.
    Returns:
        (payload, start_iter=0).
    """
    step = latest_step(path) if step is None else step
    if step is None:
        raise FileNotFoundError(f"no ckpt_* under {path}")
    return restore(path, step, template), 0


def load_pretrained_into_ssl(ssl_state, pretrain_payload, det_key):
    """Duplicate a pretrain checkpoint into both branches
    (reference ``ssl.py:102-127``).

    Args:
        ssl_state: {'student': {det_key: vars, ...}, 'teacher': ...}
        pretrain_payload: a single detector's variables dict.
    """
    # teacher gets a REAL buffer copy — the train loop donates the
    # student buffers, and donating arrays aliased into the teacher
    # would delete them out from under it
    copy = jax.tree.map(jnp.copy, pretrain_payload)
    out = jax.tree.map(lambda x: x, ssl_state)
    out["student"][det_key] = pretrain_payload
    out["teacher"][det_key] = copy
    return out
