"""Orbax checkpointing: (params, opt_state, EMA, step, Q-hat) per milestone.

Replaces torch.save milestone dicts (reference: 1D/model/trainer.py:111-148)
and the SafeDiffCon convention of embedding the conformal quantile in the
checkpoint (reference: tokamak/inference/pipeline.py:455-456,
2d/inference_2d.py:381-382).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_path(directory: str, step: int) -> str:
    return os.path.join(os.path.abspath(directory), f"ckpt-{step}")


def save_checkpoint(directory: str, state, step: int, Q: Optional[Any] = None) -> str:
    """Save a TrainState (+ optional conformal quantile) at a milestone."""
    payload = {
        "step": np.asarray(state.step),
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "ema_params": jax.device_get(state.ema_params),
    }
    if Q is not None:
        payload["Q"] = np.asarray(Q, np.float32)
    path = _ckpt_path(directory, step)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def load_checkpoint(directory: str, step: int, target=None) -> dict:
    """Restore a milestone; pass `target` (a matching pytree of abstract or
    concrete arrays) to recover exact structure, else get raw arrays."""
    path = _ckpt_path(directory, step)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(path, target)
        return ckptr.restore(path)


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("ckpt-"):
            try:
                steps.append(int(name.split("-", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def save_phase_state(directory: str, params, opt_state, Q, epoch: int) -> str:
    """Persist a finetune-phase epoch state (params + optimizer moments +
    Q-hat) so a posttrain/InfFT run survives a worker crash mid-phase.

    The reference has no equivalent (a crash mid-posttrain loses the run);
    epoch granularity matches its per-epoch results.yaml convention
    (1D/posttrain/post_train.py:459-461)."""
    payload = {
        "params": jax.device_get(params),
        "opt_state": jax.device_get(opt_state),
        "Q": np.asarray(Q, np.float32),
        "epoch": np.asarray(epoch, np.int64),
    }
    path = _ckpt_path(directory, epoch)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def _abstract(tree):
    """Shape/dtype-only restore target: structure without materializing
    (or device_get-ing) any values."""
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype
                                       if not hasattr(a, "dtype") else a.dtype),
        tree)


def load_phase_state(directory: str, params, opt_state, epoch: Optional[int] = None):
    """Restore the latest (or a specific) finetune-phase epoch state.

    `params`/`opt_state` supply the target pytree structure (their values
    are not read). Returns ``(params, opt_state, Q, epoch)`` or ``None``
    when the directory holds no state."""
    if epoch is None:
        epoch = latest_step(directory)
        if epoch is None:
            return None
    target = {
        "params": _abstract(params),
        "opt_state": _abstract(opt_state),
        "Q": jax.ShapeDtypeStruct((), np.float32),
        "epoch": jax.ShapeDtypeStruct((), np.int64),
    }
    path = _ckpt_path(directory, epoch)
    with ocp.StandardCheckpointer() as ckptr:
        payload = ckptr.restore(path, target)
    return payload["params"], payload["opt_state"], jnp.asarray(payload["Q"]), int(payload["epoch"])


def load_phase_trainstate(directory: str, state, epoch: Optional[int] = None):
    """Restore the latest TrainState-based phase epoch (saved via
    ``save_checkpoint(directory, state, step=epoch, Q=Q)``).

    ``state`` supplies the pytree structure and the static optimizer/EMA
    fields. Returns ``(state, Q, epoch)`` or ``None`` when the directory
    holds no state."""
    if epoch is None:
        epoch = latest_step(directory)
        if epoch is None:
            return None
    target = {
        "step": jax.ShapeDtypeStruct((), np.int32),
        "params": _abstract(state.params),
        "opt_state": _abstract(state.opt_state),
        "ema_params": _abstract(state.ema_params),
        "Q": jax.ShapeDtypeStruct((), np.float32),
    }
    path = _ckpt_path(directory, epoch)
    with ocp.StandardCheckpointer() as ckptr:
        payload = ckptr.restore(path, target)
    new_state = state.replace(
        step=jnp.asarray(payload["step"]),
        params=payload["params"],
        opt_state=payload["opt_state"],
        ema_params=payload["ema_params"],
    )
    return new_state, jnp.asarray(payload["Q"]), int(epoch)


def save_phase_history(directory: str, history, config_repr: Optional[str] = None) -> str:
    """Atomically persist the epoch-metrics history (and a config
    fingerprint) beside the phase state, so a resumed run returns the FULL
    metrics list and a config mismatch is detectable."""
    import json
    import tempfile

    os.makedirs(directory, exist_ok=True)
    payload = {"history": history}
    if config_repr is not None:
        payload["config"] = config_repr
    path = os.path.join(directory, "history.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, default=float)
    os.replace(tmp, path)
    return path


def load_phase_history(directory: str, max_epoch: Optional[int] = None,
                       config_repr: Optional[str] = None):
    """Load the epoch-metrics history written by `save_phase_history`
    (empty list when absent or unreadable). Logs a warning when the stored
    config fingerprint differs from `config_repr` — resuming state trained
    under different hyperparameters is almost always a mistake."""
    import json
    import logging

    path = os.path.join(directory, "history.json")
    if not os.path.exists(path):
        return []
    try:
        with open(path) as f:
            payload = json.load(f)
    except (json.JSONDecodeError, OSError):
        return []
    if config_repr is not None and payload.get("config") not in (None, config_repr):
        logging.getLogger(__name__).warning(
            "phase state in %s was written under a different config:\n"
            "  saved: %s\n  now:   %s", directory, payload.get("config"),
            config_repr)
    hist = payload.get("history", [])
    if max_epoch is not None:
        hist = [h for h in hist if h.get("epoch", 0) <= max_epoch]
    return hist


def save_finetuned(directory: str, params, Q, step: int = 0) -> str:
    """Save a fine-tuned model (params + conformal quantile), the
    SafeDiffCon checkpoint convention (reference:
    tokamak/inference/pipeline.py:455-456, 2d/inference_2d.py:381-382)."""
    payload = {
        "params": jax.device_get(params),
        "Q": np.asarray(Q),
        "step": np.asarray(step),
    }
    path = _ckpt_path(directory, step)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path
