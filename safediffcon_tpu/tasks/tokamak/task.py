"""Tokamak KSTAR control task: layout, conditioning, guidance, conformal stats.

Data layout (channels-LAST): x has shape (B, PAD_SIZE=128, 12) with channels
0-2 the states (βp, q95, li) over NT=122 real rows and channels 3-11 the 9
actuator commands over 121 real rows, zero-padded to 128 and normalized by
the per-channel SCALER. Equivalent of the reference (B, 12, 128)
channel-first tensors (reference: tokamak/data/tokamak_dataset.py:34-47).

Conditioning semantics reproduce the reference exactly
(reference: tokamak/model/diffusion.py:295-308,404-417):
  - u0 writes all three states at t=0,
  - uT writes the FULL (βp, li) target trajectories (channels 0 and 2,
    rows :NT),
  - padding zeroes state rows NT.. and action rows NT-1..,
  - calibration conditions on the ground-truth actions (all 9 channels,
    every row — the pad region is zero in the data anyway).

Safety: q95 must stay ABOVE the threshold — a lower bound, opposite in
sign to the Burgers task (reference: tokamak/utils/guidance.py:50-55).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

# per-channel normalization (reference: tokamak/utils/common.py:16)
SCALER = np.array([2, 7, 2, 1, 2, 2, 2, 2, 1, 1, 2, 3], dtype=np.float32)
NT = 122
PAD_SIZE = 128
N_STATES = 3
N_ACTIONS = 9
BP, Q95, LI = 0, 1, 2  # state channel indices


@dataclasses.dataclass(frozen=True)
class TokamakTaskConfig:
    """Guidance/conformal settings (reference: tokamak/configs/inference_config.py)."""

    safety_threshold: float = 4.98
    w_obj: float = 0.0
    w_safe: float = 1.0
    guidance_scaler: float = 1.0
    alpha: float = 0.9


@struct.dataclass
class TokamakConditioner:
    """Condition arrays for sampling; None fields are skipped.

    u0: (B, 3) initial state (normalized units)
    uT: (B, NT, 2) full (βp, li) target trajectories (normalized)
    w:  (B, PAD_SIZE, 9) ground-truth actions (calibration sampling only)
    """

    u0: Optional[jnp.ndarray] = None
    uT: Optional[jnp.ndarray] = None
    w: Optional[jnp.ndarray] = None

    def _pad(self, x: jnp.ndarray) -> jnp.ndarray:
        # reference: tokamak/model/diffusion.py:330-332 (zero pad regions)
        x = x.at[:, NT:, :N_STATES].set(0.0)
        x = x.at[:, NT - 1 :, N_STATES:].set(0.0)
        return x

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.u0 is not None:
            x = x.at[:, 0, :N_STATES].set(self.u0)
        if self.uT is not None:
            x = x.at[:, :NT, BP].set(self.uT[:, :, 0])
            x = x.at[:, :NT, LI].set(self.uT[:, :, 1])
        x = self._pad(x)
        if self.w is not None:
            x = x.at[:, :, N_STATES:].set(self.w)
        return x

    def apply_train(self, x: jnp.ndarray, x_start: jnp.ndarray) -> jnp.ndarray:
        """Training-time conditioning from the clean sample; padded cells
        are restored from x_start (reference: tokamak/model/diffusion.py:592-602)."""
        x = x.at[:, 0, :N_STATES].set(x_start[:, 0, :N_STATES])
        x = x.at[:, :NT, BP].set(x_start[:, :NT, BP])
        x = x.at[:, :NT, LI].set(x_start[:, :NT, LI])
        x = x.at[:, NT:, :N_STATES].set(x_start[:, NT:, :N_STATES])
        x = x.at[:, NT - 1 :, N_STATES:].set(x_start[:, NT - 1 :, N_STATES:])
        return x

    def loss_target(self, noise: jnp.ndarray) -> jnp.ndarray:
        # zero target noise at conditioned cells
        # (reference: tokamak/model/diffusion.py:620-623)
        noise = noise.at[:, 0, :N_STATES].set(0.0)
        noise = noise.at[:, :NT, BP].set(0.0)
        noise = noise.at[:, :NT, LI].set(0.0)
        return noise

    def mask_output(self, model_out: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        # no loss on padded cells (reference: tokamak/model/diffusion.py:626-630)
        model_out = model_out.at[:, NT:, :N_STATES].set(target[:, NT:, :N_STATES])
        model_out = model_out.at[:, NT - 1 :, N_STATES:].set(
            target[:, NT - 1 :, N_STATES:]
        )
        return model_out


def train_conditioner() -> TokamakConditioner:
    return TokamakConditioner()


# ---------------------------------------------------------------------------
# Guidance / reweighting / conformal statistics
# ---------------------------------------------------------------------------

def safety_score(state_scaled: jnp.ndarray) -> jnp.ndarray:
    """min_t q95 per sample over (B, NT, 3) physical-unit states
    (reference: tokamak/utils/metrics.py:144-151)."""
    return state_scaled[:, :, Q95].min(axis=-1)


def guidance_loss(
    x: jnp.ndarray, state_target: jnp.ndarray, Q, cfg: TokamakTaskConfig
) -> jnp.ndarray:
    """w_obj * (MSE(βp, target) + MSE(li, target)) + w_safe * relu(threshold
    - min q95 + Q), per sample (reference: tokamak/utils/guidance.py:32-56).

    x is normalized (B, PAD, 12); state_target is physical (B, NT, 3).
    """
    state = (x * jnp.asarray(SCALER))[:, :NT, :N_STATES]
    obj = ((state[:, :, BP] - state_target[:, :, BP]) ** 2).mean(-1) + (
        (state[:, :, LI] - state_target[:, :, LI]) ** 2
    ).mean(-1)
    s = safety_score(state)
    safe = jnp.maximum(cfg.safety_threshold - s + Q, 0.0)
    return cfg.w_obj * obj + cfg.w_safe * safe


def shift_weights(
    x: jnp.ndarray, state_target: jnp.ndarray, Q, cfg: TokamakTaskConfig
) -> jnp.ndarray:
    """exp(-loss * guidance_scaler) (reference: tokamak/utils/guidance.py:98-128)."""
    return jnp.exp(-guidance_loss(x, state_target, Q, cfg) * cfg.guidance_scaler)


def guidance_grad_fn(state_target, Q, cfg: TokamakTaskConfig):
    """d(sum loss * scaler)/dx for sampler guidance
    (reference: tokamak/utils/guidance.py:66-73)."""

    def total(x):
        return (guidance_loss(x, state_target, Q, cfg) * cfg.guidance_scaler).sum()

    return jax.grad(total)


def conformal_score(pred: jnp.ndarray, state: jnp.ndarray) -> jnp.ndarray:
    """|min q95(sample) - min q95(truth)| on physical units
    (reference: tokamak/inference/conformal.py:103-108). Inputs normalized."""
    sc = jnp.asarray(SCALER)
    s_pred = safety_score((pred * sc)[:, :NT, :N_STATES])
    s_tgt = safety_score((state * sc)[:, :NT, :N_STATES])
    return jnp.abs(s_pred - s_tgt)


def backward_loss(
    pred_scaled_state: jnp.ndarray, state_target: jnp.ndarray, Q, cfg: TokamakTaskConfig
) -> jnp.ndarray:
    """Backward-finetune loss on sampled trajectories (physical units):
    mean over batch of w_obj*objective + w_safe*relu(threshold - min q95 + Q)
    (reference: tokamak/inference/pipeline.py:238-268)."""
    state = pred_scaled_state[:, :NT, :N_STATES]
    obj = ((state[:, :, BP] - state_target[:, :, BP]) ** 2).mean(-1) + (
        (state[:, :, LI] - state_target[:, :, LI]) ** 2
    ).mean(-1)
    s = safety_score(state)
    safe = jnp.maximum(cfg.safety_threshold - s + Q, 0.0)
    return (cfg.w_obj * obj + cfg.w_safe * safe).mean()
