"""1D Burgers control task: layout, conditioning, guidance, conformal stats.

Data layout (channels-LAST): x has shape (B, PAD_SIZE=16, NX=128, 3) with
channels (u, f, s): state trajectory u (rows 0..10 real), control force f
(rows 0..9 real), safety score s = u^2 (or per-sample max of u^2 when
use_max_safety). Equivalent of the reference (B, 3, 16, 128) channel-first
tensors (reference: 1D/data/burgers.py:104-142).

The conditioning / padding semantics reproduce the reference exactly,
including its quirks (reference: 1D/model/diffusion.py:336-366):
  - u0 is written into (t=0, ch u), uT into (t=COND_IDX, ch u)
  - padding zeroes u rows COND_IDX+1.., f rows COND_IDX.., s rows COND_IDX..
    (note: s row 10 is real data but still zeroed — faithful quirk)
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

SCALER = 10.0  # reference: 1D/utils/common.py:17
NT = 11
NX = 128
PAD_SIZE = 16
COND_IDX = NT - 1  # 10
U, F, S = 0, 1, 2  # channel indices


@dataclasses.dataclass(frozen=True)
class BurgersTaskConfig:
    """Static guidance/conformal settings (reference: 1D/configs/inference_config.py)."""

    u_bound: float = 0.8
    use_max_safety: bool = True
    w_score: float = 1.0
    alpha: float = 0.98


@struct.dataclass
class BurgersConditioner:
    """Condition arrays for sampling; None fields are skipped.

    u0: (B, NX) initial state (normalized units)
    uT: (B, NX) target final state
    w:  (B, PAD_SIZE, NX) ground-truth control (calibration sampling only)
    """

    u0: Optional[jnp.ndarray] = None
    uT: Optional[jnp.ndarray] = None
    w: Optional[jnp.ndarray] = None

    def _pad(self, x: jnp.ndarray) -> jnp.ndarray:
        # reference set_pad_condition (1D/model/diffusion.py:360-366)
        x = x.at[:, COND_IDX + 1 :, :, U].set(0.0)
        x = x.at[:, COND_IDX:, :, F].set(0.0)
        x = x.at[:, COND_IDX:, :, S].set(0.0)
        return x

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.u0 is not None:
            x = x.at[:, 0, :, U].set(self.u0)
        if self.uT is not None:
            x = x.at[:, COND_IDX, :, U].set(self.uT)
        if self.w is not None:
            x = x.at[:, :, :, F].set(self.w)
        return self._pad(x)

    def apply_train(self, x: jnp.ndarray, x_start: jnp.ndarray) -> jnp.ndarray:
        """Training-time conditioning: conditions come from the clean sample
        (reference: 1D/model/diffusion.py:659-665)."""
        x = x.at[:, 0, :, U].set(x_start[:, 0, :, U])
        x = x.at[:, COND_IDX, :, U].set(x_start[:, COND_IDX, :, U])
        return self._pad(x)

    def loss_target(self, noise: jnp.ndarray) -> jnp.ndarray:
        # zero target noise at conditioned cells (1D/model/diffusion.py:709-714)
        noise = noise.at[:, 0, :, U].set(0.0)
        noise = noise.at[:, COND_IDX, :, U].set(0.0)
        return noise

    def mask_output(self, model_out: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        # no loss on padded cells (1D/model/diffusion.py:720-721)
        model_out = model_out.at[:, COND_IDX + 1 :, :, U].set(
            target[:, COND_IDX + 1 :, :, U]
        )
        model_out = model_out.at[:, COND_IDX:, :, F].set(target[:, COND_IDX:, :, F])
        model_out = model_out.at[:, COND_IDX:, :, S].set(target[:, COND_IDX:, :, S])
        return model_out


def train_conditioner() -> BurgersConditioner:
    """Conditioner for the training loss (conditions read from x_start)."""
    return BurgersConditioner()


# ---------------------------------------------------------------------------
# w-only prior model p(w | u0, uT) — the reference's is_model_w /
# eval_two_models surface (1D/model/diffusion.py:226-244,678-679,718-720)
# ---------------------------------------------------------------------------

def mask_model_w_input(x: jnp.ndarray) -> jnp.ndarray:
    """Zero the u rows the prior model never sees (u_1..u_{T-1}; u0/uT stay —
    it is trained on p(w | u0, uT)). Applied to the model INPUT both in
    training and in two-model sampling
    (reference: 1D/model/diffusion.py:229-231,678-679)."""
    return x.at[:, 1:COND_IDX, :, U].set(0.0)


def mask_model_w_output(out: jnp.ndarray) -> jnp.ndarray:
    """The prior model predicts only w: zero its whole u-channel output
    (reference: 1D/model/diffusion.py:232)."""
    return out.at[:, :, :, U].set(0.0)


@struct.dataclass
class ModelWConditioner(BurgersConditioner):
    """Training conditioner for the w-only prior model.

    Identical conditioning/padding to BurgersConditioner, but the u channel
    carries no loss at all: the reference copies the target into the u rows
    of the model output before the MSE
    (1D/model/diffusion.py:718-720, `model_out[..., 0, :, :] = target`).
    Input masking (u_1..u_{T-1} zeroed) is done by wrapping apply_fn with
    `mask_model_w_input`, not here."""

    def mask_output(self, model_out: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        model_out = BurgersConditioner.mask_output(self, model_out, target)
        return model_out.at[:, :, :, U].set(target[:, :, :, U])


# ---------------------------------------------------------------------------
# Guidance (safety) loss and distribution-shift weights
# ---------------------------------------------------------------------------

def safety_statistic(x: jnp.ndarray, use_max_safety: bool = True) -> jnp.ndarray:
    """Per-sample safety statistic of a normalized trajectory tensor.

    mean over the real rows of the s channel when use_max_safety (the s
    channel then carries the per-sample max), else amax
    (reference: 1D/utils/guidance.py:67-71).
    """
    s = (x * SCALER)[:, :NT, :, S]
    if use_max_safety:
        return s.mean(axis=(-1, -2))
    return s.max(axis=(-1, -2))


def guidance_values(x: jnp.ndarray, Q, cfg: BurgersTaskConfig) -> jnp.ndarray:
    """guidance(x, Q) = relu(s_stat + Q - u_bound^2) * w_score, shape (B,)
    (reference: 1D/posttrain/guidance.py:9-37)."""
    s = safety_statistic(x, cfg.use_max_safety)
    return jnp.maximum(s + Q - cfg.u_bound**2, 0.0) * cfg.w_score


def shift_weights(x: jnp.ndarray, Q, cfg: BurgersTaskConfig) -> jnp.ndarray:
    """Distribution-shift weight exp(-guidance) per sample
    (reference: 1D/posttrain/guidance.py:39-46)."""
    return jnp.exp(-guidance_values(x, Q, cfg))


def guidance_grad_fn(Q, cfg: BurgersTaskConfig):
    """d(sum guidance)/dx for sampler guidance
    (reference: 1D/utils/guidance.py:79-86)."""

    def total(x):
        return guidance_values(x, Q, cfg).sum()

    return jax.grad(total)


def conformal_score(
    pred: jnp.ndarray, state: jnp.ndarray, use_max_safety: bool = True
) -> jnp.ndarray:
    """|safety statistic(sample) - safety statistic(truth)| per sample
    (reference: 1D/posttrain/conformal.py:71-80). Inputs are normalized."""
    c_pred = safety_statistic(pred, use_max_safety)
    c_target = safety_statistic(state, use_max_safety)
    return jnp.abs(c_pred - c_target)


def infft_loss(pred_scaled: jnp.ndarray, Q, cfg: BurgersTaskConfig) -> jnp.ndarray:
    """Inference-time finetuning loss on UNSCALED predictions:
    MSE(relu(amax(s) + Q - u_bound^2), 0) (reference: 1D/inference/inference_ft.py:193-201)."""
    s = pred_scaled[:, :NT, :, S].max(axis=(-1, -2))
    obj = jnp.maximum(s + Q - cfg.u_bound**2, 0.0)
    return (obj**2).mean()
