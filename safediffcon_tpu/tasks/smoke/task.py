"""2D smoke control task: layout, conditioning, guidance, conformal stats.

Data layout (channels-LAST): x has shape (B, F=32, 64, 64, 7) with channels
(density, vx, vy, cx, cy, smoke_rate, smoke_safe_rate); the two rate
channels are scalars tiled over space. Equivalent of the reference
(B, 32, 7, 64, 64) tensors (reference: 2d/ddpm/data_2d.py:9-113).

Conditioning (reference: 2d/ddpm/diffusion_2d.py:330-340,396-404,437-441):
  - the initial density (frame 0, channel 0) is always imposed,
  - calibration/backward sampling additionally conditions on the control
    channels 3:5 over ALL frames,
  - no pad masking (every cell is real data).

Safety: the safe-region absorption fraction of the FINAL frame must stay
below safe_bound — an upper bound like Burgers, with the objective being
smoke delivered to the target bucket (reference: 2d/inference_2d.py:173-186).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

# per-channel normalization (reference: 2d/ddpm/data_2d.py:38)
RESCALER = np.array([2, 19, 20, 17, 20, 1, 1], dtype=np.float32)
FRAMES = 32
SIZE = 64
DENS, VX, VY, CX, CY, SMOKE, SAFE = range(7)


@dataclasses.dataclass(frozen=True)
class SmokeTaskConfig:
    """Guidance/conformal settings (reference: 2d/inference_2d.py args)."""

    safe_bound: float = 0.1
    w_safe: float = 0.9
    standard_fixed_ratio: float = 100.0  # guidance grad + train weights scale
    finetune_standard_fixed_ratio: float = 0.0  # composite test weight scale
    alpha: float = 0.04  # NOTE: 2d uses the INVERTED convention (1 - alpha)


@struct.dataclass
class SmokeConditioner:
    """Condition arrays for sampling; None fields are skipped.

    init: (B, 64, 64) initial density (normalized)
    control: (B, F, 64, 64, 2) control fields for channels 3:5 (normalized)
    """

    init: Optional[jnp.ndarray] = None
    control: Optional[jnp.ndarray] = None

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.init is not None:
            x = x.at[:, 0, :, :, DENS].set(self.init)
        if self.control is not None:
            x = x.at[:, :, :, :, CX : CY + 1].set(self.control)
        return x

    def apply_train(self, x: jnp.ndarray, x_start: jnp.ndarray) -> jnp.ndarray:
        """Training-time conditioning: frame-0 density from the clean sample
        (reference: 2d/ddpm/diffusion_2d.py:437-441)."""
        return x.at[:, 0, :, :, DENS].set(x_start[:, 0, :, :, DENS])

    def loss_target(self, noise: jnp.ndarray) -> jnp.ndarray:
        return noise.at[:, 0, :, :, DENS].set(0.0)

    def mask_output(self, model_out: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return model_out  # no pad masking in the 2d task


def train_conditioner() -> SmokeConditioner:
    return SmokeConditioner()


# ---------------------------------------------------------------------------
# Guidance / reweighting / conformal statistics
# ---------------------------------------------------------------------------

def guidance_values(x: jnp.ndarray, Q, cfg: SmokeTaskConfig) -> jnp.ndarray:
    """-(1-w_safe) * mean smoke_rate + w_safe * relu(final safe_rate + Q -
    safe_bound), per sample (reference: 2d/inference_2d.py:173-186).
    x is normalized (B, F, 64, 64, 7)."""
    state = x * jnp.asarray(RESCALER)
    success = state[..., SMOKE].mean(axis=(-1, -2, -3))
    safe = jnp.maximum(
        state[:, -1, :, :, SAFE].mean(axis=(-1, -2)) + Q - cfg.safe_bound, 0.0
    )
    return -(1.0 - cfg.w_safe) * success + cfg.w_safe * safe


def shift_weights(
    x: jnp.ndarray, Q, cfg: SmokeTaskConfig, mode: str = "train"
) -> jnp.ndarray:
    """exp(-ratio * guidance) (reference: 2d/inference_2d.py:83-92).

    Faithful quirk: the reference's 'test' mode passes a stored
    finetune_Q to guidance() but guidance ignores the argument and uses
    the CURRENT self.Q — we reproduce that (both modes use Q)."""
    ratio = (
        cfg.standard_fixed_ratio if mode == "train" else cfg.finetune_standard_fixed_ratio
    )
    return jnp.exp(-ratio * guidance_values(x, Q, cfg))


def guidance_grad_fn(Q, cfg: SmokeTaskConfig):
    """standard_fixed_ratio * d(sum guidance)/dx
    (reference: 2d/inference_2d.py:189-195 + diffusion_2d.py:249-254)."""

    def total(x):
        return guidance_values(x, Q, cfg).sum()

    g = jax.grad(total)
    return lambda x: cfg.standard_fixed_ratio * g(x)


def conformal_score(pred: jnp.ndarray, state: jnp.ndarray) -> jnp.ndarray:
    """|spatial-mean of final-frame safe_rate(sample) - (truth)| in physical
    units (reference: 2d/inference_2d.py:144). Inputs normalized."""
    r = RESCALER[SAFE]
    s_pred = pred[:, -1, :, :, SAFE].mean(axis=(-1, -2)) * r
    s_tgt = state[:, -1, 0, 0, SAFE] * r
    return jnp.abs(s_pred - s_tgt)


def backward_loss(pred_scaled: jnp.ndarray, Q, cfg: SmokeTaskConfig) -> jnp.ndarray:
    """Backward-finetune loss on UNSCALED samples: -(1-w_safe) * mean
    success + w_safe * MSE(relu(final safe + Q - bound), 0)
    (reference: 2d/inference_2d.py:267-284)."""
    success = pred_scaled[..., SMOKE].mean(axis=(-1, -2, -3))
    safe = jnp.maximum(
        pred_scaled[:, -1, :, :, SAFE].mean(axis=(-1, -2)) + Q - cfg.safe_bound, 0.0
    )
    return -(1.0 - cfg.w_safe) * success.mean() + cfg.w_safe * (safe**2).mean()


def tile_rate_channels(pred_scaled: jnp.ndarray) -> jnp.ndarray:
    """Replace the two rate channels by their spatial means tiled over
    space (reference: 2d/inference_2d.py:231-234)."""
    for ch in (SMOKE, SAFE):
        m = pred_scaled[..., ch].mean(axis=(-1, -2), keepdims=True)
        pred_scaled = pred_scaled.at[..., ch].set(
            jnp.broadcast_to(m, pred_scaled[..., ch].shape)
        )
    return pred_scaled
