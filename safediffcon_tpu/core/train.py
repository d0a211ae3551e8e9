"""Training state, optimizers, EMA, and jitted train-step factories.

Replaces the reference Trainer / PostTrainPipeline optimization plumbing
(reference: 1D/model/trainer.py:21-210, 1D/posttrain/post_train.py:52-104)
with optax transforms and pure jitted steps:

  - pretrain: Adam(betas 0.9/0.99) + periodic cosine LR (torch
    CosineAnnealingLR T_max=10000 continues its cosine past T_max; we
    reproduce that closed form), global-norm clip 1.0, EMA(0.995 / 10).
  - posttrain: AdamW + 5%-warmup -> cosine(eta_min 1e-6) SequentialLR.
  - data parallelism: the train step is jitted with a sharded batch and
    replicated params; XLA derives the gradient all-reduce from shardings.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from safediffcon_tpu.core.diffusion import DiffusionConfig, p_losses
from safediffcon_tpu.core.schedules import DiffusionSchedule


# ---------------------------------------------------------------------------
# LR schedules
# ---------------------------------------------------------------------------

def periodic_cosine_schedule(base_lr: float, t_max: int, eta_min: float = 0.0):
    """torch.optim.CosineAnnealingLR closed form — periodic past t_max
    (reference: 1D/model/trainer.py:81)."""

    def schedule(step):
        cos = jnp.cos(jnp.pi * step / t_max)
        return eta_min + (base_lr - eta_min) * (1 + cos) / 2

    return schedule


def warmup_cosine_schedule(
    base_lr: float, warmup_steps: int, cosine_t_max: int, eta_min: float = 1e-6
):
    """Linear warmup then cosine anneal (reference: 1D/posttrain/post_train.py:72-81).

    Matches SequentialLR(LambdaLR(warmup), CosineAnnealingLR(T_max)): the
    cosine phase restarts its step count at the warmup milestone.
    """

    def schedule(step):
        warm = base_lr * step / max(warmup_steps, 1)
        t = step - warmup_steps
        cos = jnp.cos(jnp.pi * t / cosine_t_max)
        annealed = eta_min + (base_lr - eta_min) * (1 + cos) / 2
        return jnp.where(step < warmup_steps, warm, annealed)

    return schedule


def make_optimizer(
    kind: str = "adam",
    lr: Any = 1e-5,
    weight_decay: float = 1e-4,
    betas=(0.9, 0.99),
    max_grad_norm: float = 1.0,
) -> optax.GradientTransformation:
    if kind == "adam":
        tx = optax.adam(lr, b1=betas[0], b2=betas[1])
    elif kind == "adamw":
        tx = optax.adamw(lr, b1=betas[0], b2=betas[1], weight_decay=weight_decay)
    elif kind == "sgd":
        tx = optax.sgd(lr, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {kind!r}")
    if max_grad_norm and max_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx


# ---------------------------------------------------------------------------
# Train state with EMA
# ---------------------------------------------------------------------------

@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_decay: float = struct.field(pytree_node=False, default=0.995)
    ema_update_every: int = struct.field(pytree_node=False, default=10)

    @classmethod
    def create(cls, params, tx, ema_decay=0.995, ema_update_every=10):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params),
            tx=tx,
            ema_decay=ema_decay,
            ema_update_every=ema_update_every,
        )

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_step = self.step + 1
        # EMA update every `ema_update_every` optimizer steps
        # (reference EMA(beta=0.995, update_every=10), 1D/model/trainer.py:87).
        do_ema = (new_step % self.ema_update_every) == 0
        d = self.ema_decay

        def lerp(e, p):
            return jnp.where(do_ema, e * d + p * (1.0 - d), e)

        new_ema = jax.tree.map(lerp, self.ema_params, new_params)
        return self.replace(
            step=new_step, params=new_params, opt_state=new_opt, ema_params=new_ema
        )


def make_diffusion_train_step(
    apply_fn: Callable,
    sched: DiffusionSchedule,
    cfg: DiffusionConfig,
    cond=None,
    donate: bool = True,
):
    """Jitted step: (state, rng, batch, weights?) -> (state, loss).

    `weights` (per-sample reweights) implement the conformal post-training
    loss (reference: 1D/posttrain/post_train.py:206-210); pass ones for
    pretraining.
    """

    def loss_fn(params, rng, batch, weights):
        rng_t, rng_n = jax.random.split(rng)
        b = batch.shape[0]
        t = jax.random.randint(rng_t, (b,), 0, cfg.timesteps)
        noise = jax.random.normal(rng_n, batch.shape, dtype=batch.dtype)
        per_sample = p_losses(apply_fn, params, sched, cfg, batch, t, noise, cond)
        return (per_sample * weights).mean()

    def step(state: TrainState, rng, batch, weights):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, rng, batch, weights)
        return state.apply_gradients(grads), loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def accumulated_grads(loss_fn: Callable, k: int):
    """Gradient accumulation over k micro-batches inside one jitted step
    (reference: Trainer gradient_accumulate_every, 1D/model/trainer.py:28,163).

    loss_fn(params, rng, batch) -> scalar. Returns total(params, rng,
    batches) where batches has shape (k, B, ...); losses and grads are
    averaged over the k chunks before the single optimizer update.
    """

    def total(params, rng, batches):
        keys = jax.random.split(rng, k)

        def body(carry, xs):
            key, b = xs
            l, g = jax.value_and_grad(loss_fn)(params, key, b)
            loss_acc, grad_acc = carry
            return (
                loss_acc + l / k,
                jax.tree.map(lambda a, gg: a + gg / k, grad_acc, g),
            ), None

        zero = jax.tree.map(jnp.zeros_like, params)
        (loss, grads), _ = jax.lax.scan(body, (jnp.zeros(()), zero), (keys, batches))
        return loss, grads

    return total
