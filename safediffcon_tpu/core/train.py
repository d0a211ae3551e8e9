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


# ---------------------------------------------------------------------------
# Chunked stepping + shared pretrain loop
# ---------------------------------------------------------------------------

def chunked_train_steps(step_fn: Callable, k: int, donate: bool = True):
    """Fuse k optimizer steps into ONE jitted device call via lax.scan.

    On a remote/tunneled TPU every dispatch + host->device batch transfer
    costs O(10-100ms) of latency; for the small denoisers here that
    overhead dwarfs device compute (the reference's host-driven loop has
    the same per-step cost structure, 1D/model/trainer.py:150-210). One
    call per k steps amortizes it k-fold. `step_fn(state, rng, batch) ->
    (state, loss)` must be the un-jitted single step; batches is (k, B, ...).
    Returns (state, mean loss over the k steps).
    """

    def multi(state, rng, batches):
        keys = jax.random.split(rng, k)

        def body(s, xs):
            key, b = xs
            s, loss = step_fn(s, key, b)
            return s, loss

        state, losses = jax.lax.scan(body, state, (keys, batches))
        return state, losses.mean()

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def run_train_loop(
    step_fn: Callable,
    state: "TrainState",
    data,
    *,
    batch_take: int,
    num_steps: int,
    rng,
    start_step: int = 0,
    seed: int = 0,
    steps_per_call: int = 1,
    log_every: int = 500,
    checkpoint_every: int = 10**9,
    checkpoint_dir: Optional[str] = None,
    logger=None,
    log_prefix: str = "pretrain",
    device_pool: int = 0,
    pool_refresh_every: int = 0,
    shard_video: bool = False,
    deadline: Optional[float] = None,
):
    """Shared epoch-less training loop used by all three task pretrains.

    deadline (absolute ``time.time()`` seconds) bounds the loop by
    wall-clock: the loop stops cleanly at the first chunk boundary at/after
    the deadline and writes a final checkpoint at the step actually
    reached, so downstream phases always get their reserved window and a
    resume continues exactly where training stopped. (Round-5 addition:
    the first at-scale 2D run was killed by its outer timeout mid-pretrain
    because only the finetune phases were deadline-gated.)

    Replaces the reference Trainer's `while step < num: data = next(cycle(dl))`
    loop (1D/model/trainer.py:150-210). Batches are drawn as random
    permutation slices of `data` (reshuffled when exhausted), shipped to
    device `steps_per_call` steps at a time, and stepped inside one jitted
    scan (`chunked_train_steps`). Checkpoints/logs land on the first chunk
    boundary at/after each cadence point.

    device_pool > 0 pins a random pool of that many samples in HBM as bf16
    and gathers batches ON DEVICE — only (k, B) int32 index arrays cross
    the host-device boundary. Use when per-sample records are large enough
    that shipping batches dominates step time (e.g. the (32, 64, 64, 7)
    smoke records ≈ 3.7 MB/sample over a tunneled TPU). Samples are cast
    back to float32 inside the step, so only the bf16 quantization of the
    stored pool differs from host streaming.

    When the pool is smaller than the dataset it is RE-DRAWN from the full
    dataset every `pool_refresh_every` steps (default: after ~3 passes over
    the pool) so every sample is eventually trained on — a one-time pool
    would silently shrink the effective train set to `device_pool` samples.
    """
    import time as _time

    import numpy as np

    from safediffcon_tpu.parallel import mesh as pmesh

    if checkpoint_dir:
        from safediffcon_tpu.utils.checkpoint import save_checkpoint

    k = max(int(steps_per_call), 1)

    # Data parallelism: with an active mesh, params/opt state replicate and
    # batches shard over the data axis — XLA derives the gradient psum from
    # the shardings (the reference's Accelerate-DDP equivalent,
    # 1D/model/trainer.py:47-50).
    dp = pmesh.active_mesh()
    if dp is not None:
        state = pmesh.maybe_replicate(state)
        if logger:
            logger.info("%s: data-parallel over %d devices (batch %d)",
                        log_prefix, dp.devices.size, batch_take)

    if device_pool and device_pool > 0 and start_step < num_steps:
        pool = min(int(device_pool), data.shape[0])

        # Persistent host staging buffers: freed multi-GB numpy blocks are
        # munmap'd, so a fresh gather per refresh would re-pay first-touch
        # page-zeroing for ~14 GB every time (pathologically slow on
        # VM hosts that lazily back anon memory). np.take(out=)/np.copyto
        # into reused buffers pays it exactly once.
        _stage = {}

        def draw_pool(salt):
            import ml_dtypes

            ids = np.random.default_rng(seed + 7 + salt).choice(
                data.shape[0], pool, replace=False)
            if not _stage:
                _stage["f32"] = np.empty((pool,) + data.shape[1:], data.dtype)
                _stage["bf16"] = np.empty(
                    (pool,) + data.shape[1:], ml_dtypes.bfloat16)
            np.take(np.asarray(data), ids, axis=0, out=_stage["f32"])
            np.copyto(_stage["bf16"], _stage["f32"], casting="unsafe")
            return pmesh.maybe_shard(_stage["bf16"], video=shard_video)

        data_dev = draw_pool(start_step)
        if pool_refresh_every <= 0:
            # default: re-draw after ~3 passes over the pool (never if the
            # pool covers the whole dataset)
            pool_refresh_every = (
                0 if pool >= data.shape[0] else max(1, 3 * pool // batch_take))
        if pool >= data.shape[0]:
            pool_refresh_every = 0
        if logger:
            logger.info(
                "%s: pinned %d/%d samples (%.2f GB bf16) in device memory"
                "%s", log_prefix, pool, data.shape[0], data_dev.nbytes / 1e9,
                f", refreshed every {pool_refresh_every} steps"
                if pool_refresh_every else "")

        # the pool is an ARGUMENT (not a closure capture) so a refreshed
        # pool array is actually used by the already-compiled step
        def gather_step(s, key, idx, pool_arr):
            return step_fn(s, key, pool_arr[idx].astype(jnp.float32))

        def multi_gather(state, rng, idxs, pool_arr):
            keys = jax.random.split(rng, k)

            def body(s, xs):
                key, idx = xs
                s, loss = gather_step(s, key, idx, pool_arr)
                return s, loss

            state, losses = jax.lax.scan(body, state, (keys, idxs))
            return state, losses.mean()

        multi = jax.jit(multi_gather, donate_argnums=(0,)) if k > 1 else None
        single = jax.jit(gather_step, donate_argnums=(0,))
        n = pool
    else:
        data_dev = None
        multi = chunked_train_steps(step_fn, k) if k > 1 else jax.jit(
            step_fn, donate_argnums=(0,))
        single = None
        n = data.shape[0]
    tail_fn = None  # lazily-jitted single step for a final partial chunk
    order = np.random.default_rng(seed + start_step).permutation(n)
    pos = 0

    def draw(count):
        nonlocal order, pos
        out = []
        need = count
        while need > 0:
            if pos >= n:
                order = np.random.default_rng(seed + step + need).permutation(n)
                pos = 0
            got = order[pos : pos + need]
            pos += len(got)
            need -= len(got)
            out.append(got)
        return np.concatenate(out) if len(out) > 1 else out[0]

    t0 = _time.time()
    pending_losses = []
    last_log = start_step
    last_ckpt = start_step
    last_pool = start_step
    step = start_step
    while step < num_steps:
        if deadline is not None and _time.time() >= deadline:
            if logger:
                logger.info("%s: wall-clock deadline reached at step %d/%d "
                            "— stopping and checkpointing", log_prefix, step,
                            num_steps)
            break
        kk = min(k, num_steps - step)
        if checkpoint_dir and checkpoint_every < 10**9:
            # clamp the chunk at the next checkpoint cadence point so
            # milestone step numbers stay exact multiples of the cadence
            # (reference milestones: 1D/model/trainer.py:190-205)
            next_ckpt = (step // checkpoint_every + 1) * checkpoint_every
            kk = min(kk, next_ckpt - step)
        if (data_dev is not None and pool_refresh_every
                and step - last_pool >= pool_refresh_every):
            data_dev = draw_pool(step)
            order = np.random.default_rng(seed + step + 13).permutation(n)
            pos = 0
            last_pool = step
            if logger:
                logger.info("%s: refreshed device pool at step %d",
                            log_prefix, step)
        sel = draw(batch_take * kk)
        rng, key = jax.random.split(rng)
        if data_dev is not None:
            idxs = jnp.asarray(sel.reshape(kk, batch_take), jnp.int32)
            if kk == k and k > 1:
                state, loss = multi(state, key, idxs, data_dev)
            else:
                keys = jax.random.split(key, kk)
                ls = []
                for i in range(kk):
                    state, l = single(state, keys[i], idxs[i], data_dev)
                    ls.append(l)
                loss = jnp.stack(ls).mean()
        elif kk == k:
            batch = np.asarray(data[sel])
            if k > 1:
                batch = batch.reshape(k, batch_take, *batch.shape[1:])
            state, loss = multi(state, key, pmesh.maybe_shard(
                batch, axis=1 if k > 1 else 0, video=shard_video))
        else:  # final partial chunk: single steps
            batch = jnp.asarray(data[sel])
            if tail_fn is None:
                tail_fn = jax.jit(step_fn, donate_argnums=(0,))
            keys = jax.random.split(key, kk)
            ls = []
            for i in range(kk):
                b = batch[i * batch_take : (i + 1) * batch_take]
                state, l = tail_fn(state, keys[i], b)
                ls.append(l)
            loss = jnp.stack(ls).mean()
        step += kk
        # keep losses as device futures — a float() here would block the
        # host on every step and serialize dispatches over the (high
        # latency) tunnel; sync only at log boundaries. Without a logger
        # nothing ever drains the list, so don't grow it (loss errors then
        # surface at the checkpoint/final sync instead).
        if logger:
            pending_losses.append((loss, kk))
        if logger and step - last_log >= log_every:
            tot = sum(float(l) * n_ for l, n_ in pending_losses)
            cnt = sum(n_ for _, n_ in pending_losses)
            pending_losses.clear()
            logger.info(
                "%s step %d loss %.5f (%.1f steps/s)", log_prefix, step,
                tot / max(cnt, 1),
                (step - start_step) / (_time.time() - t0),
            )
            last_log = step
        if checkpoint_dir and step // checkpoint_every > last_ckpt // checkpoint_every:
            save_checkpoint(checkpoint_dir, state, step)
            last_ckpt = step
    if checkpoint_dir and step > start_step and last_ckpt != step:
        # final save at the step actually reached (== num_steps unless the
        # deadline stopped the loop early)
        save_checkpoint(checkpoint_dir, state, step)
    return state
