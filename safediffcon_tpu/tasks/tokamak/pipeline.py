"""Tokamak pipelines: pretrain + unified post-train / backward-finetune.

Replaces the reference's host-orchestrated InferencePipeline
(reference: tokamak/inference/pipeline.py:21-465) with jitted device
programs: fused guided DDIM sampling, batched conformal calibration, the
vmapped surrogate rollout for evaluation, and optax fine-tune steps.

Per reference semantics (run_epoch, pipeline.py:270-323): every epoch
FIRST recalibrates Q-hat, then either
  - posttrain mode: weighted diffusion-loss steps on train batches, with
    weights exp(-guidance_loss * scaler) over the whole train split, or
  - backward-finetune mode (InfFT): guided sampling of the test set with
    gradients through the final denoise step, minimizing the
    objective+safety loss of the samples w.r.t. model params,
then evaluates by rolling diffused actions through the KSTAR surrogate.
The optimizer is plain Adam(0.99, 0.999) with no EMA and no grad clip
(reference: tokamak/inference/pipeline.py:150-163).
"""
from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from safediffcon_tpu.parallel.mesh import maybe_replicate, maybe_shard
import optax

from safediffcon_tpu.core.diffusion import DiffusionConfig, p_losses
from safediffcon_tpu.core.sampling import ddim_sample, dpm_solver_sample
from safediffcon_tpu.core.schedules import make_schedule, get_J_scheduler
from safediffcon_tpu.core.train import (
    TrainState, accumulated_grads, make_optimizer, periodic_cosine_schedule,
    run_train_loop,
)
from safediffcon_tpu.core.conformal import normalize_weights, weighted_quantile
from safediffcon_tpu.models.unet1d import UNet1D
from safediffcon_tpu.solvers.kstar import load_kstar_params
from safediffcon_tpu.tasks.tokamak.task import (
    NT,
    N_STATES,
    PAD_SIZE,
    SCALER,
    TokamakConditioner,
    TokamakTaskConfig,
    backward_loss,
    conformal_score,
    guidance_loss,
    shift_weights,
    train_conditioner,
)
from safediffcon_tpu.tasks.tokamak.config import (
    TokamakConformalConfig,
    TokamakInferenceConfig,
    TokamakPretrainConfig,
)
from safediffcon_tpu.tasks.tokamak.data import TokamakDataset
from safediffcon_tpu.tasks.tokamak.metrics import control_trajectories, evaluate_samples

log = logging.getLogger(__name__)


def build_model(dim=128, dim_mults=(1, 2, 4, 8), groups=1, compute_dtype=None):
    dt = {None: jnp.float32, "float32": jnp.float32, "bfloat16": jnp.bfloat16}[compute_dtype]
    return UNet1D(dim=dim, dim_mults=dim_mults, channels=12,
                  resnet_block_groups=groups, compute_dtype=dt)


def init_params(model, rng):
    x = jnp.zeros((1, PAD_SIZE, 12))
    return model.init(rng, x, jnp.zeros((1,), jnp.int32))


def _normalized_targets(state_phys: jnp.ndarray) -> jnp.ndarray:
    """(B, NT, 3) physical -> the uT condition (B, NT, 2) normalized (βp, li)."""
    sc = jnp.asarray(SCALER[:N_STATES])
    norm = state_phys / sc
    return jnp.stack([norm[:, :, 0], norm[:, :, 2]], axis=-1)


class TokamakPipeline:
    """Shared machinery for calibration, sampling and evaluation."""

    def __init__(
        self,
        conf_cfg: TokamakConformalConfig,
        dim: int = 128,
        dim_mults=(1, 2, 4, 8),
        groups: int = 1,
        compute_dtype: str = None,
        cal_chunk: int = 50,
    ):
        self.ccfg = conf_cfg
        self.cal_chunk = cal_chunk  # chip-efficient calibration sub-batching
        self.task_cfg = TokamakTaskConfig(
            safety_threshold=conf_cfg.safety_threshold,
            w_obj=conf_cfg.w_obj,
            w_safe=conf_cfg.w_safe,
            guidance_scaler=conf_cfg.guidance_scaler,
            alpha=conf_cfg.alpha,
        )
        self.model = build_model(dim, dim_mults, groups, compute_dtype)
        self.apply_fn = lambda params, x, t: self.model.apply(params, x, t)
        self.sched = make_schedule(conf_cfg.timesteps, "cosine")
        self.diff_cfg = DiffusionConfig(
            timesteps=conf_cfg.timesteps,
            sampling_timesteps=conf_cfg.ddim_sampling_steps,
            ddim_eta=conf_cfg.ddim_eta,
        )
        self.j_scheduler = get_J_scheduler(conf_cfg.J_scheduler)
        # fast-sampler option (beyond reference parity): DPM-Solver++(2M).
        # Calibration uses the SAME sampler as test sampling, or Q-hat
        # loses its coverage meaning for the deployed sampler.
        self.sampler_fn = (dpm_solver_sample if conf_cfg.sampler == "dpm"
                           else ddim_sample)
        self.solver_params = load_kstar_params()
        tc = self.task_cfg

        @jax.jit
        def _cal_batch(params, rng, state, state_target, Q):
            """Calibration batch: sample conditioned on ground-truth actions
            + u0 + full (βp, li) trajectories; score + weight
            (reference: tokamak/inference/conformal.py:34-117)."""
            cond = TokamakConditioner(
                u0=state[:, 0, :N_STATES],
                uT=jnp.stack([state[:, :NT, 0], state[:, :NT, 2]], axis=-1),
                w=state[:, :, N_STATES:],
            )
            out = self.sampler_fn(
                self.apply_fn, params, self.sched, self.diff_cfg, rng,
                state.shape, cond=cond,
            )
            scores = conformal_score(out, state)
            weights = shift_weights(state, state_target, Q, tc)
            # composite weight factors (reference:
            # tokamak/inference/conformal.py:84-100): train mode with
            # guidance squares the factor; test mode after post-training
            # multiplies a factor at the posttrain checkpoint's quantile
            # and guidance hyperparameters.
            if conf_cfg.finetune_set == "train" and conf_cfg.use_guidance:
                weights = weights * shift_weights(state, state_target, Q, tc)
            if (conf_cfg.finetune_set == "test"
                    and not conf_cfg.wo_post_train
                    and conf_cfg.finetune_quantile is not None):
                tc_ft = dataclasses.replace(
                    tc,
                    w_obj=conf_cfg.finetune_w_obj,
                    w_safe=conf_cfg.finetune_w_safe,
                    guidance_scaler=conf_cfg.finetune_guidance_scaler,
                )
                weights = weights * shift_weights(
                    state, state_target, conf_cfg.finetune_quantile, tc_ft
                )
            return scores, weights

        self._cal_batch = _cal_batch

        @functools.partial(jax.jit, static_argnames=("guided", "final_step_grad"))
        def _sample_test(params, rng, state, state_target, Q,
                         guided=False, final_step_grad=False):
            """Test sampling conditioned on (u0, target trajectories);
            returns PHYSICAL-unit predictions
            (reference: tokamak/inference/pipeline.py:381-407)."""
            cond = TokamakConditioner(
                u0=state[:, 0, :N_STATES],
                uT=jnp.stack([state[:, :NT, 0], state[:, :NT, 2]], axis=-1),
            )
            g = None
            if guided:
                g = jax.grad(
                    lambda x: (guidance_loss(x, state_target, Q, tc)
                               * tc.guidance_scaler).sum()
                )
            out = self.sampler_fn(
                self.apply_fn, params, self.sched, self.diff_cfg, rng,
                state.shape, cond=cond, guidance_grad=g,
                j_scheduler=self.j_scheduler, final_step_grad=final_step_grad,
            )
            return out * jnp.asarray(SCALER)

        self._sample_test = _sample_test

        @functools.partial(jax.jit, static_argnames=("guided",))
        def _evaluate(params, rng, state, state_target, Q, guided=False):
            """Sample -> surrogate rollout -> metrics, one fused program
            (reference: tokamak/inference/pipeline.py:325-359)."""
            pred = _sample_test(params, rng, state, state_target, Q, guided=guided)
            controlled = control_trajectories(self.solver_params, pred)
            return evaluate_samples(pred, controlled, state_target,
                                    tc.safety_threshold)

        self._evaluate = _evaluate

        @jax.jit
        def _weights_batch(state, state_target, Q):
            return shift_weights(state, state_target, Q, tc)

        self._weights_batch = _weights_batch

    def calibrate(self, params, cal: TokamakDataset, Q, rng) -> jnp.ndarray:
        bs = self.ccfg.cal_batch_size
        chunk = min(self.cal_chunk or bs, bs)
        scores, weights = [], []
        for i in range(self.ccfg.num_cal_batch):
            for lo in range(0, bs, chunk):
                sl = slice(i * bs + lo, i * bs + lo + chunk)
                rng, key = jax.random.split(rng)
                s, w = self._cal_batch(
                    maybe_replicate(params), key, maybe_shard(cal.data[sl]),
                    maybe_shard(cal.state_phys[sl]), Q
                )
                scores.append(s)
                weights.append(w)
        scores = jnp.concatenate(scores)
        weights = normalize_weights(jnp.concatenate(weights))
        return weighted_quantile(weights * scores, self.ccfg.alpha)

    def reweights(self, data: TokamakDataset, Q, batch_size: int = 4096) -> np.ndarray:
        ws = []
        for lo in range(0, len(data), batch_size):
            sl = slice(lo, lo + batch_size)
            ws.append(self._weights_batch(
                maybe_shard(data.data[sl]), maybe_shard(data.state_phys[sl]), Q))
        return np.asarray(normalize_weights(jnp.concatenate(ws)))

    def evaluate(self, params, test: TokamakDataset, Q, rng, guided=None) -> Dict:
        guided = self.ccfg.use_guidance if guided is None else guided
        m = self._evaluate(
            maybe_replicate(params), rng, maybe_shard(test.data),
            maybe_shard(test.state_phys), Q,
            guided=guided,
        )
        return {k: float(v) for k, v in m.items()}


# ---------------------------------------------------------------------------
# Pretraining (same Trainer recipe as the 1D task,
# reference: tokamak/model/trainer.py)
# ---------------------------------------------------------------------------

def pretrain(
    cfg: TokamakPretrainConfig,
    train_data: TokamakDataset,
    num_steps: Optional[int] = None,
    log_every: int = 500,
    checkpoint_dir: Optional[str] = None,
    params=None,
    resume_dir: Optional[str] = None,
    steps_per_call: int = 1,
    deadline: Optional[float] = None,
):
    num_steps = num_steps or cfg.train_num_steps
    model = build_model(cfg.dim, cfg.dim_mults, cfg.resnet_block_groups,
                        getattr(cfg, 'compute_dtype', None))
    apply_fn = lambda p, x, t: model.apply(p, x, t)
    sched = make_schedule(cfg.timesteps, cfg.beta_schedule, cfg.objective)
    dcfg = DiffusionConfig(timesteps=cfg.timesteps, objective=cfg.objective)
    cond = train_conditioner()

    rng = jax.random.PRNGKey(cfg.seed)
    if params is None:
        rng, key = jax.random.split(rng)
        params = init_params(model, key)

    lr = periodic_cosine_schedule(cfg.lr, cfg.cosine_t_max)
    tx = make_optimizer("adam", lr, betas=cfg.adam_betas, max_grad_norm=cfg.max_grad_norm)
    state = TrainState.create(params, tx, cfg.ema_decay, cfg.ema_update_every)
    start_step = 0
    if resume_dir is not None:
        # Full-state resume: restores step/opt_state/EMA so the LR schedule,
        # Adam moments and EMA history continue where they left off
        # (reference: 2d Trainer resume, 2d/ddpm/diffusion_2d.py:483-484).
        from safediffcon_tpu.utils.checkpoint import latest_step, load_checkpoint

        last = latest_step(resume_dir)
        if last is not None:
            target = {
                "step": np.zeros((), np.int32),
                "params": state.params,
                "opt_state": state.opt_state,
                "ema_params": state.ema_params,
            }
            restored = load_checkpoint(resume_dir, last, target=target)
            state = state.replace(
                step=jnp.asarray(restored["step"]),
                params=restored["params"],
                opt_state=restored["opt_state"],
                ema_params=restored["ema_params"],
            )
            start_step = int(restored["step"])
            log.info("resumed from %s step %d", resume_dir, start_step)

    accum = max(getattr(cfg, "gradient_accumulate_every", 1), 1)

    def _loss(params, rng, batch):
        rng_t, rng_n = jax.random.split(rng)
        b = batch.shape[0]
        t = jax.random.randint(rng_t, (b,), 0, dcfg.timesteps)
        noise = jax.random.normal(rng_n, batch.shape, dtype=batch.dtype)
        return p_losses(apply_fn, params, sched, dcfg, batch, t, noise, cond).mean()

    _accum_grads = accumulated_grads(_loss, accum)

    def step_fn(state, rng, batch):
        # batch: (accum * batch_size, ...) -> (accum, batch_size, ...)
        batches = batch.reshape(accum, -1, *batch.shape[1:])
        loss, grads = _accum_grads(state.params, rng, batches)
        return state.apply_gradients(grads), loss

    return run_train_loop(
        step_fn, state, train_data.data,
        batch_take=cfg.batch_size * accum, num_steps=num_steps, rng=rng,
        start_step=start_step, seed=cfg.seed, steps_per_call=steps_per_call,
        log_every=log_every, checkpoint_every=cfg.checkpoint_every,
        checkpoint_dir=checkpoint_dir, logger=log, log_prefix="tokamak pretrain",
        deadline=deadline,
    )


# ---------------------------------------------------------------------------
# Unified inference pipeline: post-train or backward finetune
# ---------------------------------------------------------------------------

def run_inference(
    cfg: TokamakInferenceConfig,
    pipeline: TokamakPipeline,
    params,
    train_data: Optional[TokamakDataset],
    cal_data: TokamakDataset,
    test_data: TokamakDataset,
    on_epoch=None,
    state_dir: Optional[str] = None,
):
    """Reference run() loop (tokamak/inference/pipeline.py:409-465):
    per epoch calibrate -> finetune -> evaluate. Returns
    (params, Q, metrics list). `on_epoch(epoch_record)` fires after each
    epoch; `state_dir` persists (params, opt moments, Q) per epoch and
    auto-resumes from the latest saved epoch (per-epoch fold_in RNG makes
    the resumed run bit-identical to an uninterrupted one)."""
    from safediffcon_tpu.utils.checkpoint import (
        load_phase_history, load_phase_state, save_phase_history,
        save_phase_state,
    )

    ccfg = cfg.conformal
    tc = pipeline.task_cfg
    apply_fn = pipeline.apply_fn
    sched = pipeline.sched
    dcfg_train = DiffusionConfig(timesteps=ccfg.timesteps)
    cond_train = train_conditioner()

    # plain Adam(0.99, 0.999), no EMA/clip (reference: pipeline.py:150-163)
    tx = make_optimizer(cfg.optimizer, cfg.finetune_lr, betas=(0.99, 0.999),
                        max_grad_norm=0.0)
    opt_state = tx.init(params)

    @jax.jit
    def weighted_step(params, opt_state, rng, batch, w):
        def loss_fn(p):
            rng_t, rng_n = jax.random.split(rng)
            b = batch.shape[0]
            t = jax.random.randint(rng_t, (b,), 0, dcfg_train.timesteps)
            noise = jax.random.normal(rng_n, batch.shape, dtype=batch.dtype)
            per = p_losses(apply_fn, p, sched, dcfg_train, batch, t, noise, cond_train)
            return cfg.loss_weight_train * (w * per).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    @jax.jit
    def backward_step(params, opt_state, rng, test_batch, state_target, Q):
        """Sample with final-step gradients, minimize the objective+safety
        loss of the samples (reference: pipeline.py:238-268)."""

        def loss_fn(p):
            cond = TokamakConditioner(
                u0=test_batch[:, 0, :N_STATES],
                uT=jnp.stack([test_batch[:, :NT, 0], test_batch[:, :NT, 2]], axis=-1),
            )
            g = None
            if ccfg.use_guidance:
                g = jax.grad(lambda x: (guidance_loss(x, state_target, Q, tc)
                                        * tc.guidance_scaler).sum())
            out = pipeline.sampler_fn(
                apply_fn, p, sched, pipeline.diff_cfg, rng, test_batch.shape,
                cond=cond, guidance_grad=g, j_scheduler=pipeline.j_scheduler,
                final_step_grad=True,
            )
            return backward_loss(out * jnp.asarray(SCALER), state_target, Q, tc)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    base_rng = jax.random.PRNGKey(cfg.seed)
    Q = jnp.zeros(())
    start_epoch = 0
    all_metrics = []
    if state_dir is not None:
        restored = load_phase_state(state_dir, params, opt_state)
        if restored is not None:
            params, opt_state, Q, last_epoch = restored
            params = maybe_replicate(params)  # restored leaves are host arrays
            opt_state = maybe_replicate(opt_state)
            start_epoch = last_epoch + 1
            all_metrics = load_phase_history(
                state_dir, max_epoch=last_epoch, config_repr=repr(cfg))
            log.info("tokamak finetune: resumed phase state after epoch %d "
                     "from %s", last_epoch, state_dir)
            for rec in all_metrics:
                if on_epoch is not None:
                    on_epoch(rec)
    for epoch in range(start_epoch, cfg.finetune_epoch):
        rng = jax.random.fold_in(base_rng, epoch)
        rng, key = jax.random.split(rng)
        Q = pipeline.calibrate(params, cal_data, Q, key)

        losses = []
        if cfg.backward_finetune:
            for lo in range(0, len(test_data), ccfg.test_batch_size):
                sl = slice(lo, lo + ccfg.test_batch_size)
                rng, key = jax.random.split(rng)
                for _ in range(cfg.finetune_steps):
                    rng, key = jax.random.split(rng)
                    params, opt_state, loss = backward_step(
                        params, opt_state, key,
                        maybe_shard(test_data.data[sl]),
                        maybe_shard(test_data.state_phys[sl]), Q,
                    )
                    losses.append(float(loss))
        else:
            w_train = pipeline.reweights(train_data, Q)
            n = len(train_data)
            pos = 0
            for _ in range(cfg.finetune_steps):
                sel = np.arange(pos, pos + cfg.train_batch_size) % n
                pos = (pos + cfg.train_batch_size) % n
                rng, key = jax.random.split(rng)
                params, opt_state, loss = weighted_step(
                    params, opt_state, key,
                    maybe_shard(train_data.data[sel]), maybe_shard(w_train[sel]),
                )
                losses.append(float(loss))

        rng, key = jax.random.split(rng)
        metrics = pipeline.evaluate(params, test_data, Q, key)
        log.info("tokamak epoch %d Q %.4f loss %.5f metrics %s",
                 epoch, float(Q), float(np.mean(losses)) if losses else float("nan"),
                 metrics)
        all_metrics.append(
            {"epoch": epoch, "quantile": float(Q),
             "loss": float(np.mean(losses)) if losses else None, "eval": metrics}
        )
        # persist state+history BEFORE the callback (see smoke run_inference)
        if state_dir is not None:
            save_phase_state(state_dir, params, opt_state, Q, epoch)
            save_phase_history(state_dir, all_metrics, config_repr=repr(cfg))
        if on_epoch is not None:
            on_epoch(all_metrics[-1])
    return params, Q, all_metrics


def run_inference_resilient(
    cfg: TokamakInferenceConfig,
    make_pipeline,
    params,
    train_data: Optional[TokamakDataset],
    cal_data: TokamakDataset,
    test_data: TokamakDataset,
    on_epoch=None,
    state_dir: Optional[str] = None,
    fault_retries: int = 2,
    backoff_s: float = 30.0,
):
    """`run_inference` that survives a TPU worker crash mid-phase: the
    backend is re-initialized, a fresh pipeline built via `make_pipeline()`
    (the old one's jitted programs capture now-dead device constants), and
    the phase resumes bit-identically from the epoch state in `state_dir`
    (utils/faults.py; same machinery as the smoke pipeline's wrapper)."""
    from safediffcon_tpu.utils.faults import resilient_phase

    return resilient_phase(
        make_pipeline,
        lambda pipe, p: run_inference(
            cfg, pipe, p, train_data, cal_data, test_data,
            on_epoch=on_epoch, state_dir=state_dir),
        params, retries=fault_retries, backoff_s=backoff_s,
        describe="tokamak finetune")
