"""End-to-end pipelines for the 1D Burgers task: pretrain, conformal
calibration, post-training, inference-time fine-tuning, evaluation.

Replaces the reference's host-orchestrated pipelines
(reference: 1D/model/trainer.py:150-210, 1D/posttrain/post_train.py:25-470,
1D/inference/inference_ft.py:26-433) with a handful of jitted device
programs:

  - `calibrate`: sample the cal set conditioned on ground-truth controls,
    score, weight, quantile — each batch one fused sampler call, the
    quantile a sort on device.
  - `evaluate`: guided sampling -> FD solver rollout -> J / safety metrics,
    all one jit.
  - `posttrain_epoch` / `infft_epoch`: reweighted diffusion loss /
    through-the-last-denoise-step gradient, optax updates, EMA.

Data parallelism: batches can be sharded over a 1-axis mesh
(`parallel.mesh`); params stay replicated, XLA inserts the collectives.
"""
from __future__ import annotations

import dataclasses
import functools
import logging
import math
import time
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from safediffcon_tpu.core.diffusion import DiffusionConfig, p_losses
from safediffcon_tpu.core.sampling import (
    compose_two_model_apply, ddim_sample, dpm_solver_sample, sample,
)
from safediffcon_tpu.core.schedules import make_schedule, get_J_scheduler
from safediffcon_tpu.core.train import (
    TrainState,
    accumulated_grads,
    chunked_train_steps,
    make_optimizer,
    periodic_cosine_schedule,
    run_train_loop,
    warmup_cosine_schedule,
)
from safediffcon_tpu.core.conformal import normalize_weights, weighted_quantile
from safediffcon_tpu.parallel.mesh import maybe_replicate, maybe_shard
from safediffcon_tpu.models.unet2d import UNet2D
from safediffcon_tpu.tasks.burgers.task import (
    PAD_SIZE,
    NX,
    NT,
    SCALER,
    COND_IDX,
    BurgersConditioner,
    BurgersTaskConfig,
    ModelWConditioner,
    conformal_score,
    guidance_values,
    infft_loss,
    mask_model_w_input,
    mask_model_w_output,
    shift_weights,
    train_conditioner,
)
from safediffcon_tpu.tasks.burgers.config import (
    BurgersConformalConfig,
    BurgersInfFTConfig,
    BurgersPostTrainConfig,
    BurgersPretrainConfig,
)
from safediffcon_tpu.tasks.burgers.data import BurgersDataset
from safediffcon_tpu.tasks.burgers.metrics import control_trajectories, evaluate_samples

log = logging.getLogger(__name__)


def build_model(dim=128, dim_mults=(1, 2, 4, 8), groups=1, compute_dtype=None):
    import jax.numpy as jnp
    dt = {None: jnp.float32, "float32": jnp.float32, "bfloat16": jnp.bfloat16}[compute_dtype]
    return UNet2D(dim=dim, dim_mults=dim_mults, channels=3,
                  resnet_block_groups=groups, compute_dtype=dt)


def init_params(model, rng):
    x = jnp.zeros((1, PAD_SIZE, NX, 3))
    return model.init(rng, x, jnp.zeros((1,), jnp.int32))


class BurgersPipeline:
    """Shared machinery for all Burgers phases."""

    def __init__(
        self,
        conf_cfg: BurgersConformalConfig,
        dim: int = 128,
        dim_mults=(1, 2, 4, 8),
        groups: int = 1,
        compute_dtype: str = None,
        cal_chunk: int = 50,
        two_model: bool = False,
        prior_beta: float = 1.0,
        normalize_beta: bool = False,
    ):
        self.ccfg = conf_cfg
        # chip-efficient sub-batching of calibration sampling (batch-250
        # DDIM runs ~2x fewer samples/s than batch-50 on a v5e chip);
        # mathematically identical — scores/weights are per-sample.
        self.cal_chunk = cal_chunk
        self.task_cfg = BurgersTaskConfig(
            u_bound=conf_cfg.u_bound,
            use_max_safety=conf_cfg.use_max_safety,
            w_score=conf_cfg.w_score,
            alpha=conf_cfg.alpha,
        )
        self.model = build_model(dim, dim_mults, groups, compute_dtype)
        self.apply_fn = lambda params, x, t: self.model.apply(params, x, t)
        self.two_model = two_model
        if two_model:
            # Two-model composed sampling: the denoiser is corrected by a
            # w-only prior model; `params` becomes (params_uw, params_w)
            # everywhere in this pipeline. Same UNet2D topology for both
            # (the reference's eval_two_models surface,
            # 1D/model/diffusion.py:226-239; beyond parity: the reference
            # restricts composition to the ancestral sampler — its
            # ddim_sample asserts eval_two_models off, :489 — while this
            # composed apply_fn works under every sampler here).
            self.apply_fn = compose_two_model_apply(
                self.apply_fn, self.apply_fn,
                prior_beta=prior_beta, normalize_beta=normalize_beta,
                mask_w_input=mask_model_w_input,
                mask_w_output=mask_model_w_output,
            )
        self.sched = make_schedule(conf_cfg.timesteps, "cosine")
        self.diff_cfg = DiffusionConfig(
            timesteps=conf_cfg.timesteps,
            sampling_timesteps=conf_cfg.ddim_sampling_steps,
            ddim_eta=conf_cfg.ddim_eta,
            noise_matched_cond=getattr(conf_cfg, "dpm_noise_matched_cond",
                                       False),
        )
        self.j_scheduler = get_J_scheduler(conf_cfg.J_scheduler)
        # fast-sampler option (beyond reference parity): DPM-Solver++(2M)
        self._sampler = (
            dpm_solver_sample if getattr(conf_cfg, "sampler", "ddim") == "dpm"
            else ddim_sample
        )
        # calibration must use the SAME sampler as test sampling, or Q-hat
        # loses its coverage meaning for the deployed sampler
        self._cal_sampler = (
            dpm_solver_sample if getattr(conf_cfg, "sampler", "ddim") == "dpm"
            else sample
        )

        tc = self.task_cfg

        # ---- jitted building blocks -------------------------------------
        @jax.jit
        def _cal_batch(params, rng, state, Q):
            """One calibration batch: sample conditioned on ground-truth
            control, return (scores, weights)
            (reference: 1D/posttrain/conformal.py:43-88)."""
            cond = BurgersConditioner(
                u0=state[:, 0, :, 0], uT=state[:, COND_IDX, :, 0], w=state[:, :, :, 1]
            )
            out = self._cal_sampler(
                self.apply_fn, params, self.sched, self.diff_cfg, rng,
                state.shape, cond=cond, guidance_grad=None,
            )
            scores = conformal_score(out, state, tc.use_max_safety)
            weights = shift_weights(state, Q, tc)
            if conf_cfg.InfFT_Q is not None:
                # composite InfFT weight: second factor at the fixed InfFT_Q
                # (reference: 1D/inference/conformal.py:67-73)
                weights = weights * shift_weights(state, conf_cfg.InfFT_Q, tc)
            return scores, weights

        self._cal_batch = _cal_batch

        @functools.partial(jax.jit, static_argnames=("guided", "final_step_grad"))
        def _sample_test(params, rng, state, Q, guided=True, final_step_grad=False):
            """Guided sampling conditioned on (u0, uT); returns UNSCALED
            prediction (reference: 1D/inference/inference_ft.py:316-347)."""
            cond = BurgersConditioner(u0=state[:, 0, :, 0], uT=state[:, COND_IDX, :, 0])
            if guided:
                g = jax.grad(lambda x: guidance_values(x, Q, tc).sum())
            else:
                g = None
            out = self._sampler(
                self.apply_fn, params, self.sched, self.diff_cfg, rng,
                state.shape, cond=cond, guidance_grad=g,
                j_scheduler=self.j_scheduler, final_step_grad=final_step_grad,
            )
            return out * SCALER

        self._sample_test = _sample_test

        @functools.partial(jax.jit, static_argnames=("guided",))
        def _evaluate(params, rng, state, u_target, Q, guided=True):
            """Sample -> solver rollout -> metrics, one fused program
            (reference: 1D/posttrain/post_train.py:313-351)."""
            pred = _sample_test(params, rng, state, Q, guided=guided)
            controlled = control_trajectories(pred, NT)
            return evaluate_samples(pred, controlled, u_target, tc.u_bound)

        self._evaluate = _evaluate

        @jax.jit
        def _weights_batch(state, Q):
            return shift_weights(state, Q, tc)

        self._weights_batch = _weights_batch

    # ---- conformal calibration ------------------------------------------

    def calibrate(self, params, cal_data: np.ndarray, Q, rng) -> jnp.ndarray:
        """Full calibration pass -> Q-hat
        (reference: 1D/posttrain/post_train.py:353-365)."""
        bs = self.ccfg.cal_batch_size
        chunk = min(self.cal_chunk or bs, bs)
        params = maybe_replicate(params)
        n = len(cal_data)
        scores, weights = [], []
        for i in range(self.ccfg.num_cal_batch):
            for lo in range(0, bs, chunk):
                base = i * bs + lo
                if base >= n:  # cal set smaller than the configured batches
                    break
                batch = maybe_shard(cal_data[base : min(base + chunk, n)])
                rng, key = jax.random.split(rng)
                s, w = self._cal_batch(params, key, batch, Q)
                scores.append(s)
                weights.append(w)
        scores = jnp.concatenate(scores)
        weights = normalize_weights(jnp.concatenate(weights))
        return weighted_quantile(weights * scores, self.ccfg.alpha)

    # ---- reweights over a split -----------------------------------------

    def reweights(self, data: np.ndarray, Q, batch_size: int = 2048) -> jnp.ndarray:
        ws = []
        for lo in range(0, len(data), batch_size):
            ws.append(self._weights_batch(maybe_shard(data[lo : lo + batch_size]), Q))
        return normalize_weights(jnp.concatenate(ws))

    # ---- evaluation ------------------------------------------------------

    def evaluate(self, params, test: BurgersDataset, Q, rng, guided=True) -> Dict:
        state = maybe_shard(test.data)
        u_target = maybe_shard(test.u_phys)
        metrics = self._evaluate(maybe_replicate(params), rng, state, u_target,
                                 Q, guided=guided)
        return {k: float(v) for k, v in metrics.items()}


# ---------------------------------------------------------------------------
# Pretraining
# ---------------------------------------------------------------------------

def pretrain(
    cfg: BurgersPretrainConfig,
    train_data: BurgersDataset,
    num_steps: Optional[int] = None,
    log_every: int = 500,
    checkpoint_dir: Optional[str] = None,
    params=None,
    resume_dir: Optional[str] = None,
    steps_per_call: int = 1,
    model_w: bool = False,
    deadline: Optional[float] = None,
):
    """Pretrain loop (reference: 1D/model/trainer.py:150-210).

    model_w=True trains the w-only prior p(w | u0, uT) instead: the net
    never sees u_1..u_{T-1} and carries no loss on the u channel
    (reference is_model_w training, 1D/model/diffusion.py:678-679,718-720).
    The resulting checkpoint is the prior for two-model composed sampling
    (BurgersPipeline(two_model=True))."""
    num_steps = num_steps or cfg.train_num_steps
    model = build_model(cfg.dim, cfg.dim_mults, cfg.resnet_block_groups,
                        getattr(cfg, 'compute_dtype', None))
    apply_fn = lambda p, x, t: model.apply(p, x, t)
    sched = make_schedule(cfg.timesteps, cfg.beta_schedule, cfg.objective)
    dcfg = DiffusionConfig(timesteps=cfg.timesteps, objective=cfg.objective)
    if model_w:
        base_apply = apply_fn
        apply_fn = lambda p, x, t: base_apply(p, mask_model_w_input(x), t)
        cond = ModelWConditioner()
    else:
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
        checkpoint_dir=checkpoint_dir, logger=log, log_prefix="burgers pretrain",
        deadline=deadline,
    )


# ---------------------------------------------------------------------------
# Post-training (conformal reweighted fine-tuning)
# ---------------------------------------------------------------------------

def posttrain(
    cfg: BurgersPostTrainConfig,
    pipeline: BurgersPipeline,
    params,
    finetune_data: BurgersDataset,
    cal_data: BurgersDataset,
    test_data: BurgersDataset,
    finetune_steps: Optional[int] = None,
    eval_every_subset_epoch: bool = True,
    state_dir: Optional[str] = None,
):
    """Conformal post-training (reference: 1D/posttrain/post_train.py:262-311).

    Per epoch: per-sample reweights from exp(-guidance(x, Q)), N reweighted
    diffusion-loss steps, Q-hat recalibration, solver evaluation.
    `state_dir` persists the full TrainState (+ Q) per epoch and
    auto-resumes from the latest saved epoch; per-epoch fold_in RNG makes
    a resumed run bit-identical to an uninterrupted one.
    """
    from safediffcon_tpu.utils.checkpoint import (
        load_phase_history, load_phase_trainstate, save_checkpoint,
        save_phase_history,
    )
    ccfg = cfg.conformal
    steps_per_epoch = finetune_steps or cfg.finetune_steps

    apply_fn = pipeline.apply_fn
    sched = pipeline.sched
    dcfg = DiffusionConfig(timesteps=ccfg.timesteps)  # training uses full T
    cond = train_conditioner()

    warmup = int(0.05 * steps_per_epoch)
    lr = warmup_cosine_schedule(
        cfg.finetune_lr, warmup, cfg.finetune_subset_size * cfg.cosine_epoch
    )
    tx = make_optimizer(
        cfg.optimizer, lr, weight_decay=cfg.weight_decay, betas=(0.9, 0.999),
        max_grad_norm=cfg.max_grad_norm,
    )
    state = maybe_replicate(
        TrainState.create(params, tx, cfg.ema_decay, cfg.ema_update_every))

    def finetune_step(state, rng, xw):
        batch, w = xw

        def loss_fn(params):
            rng_t, rng_n = jax.random.split(rng)
            b = batch.shape[0]
            t = jax.random.randint(rng_t, (b,), 0, dcfg.timesteps)
            noise = jax.random.normal(rng_n, batch.shape, dtype=batch.dtype)
            per = p_losses(apply_fn, params, sched, dcfg, batch, t, noise, cond)
            return (w * per).mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    single_step = jax.jit(finetune_step)
    k = max(int(getattr(cfg, "steps_per_call", 1)), 1)
    multi_step = chunked_train_steps(finetune_step, k, donate=False) if k > 1 else None

    def _epoch_sels():
        # sequential windows with the reference's reset-on-overflow walk
        # (1D/posttrain/post_train.py batch cycling)
        sels, pos = [], 0
        for _ in range(steps_per_epoch):
            if pos + cfg.finetune_batch_size > n:
                pos = 0
            sels.append(np.arange(pos, pos + cfg.finetune_batch_size) % n)
            pos += cfg.finetune_batch_size
        return np.asarray(sels)  # (steps, B)

    base_rng = jax.random.PRNGKey(cfg.seed)
    Q = jnp.zeros(())
    start_epoch = 0
    all_metrics = []
    if state_dir is not None:
        restored = load_phase_trainstate(state_dir, state)
        if restored is not None:
            state, Q, last_epoch = restored
            state = maybe_replicate(state)  # restored leaves are host arrays
            start_epoch = last_epoch + 1
            all_metrics = load_phase_history(
                state_dir, max_epoch=last_epoch, config_repr=repr(cfg))
            log.info("posttrain: resumed phase state after epoch %d from %s",
                     last_epoch, state_dir)
    n = len(finetune_data)
    # Eval fires when the cumulative sample count hits a multiple of the
    # subset size — the reference condition ((it+1)*batch) % subset == 0
    # (1D/posttrain/post_train.py:288) is equivalent to
    # it % (subset / gcd(batch, subset)) == 0, which also stays well-formed
    # when batch does not divide (or exceeds) the subset size.
    eval_period = (
        cfg.finetune_subset_size
        // math.gcd(cfg.finetune_batch_size, cfg.finetune_subset_size)
        if eval_every_subset_epoch else steps_per_epoch
    )
    for epoch in range(start_epoch, cfg.finetune_epoch):
        rng = jax.random.fold_in(base_rng, epoch)
        w_train = np.asarray(pipeline.reweights(finetune_data.data, Q))
        sels = _epoch_sels()
        epoch_losses = []
        eval_history = []
        it = 0
        while it < steps_per_epoch:
            seg = min(eval_period - it % eval_period, steps_per_epoch - it)
            kk = min(k, seg)
            sel = sels[it : it + kk].reshape(-1)
            batch = np.asarray(finetune_data.data[sel])
            w = np.asarray(w_train[sel])
            rng, key = jax.random.split(rng)
            if kk > 1 and kk == k:
                shape = (kk, cfg.finetune_batch_size)
                state, loss = multi_step(
                    state, key,
                    (maybe_shard(batch.reshape(shape + batch.shape[1:]), axis=1),
                     maybe_shard(w.reshape(shape), axis=1)),
                )
            else:
                keys = jax.random.split(key, kk)
                ls = []
                for i in range(kk):
                    lo = i * cfg.finetune_batch_size
                    hi = lo + cfg.finetune_batch_size
                    state, l = single_step(
                        state, keys[i],
                        (maybe_shard(batch[lo:hi]), maybe_shard(w[lo:hi])))
                    ls.append(l)
                loss = jnp.stack(ls).mean()
            it += kk
            epoch_losses.extend([float(loss)] * kk)
            if eval_every_subset_epoch and it % eval_period == 0:
                rng, key = jax.random.split(rng)
                m = pipeline.evaluate(state.ema_params, test_data, Q, key)
                eval_history.append(m)
                log.info("epoch %d it %d eval %s", epoch, it, m)
        if epoch != cfg.finetune_epoch - 1:
            rng, key = jax.random.split(rng)
            Q = pipeline.calibrate(state.ema_params, cal_data.data, Q, key)
            log.info("epoch %d Q-hat %.5f", epoch, float(Q))
        all_metrics.append(
            {
                "epoch": epoch,
                "loss": float(np.mean(epoch_losses)) if epoch_losses else None,
                "eval_history": eval_history,
                "quantile": float(Q),
            }
        )
        if state_dir is not None:
            save_checkpoint(state_dir, state, step=epoch, Q=Q)
            save_phase_history(state_dir, all_metrics, config_repr=repr(cfg))
    return state, Q, all_metrics


# ---------------------------------------------------------------------------
# Inference-time fine-tuning (InfFT)
# ---------------------------------------------------------------------------

def inference_finetune(
    cfg: BurgersInfFTConfig,
    pipeline: BurgersPipeline,
    params,
    cal_data: BurgersDataset,
    test_data: BurgersDataset,
    state_dir: Optional[str] = None,
):
    """InfFT (reference: 1D/inference/inference_ft.py:228-433): per epoch,
    sample the test set with guidance keeping the final denoise step
    differentiable, minimize MSE(relu(s + Q - bound^2), 0) w.r.t. params,
    recalibrate Q-hat, evaluate. The last epoch is evaluation-only.
    `state_dir`: per-epoch TrainState persistence + exact resume (see
    `posttrain`).
    """
    from safediffcon_tpu.utils.checkpoint import (
        load_phase_history, load_phase_trainstate, save_checkpoint,
        save_phase_history,
    )
    ccfg = cfg.conformal
    tc = pipeline.task_cfg
    apply_fn = pipeline.apply_fn
    sched = pipeline.sched
    dcfg = pipeline.diff_cfg
    j_sched = pipeline.j_scheduler

    lr = periodic_cosine_schedule(
        cfg.finetune_lr, max(int(cfg.InfFT_iters * cfg.cosine_ratio), 1), eta_min=1e-6
    )
    tx = make_optimizer(
        cfg.optimizer, lr, weight_decay=cfg.weight_decay, betas=(0.9, 0.999),
        max_grad_norm=cfg.max_grad_norm,
    )
    state = maybe_replicate(
        TrainState.create(params, tx, cfg.ema_decay, cfg.ema_update_every))

    @jax.jit
    def infft_step(state, rng, test_batch, Q):
        """Sample (grad through final step only) then backprop the safety
        objective into params."""

        def loss_fn(params):
            cond = BurgersConditioner(
                u0=test_batch[:, 0, :, 0], uT=test_batch[:, COND_IDX, :, 0]
            )
            g = jax.grad(lambda x: guidance_values(x, Q, tc).sum())
            out = pipeline._sampler(
                apply_fn, params, sched, dcfg, rng, test_batch.shape,
                cond=cond, guidance_grad=g, j_scheduler=j_sched,
                final_step_grad=True,
            )
            return infft_loss(out * SCALER, Q, tc)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    base_rng = jax.random.PRNGKey(cfg.seed)
    Q = jnp.zeros(())
    start_epoch = 0
    all_metrics = []
    if state_dir is not None:
        restored = load_phase_trainstate(state_dir, state)
        if restored is not None:
            state, Q, last_epoch = restored
            state = maybe_replicate(state)  # restored leaves are host arrays
            start_epoch = last_epoch + 1
            all_metrics = load_phase_history(
                state_dir, max_epoch=last_epoch, config_repr=repr(cfg))
            log.info("InfFT: resumed phase state after epoch %d from %s",
                     last_epoch, state_dir)
    # The reference runs InfFT_iters-1 finetuning epochs: its loop skips all
    # work on the final index (reference: run():415-418), so the last recorded
    # eval happens after the (InfFT_iters-1)-th calibration.
    for epoch in range(start_epoch, cfg.InfFT_iters - 1):
        rng = jax.random.fold_in(base_rng, epoch)
        losses = []
        for lo in range(0, len(test_data), ccfg.test_batch_size):
            batch = maybe_shard(test_data.data[lo : lo + ccfg.test_batch_size])
            rng, key = jax.random.split(rng)
            state, loss = infft_step(state, key, batch, Q)
            losses.append(float(loss))
        rng, key = jax.random.split(rng)
        Q = pipeline.calibrate(state.ema_params, cal_data.data, Q, key)
        rng, key = jax.random.split(rng)
        metrics = pipeline.evaluate(state.ema_params, test_data, Q, key)
        log.info("InfFT epoch %d loss %.5f Q %.5f metrics %s",
                 epoch, float(np.mean(losses)), float(Q), metrics)
        all_metrics.append(
            {"epoch": epoch, "loss": float(np.mean(losses)),
             "eval": metrics, "quantile": float(Q)}
        )
        if state_dir is not None:
            save_checkpoint(state_dir, state, step=epoch, Q=Q)
            save_phase_history(state_dir, all_metrics, config_repr=repr(cfg))
    return state, Q, all_metrics


def posttrain_resilient(
    cfg: BurgersPostTrainConfig,
    make_pipeline,
    params,
    finetune_data: BurgersDataset,
    cal_data: BurgersDataset,
    test_data: BurgersDataset,
    state_dir: Optional[str] = None,
    fault_retries: int = 2,
    backoff_s: float = 30.0,
    **kw,
):
    """`posttrain` with TPU-worker-crash recovery: backend re-init + fresh
    pipeline from `make_pipeline()` + bit-identical resume from the epoch
    state in `state_dir` (utils/faults.py)."""
    from safediffcon_tpu.utils.faults import resilient_phase

    return resilient_phase(
        make_pipeline,
        lambda pipe, p: posttrain(cfg, pipe, p, finetune_data, cal_data,
                                  test_data, state_dir=state_dir, **kw),
        params, retries=fault_retries, backoff_s=backoff_s,
        describe="burgers posttrain")


def inference_finetune_resilient(
    cfg: BurgersInfFTConfig,
    make_pipeline,
    params,
    cal_data: BurgersDataset,
    test_data: BurgersDataset,
    state_dir: Optional[str] = None,
    fault_retries: int = 2,
    backoff_s: float = 30.0,
):
    """`inference_finetune` with TPU-worker-crash recovery (see
    `posttrain_resilient`)."""
    from safediffcon_tpu.utils.faults import resilient_phase

    return resilient_phase(
        make_pipeline,
        lambda pipe, p: inference_finetune(cfg, pipe, p, cal_data, test_data,
                                           state_dir=state_dir),
        params, retries=fault_retries, backoff_s=backoff_s,
        describe="burgers InfFT")
