"""2D smoke pipelines: pretrain + unified post-train / backward-finetune.

Replaces the reference's host-orchestrated InferencePipeline
(reference: 2d/inference_2d.py:63-507) with jitted device programs. Per
reference run() order (2d/inference_2d.py:286-368): each epoch first
FINETUNES (weighted diffusion loss on the train set, or InfFT: sample ->
resample conditioned on the generated control with final-step gradients ->
backward loss), then recalibrates Q-hat, then samples + evaluates through
the JAX smoke solver (the reference's per-sample process pool is a single
vmapped rollout here). Optimizer: Adam(lr, betas (0.9, 0.99)), no EMA
(reference: 2d/inference_2d.py:79).
"""
from __future__ import annotations

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
from safediffcon_tpu.core.schedules import make_schedule
from safediffcon_tpu.core.train import (
    TrainState, accumulated_grads, make_optimizer, run_train_loop,
)
from safediffcon_tpu.core.conformal import normalize_weights, weighted_quantile
from safediffcon_tpu.models.unet3d import UNet3D
from safediffcon_tpu.solvers import smoke as S
from safediffcon_tpu.tasks.smoke.task import (
    CX,
    CY,
    RESCALER,
    SmokeConditioner,
    SmokeTaskConfig,
    backward_loss,
    conformal_score,
    guidance_grad_fn,
    shift_weights,
    tile_rate_channels,
    train_conditioner,
)
from safediffcon_tpu.tasks.smoke.config import (
    SmokeConformalConfig,
    SmokeInferenceConfig,
    SmokePretrainConfig,
)
from safediffcon_tpu.tasks.smoke.data import SmokeDataset
from safediffcon_tpu.tasks.smoke.metrics import evaluate_samples, solver_rollout

log = logging.getLogger(__name__)


def build_model(dim=64, dim_mults=(1, 2, 4), compute_dtype=None,
                remat_policy="full", conv_impl="xla", attn_impl="packed"):
    dt = {None: jnp.float32, "float32": jnp.float32, "bfloat16": jnp.bfloat16}[compute_dtype]
    return UNet3D(dim=dim, dim_mults=dim_mults, channels=7, compute_dtype=dt,
                  remat_policy=remat_policy, conv_impl=conv_impl,
                  attn_impl=attn_impl)


def init_params(model, rng, frames=32, size=64):
    x = jnp.zeros((1, frames, size, size, 7))
    return model.init(rng, x, jnp.zeros((1,), jnp.int32))


class SmokePipeline:
    """Calibration, sampling and solver evaluation for the smoke task."""

    def __init__(
        self,
        conf_cfg: SmokeConformalConfig,
        dim: int = 64,
        dim_mults=(1, 2, 4),
        compute_dtype: str = None,
        attn_impl: str = "packed",  # "packed" = 128-tile attention matmuls
        solver_accuracy: float = 1e-8,  # reference eval CG tolerance
        # (2d/apps/evaluate_solver.py:108); datagen stays 1e-6, see
        # solvers/smoke.py precision note
        solver_max_iter: int = 500,
        solver_time_scale: int = 8,
        solver_space_scale: int = 2,
        solver_backend: str = "auto",  # "auto" -> xla; "pallas"/"pallas_v1" opt-in
        finetune_set: str = "train",
        cal_chunk: int = 50,
        eval_chunk: Optional[int] = 10,
    ):
        self.ccfg = conf_cfg
        self.cal_chunk = cal_chunk  # chip-efficient calibration sub-batching
        # evaluation sub-batching: the fused sample->solve->metrics program's
        # HBM footprint scales with batch (the 64^2-resolution temporal
        # attention materializes (B*HW, heads, T, T) f32 scores — 24 GB at
        # B=50 on a 15.75 GB chip, measured via AOT compile); chunking the
        # test set keeps the program resident. The default of 10 fits the
        # reference test size B=50 on a 15.75 GB chip; None = whole test
        # set at once (only safe for small test sets / big-HBM devices).
        self.eval_chunk = eval_chunk
        self.task_cfg = SmokeTaskConfig(
            safe_bound=conf_cfg.safe_bound,
            w_safe=conf_cfg.w_safe,
            standard_fixed_ratio=conf_cfg.standard_fixed_ratio,
            finetune_standard_fixed_ratio=conf_cfg.finetune_standard_fixed_ratio,
            alpha=conf_cfg.alpha,
        )
        self.finetune_set = finetune_set
        self.model = build_model(dim, dim_mults, compute_dtype,
                                 attn_impl=attn_impl)
        self.apply_fn = lambda params, x, t: self.model.apply(params, x, t)
        self.sched = make_schedule(conf_cfg.timesteps, conf_cfg.beta_schedule)
        self.diff_cfg = DiffusionConfig(
            timesteps=conf_cfg.timesteps,
            sampling_timesteps=conf_cfg.ddim_sampling_steps,
            ddim_eta=conf_cfg.ddim_eta,
            beta_schedule=conf_cfg.beta_schedule,
        )
        # fast-sampler option (beyond reference parity): DPM-Solver++(2M);
        # calibration MUST use the same sampler as test sampling
        self.sampler_fn = (dpm_solver_sample if conf_cfg.sampler == "dpm"
                           else ddim_sample)
        self.masks = S.build_masks()
        if solver_backend == "auto":
            # "auto" resolves to the pure-XLA CG — a data-backed decision
            # as of round 5 (experiments/pallas_cg_certification_r5.jsonl,
            # first on-TPU run of both Pallas variants): both kernels match
            # XLA to the CG tolerance and soak clean (the round-3 worker
            # faults do not reproduce post-recovery), but v1 only beats XLA
            # at small batch (2.58x at B=8, 0.77x at B=40) and v2's static
            # blocks are slower everywhere. XLA is competitive-to-faster at
            # the chunked eval batch sizes with no crossover cliff;
            # "pallas_v1" stays opt-in for small-batch workloads.
            solver_backend = "xla"
        self.solver_kw = dict(
            accuracy=solver_accuracy, max_iter=solver_max_iter,
            time_scale=solver_time_scale, space_scale=solver_space_scale,
            backend=solver_backend,
        )
        tc = self.task_cfg

        @jax.jit
        def _cal_batch(params, rng, state, Q):
            """Calibration: sample conditioned on (init density, control);
            score + weights (reference: 2d/inference_2d.py:113-148)."""
            cond = SmokeConditioner(
                init=state[:, 0, :, :, 0], control=state[..., CX : CY + 1]
            )
            out = self.sampler_fn(
                self.apply_fn, params, self.sched, self.diff_cfg, rng,
                state.shape, cond=cond,
            )
            scores = conformal_score(out, state)
            w = shift_weights(state, Q, tc, "train")
            if self.finetune_set == "test":
                w = w * shift_weights(state, Q, tc, "test")
            return scores, w

        self._cal_batch = _cal_batch

        @functools.partial(jax.jit, static_argnames=("guided", "final_step_grad"))
        def _sample_test(params, rng, state, Q, guided=True, final_step_grad=False,
                         control=None):
            """Test sampling conditioned on the initial density; returns
            PHYSICAL-unit prediction with tiled rate channels
            (reference: run_model, 2d/inference_2d.py:197-237)."""
            cond = SmokeConditioner(init=state[:, 0, :, :, 0], control=control)
            g = guidance_grad_fn(Q, tc) if guided else None
            out = self.sampler_fn(
                self.apply_fn, params, self.sched, self.diff_cfg, rng,
                state.shape, cond=cond, guidance_grad=g,
                final_step_grad=final_step_grad,
            )
            # post-loop control re-imposition (diffusion_2d.py:400-402)
            if control is not None:
                out = out.at[..., CX : CY + 1].set(control)
            return tile_rate_channels(out * jnp.asarray(RESCALER))

        self._sample_test = _sample_test

        @functools.partial(jax.jit, static_argnames=("guided",))
        def _evaluate(params, rng, state_raw, Q, guided=True):
            """Sample -> solver rollout -> metrics, one fused program
            (reference: 2d/inference_2d.py:336-368,407-507)."""
            state = state_raw / jnp.asarray(RESCALER)
            pred = _sample_test(params, rng, state, Q, guided=guided)
            pred = pred.at[:, 0, :, :, 0].set(state_raw[:, 0, :, :, 0])
            sol = solver_rollout(self.masks, pred, state_raw, **self.solver_kw)
            return evaluate_samples(pred, sol, Q, tc.safe_bound)

        self._evaluate = _evaluate

        @jax.jit
        def _weights_batch(state, Q):
            return shift_weights(state, Q, tc, "train")

        self._weights_batch = _weights_batch

    def calibrate(self, params, cal: SmokeDataset, Q, rng) -> jnp.ndarray:
        bs = self.ccfg.cal_batch_size
        chunk = min(self.cal_chunk or bs, bs)
        scores, weights = [], []
        for i in range(self.ccfg.num_cal_batch):
            for lo in range(0, bs, chunk):
                sl = slice(i * bs + lo, i * bs + lo + chunk)
                rng, key = jax.random.split(rng)
                s, w = self._cal_batch(maybe_replicate(params), key,
                                   maybe_shard(cal.data[sl], video=True), Q)
                scores.append(s)
                weights.append(w)
        scores = jnp.concatenate(scores)
        weights = normalize_weights(jnp.concatenate(weights))
        # inverted-alpha rank convention (reference: 2d/inference_2d.py:150-165)
        return weighted_quantile(weights * scores, self.ccfg.alpha, "one_minus_alpha")

    def reweights(self, data: SmokeDataset, Q, batch_size: int = 256) -> np.ndarray:
        """Per-sample train-shift weights exp(-ratio * guidance(x, Q)).

        The guidance loss reduces each record to two statistics (mean smoke
        rate over all frames, spatial-mean final-frame safe rate —
        guidance_values above); those are computed ONCE per dataset (cached
        as a lazy attribute on the dataset instance, so the cache dies with
        the dataset) and the per-Q weight formula is evaluated from them,
        identical math to shipping the full tensors through
        _weights_batch."""
        stats = getattr(data, "_weight_stats", None)
        if stats is None:
            from safediffcon_tpu.tasks.smoke.task import SAFE, SMOKE

            x = data.data  # mean over strided views: no multi-GB copies
            smoke_mean = (x[..., SMOKE].mean(axis=(1, 2, 3), dtype=np.float32)
                          * np.float32(RESCALER[SMOKE]))
            safe_final = (x[:, -1, :, :, SAFE].mean(axis=(1, 2), dtype=np.float32)
                          * np.float32(RESCALER[SAFE]))
            stats = (smoke_mean, safe_final)
            data._weight_stats = stats
        smoke_mean, safe_final = stats
        tc = self.task_cfg
        g = -(1.0 - tc.w_safe) * smoke_mean + tc.w_safe * np.maximum(
            safe_final + float(Q) - tc.safe_bound, 0.0)
        w = jnp.exp(-tc.standard_fixed_ratio * jnp.asarray(g))
        return np.asarray(normalize_weights(w))

    def evaluate(self, params, test: SmokeDataset, Q, rng, guided=None) -> Dict:
        guided = self.ccfg.use_guidance if guided is None else guided
        n = len(test.raw)
        chunk = min(self.eval_chunk or n, n)
        p_rep = maybe_replicate(params)
        # every metric in evaluate_samples is a per-sample (or per-sample
        # x per-frame, with equal frame counts) mean, so the length-weighted
        # mean over chunks reproduces the whole-batch value exactly
        totals: Dict[str, float] = {}
        seen = 0
        for lo in range(0, n, chunk):
            rng, key = jax.random.split(rng)
            raw = np.asarray(test.raw[lo : lo + chunk])
            m = self._evaluate(p_rep, key, maybe_shard(raw, video=True), Q, guided=guided)
            k = raw.shape[0]
            for name, v in m.items():
                totals[name] = totals.get(name, 0.0) + float(v) * k
            seen += k
        return {name: v / seen for name, v in totals.items()}


# ---------------------------------------------------------------------------
# Pretraining (reference: 2d/ddpm/diffusion_2d.py:462-643 Trainer)
# ---------------------------------------------------------------------------

def multistep_lr(base_lr: float, milestones, gamma: float):
    """torch MultiStepLR closed form (reference: diffusion_2d.py:520)."""
    ms = np.asarray(sorted(milestones))

    def schedule(step):
        k = jnp.searchsorted(jnp.asarray(ms), step, side="right")
        return base_lr * gamma**k

    return schedule


def pretrain(
    cfg: SmokePretrainConfig,
    train_data: SmokeDataset,
    num_steps: Optional[int] = None,
    log_every: int = 500,
    checkpoint_dir: Optional[str] = None,
    params=None,
    resume_dir: Optional[str] = None,
    steps_per_call: int = 1,
    device_pool: int = 0,
    pool_refresh_every: int = 0,
    deadline: Optional[float] = None,
):
    num_steps = num_steps or cfg.train_num_steps
    model = build_model(cfg.dim, cfg.dim_mults, getattr(cfg, 'compute_dtype', None),
                        remat_policy=getattr(cfg, 'remat_policy', 'full'),
                        conv_impl=getattr(cfg, 'conv_impl', 'xla'),
                        attn_impl=getattr(cfg, 'attn_impl', 'packed'))
    apply_fn = lambda p, x, t: model.apply(p, x, t)
    sched = make_schedule(cfg.timesteps, cfg.beta_schedule, cfg.objective)
    dcfg = DiffusionConfig(timesteps=cfg.timesteps, objective=cfg.objective,
                           beta_schedule=cfg.beta_schedule)
    cond = train_conditioner()

    rng = jax.random.PRNGKey(cfg.seed)
    if params is None:
        rng, key = jax.random.split(rng)
        f, s = train_data.data.shape[1], train_data.data.shape[2]
        params = init_params(model, key, frames=f, size=s)

    lr = multistep_lr(cfg.lr, cfg.lr_milestones, cfg.lr_gamma)
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
        checkpoint_dir=checkpoint_dir, logger=log, log_prefix="smoke pretrain",
        device_pool=device_pool, pool_refresh_every=pool_refresh_every,
        shard_video=True, deadline=deadline,
    )


# ---------------------------------------------------------------------------
# Unified inference pipeline (posttrain or backward finetune)
# ---------------------------------------------------------------------------

def make_finetune_steps(cfg: SmokeInferenceConfig, pipeline: SmokePipeline):
    """Build the jitted finetune step functions used by `run_inference`.

    Module-level so the exact production programs can be AOT-compiled
    (``jit(...).lower(shapes).compile()``) ahead of a long run — the
    persistent compilation cache then makes the run's first call free.
    Returns ``(tx, weighted_step, weighted_step_pool, backward_step)``.
    """
    ccfg = cfg.conformal
    tc = pipeline.task_cfg
    apply_fn = pipeline.apply_fn
    sched = pipeline.sched
    dcfg_train = DiffusionConfig(timesteps=ccfg.timesteps,
                                 beta_schedule=ccfg.beta_schedule)
    cond_train = train_conditioner()

    tx = make_optimizer("adam", cfg.finetune_lr, betas=(0.9, 0.99), max_grad_norm=0.0)

    @jax.jit
    def weighted_step(params, opt_state, rng, batch, w):
        def loss_fn(p):
            rng_t, rng_n = jax.random.split(rng)
            b = batch.shape[0]
            t = jax.random.randint(rng_t, (b,), 0, dcfg_train.timesteps)
            noise = jax.random.normal(rng_n, batch.shape, dtype=batch.dtype)
            per = p_losses(apply_fn, p, sched, dcfg_train, batch, t, noise, cond_train)
            return (w * per).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    @jax.jit
    def weighted_step_pool(params, opt_state, rng, idx, data_dev, w_dev):
        # device-side gather from the HBM-resident bf16 pool: only the
        # (B,) int32 index array crosses the host-device boundary per step
        return weighted_step(params, opt_state, rng,
                             data_dev[idx].astype(jnp.float32), w_dev[idx])

    @jax.jit
    def backward_step(params, opt_state, rng, test_batch, Q):
        """InfFT: guided sample (no grad) -> resample conditioned on the
        generated control with final-step grads -> backward loss
        (reference: 2d/inference_2d.py:197-237,267-284)."""
        rng1, rng2 = jax.random.split(rng)
        cond = SmokeConditioner(init=test_batch[:, 0, :, :, 0])
        g = guidance_grad_fn(Q, tc) if ccfg.use_guidance else None
        first = pipeline.sampler_fn(
            apply_fn, jax.lax.stop_gradient(params), sched, pipeline.diff_cfg,
            rng1, test_batch.shape, cond=cond, guidance_grad=g,
        )
        control = jax.lax.stop_gradient(first[..., CX : CY + 1])

        def loss_fn(p):
            cond2 = SmokeConditioner(init=test_batch[:, 0, :, :, 0], control=control)
            out = pipeline.sampler_fn(
                apply_fn, p, sched, pipeline.diff_cfg, rng2, test_batch.shape,
                cond=cond2, final_step_grad=True,
            )
            out = out.at[..., CX : CY + 1].set(control)
            return backward_loss(out * jnp.asarray(RESCALER), Q, tc)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    return tx, weighted_step, weighted_step_pool, backward_step


def run_inference(
    cfg: SmokeInferenceConfig,
    pipeline: SmokePipeline,
    params,
    train_data: Optional[SmokeDataset],
    cal_data: SmokeDataset,
    test_data: SmokeDataset,
    on_epoch=None,
    deadline: Optional[float] = None,
    state_dir: Optional[str] = None,
):
    """Reference run() loop (2d/inference_2d.py:286-368): per epoch
    finetune -> conformal -> evaluate. Returns (params, Q, metrics).
    `on_epoch(epoch_record)` fires after each epoch (incremental result
    persistence for long runs). `deadline` (time.time() epoch seconds)
    stops starting new epochs once passed — completed epochs are returned.
    `state_dir` persists (params, opt_state, Q) after every epoch and
    auto-resumes from the latest saved epoch, so a crash mid-phase costs
    at most one epoch; per-epoch RNG is derived by fold_in, making a
    resumed run bit-identical to an uninterrupted one."""
    import time as _time

    from safediffcon_tpu.utils.checkpoint import (
        load_phase_history, load_phase_state, save_phase_history,
        save_phase_state,
    )

    ccfg = cfg.conformal
    tx, weighted_step, weighted_step_pool, backward_step = make_finetune_steps(
        cfg, pipeline)
    opt_state = tx.init(params)
    start_epoch = 0
    restored_history = []
    if state_dir is not None:
        restored = load_phase_state(state_dir, params, opt_state)
        if restored is not None:
            params, opt_state, Q_restored, last_epoch = restored
            params = maybe_replicate(params)  # restored leaves are host arrays
            opt_state = maybe_replicate(opt_state)
            start_epoch = last_epoch + 1
            restored_history = load_phase_history(
                state_dir, max_epoch=last_epoch, config_repr=repr(cfg))
            log.info("smoke finetune: resumed phase state after epoch %d from %s",
                     last_epoch, state_dir)

    _pool_stage: dict = {}

    def _draw_pool(salt, w_all):
        # persistent staging buffers: see core/train.py draw_pool — fresh
        # multi-GB gathers re-pay first-touch page zeroing on every call
        import ml_dtypes

        n = len(train_data)
        pool = min(cfg.device_pool, n)
        ids = np.random.default_rng(cfg.seed + 31 + salt).choice(
            n, pool, replace=False)
        if not _pool_stage:
            shape = (pool,) + train_data.data.shape[1:]
            _pool_stage["f32"] = np.empty(shape, np.float32)
            _pool_stage["bf16"] = np.empty(shape, ml_dtypes.bfloat16)
        np.take(np.asarray(train_data.data), ids, axis=0,
                out=_pool_stage["f32"])
        np.copyto(_pool_stage["bf16"], _pool_stage["f32"], casting="unsafe")
        log.info("smoke finetune: pinned %d/%d samples (%.2f GB bf16) on device",
                 pool, n, _pool_stage["bf16"].nbytes / 1e9)
        return maybe_shard(_pool_stage["bf16"], video=True), jnp.asarray(w_all[ids])

    base_rng = jax.random.PRNGKey(cfg.seed)
    Q = jnp.zeros(())
    if start_epoch > 0:
        Q = Q_restored
    all_metrics = list(restored_history)
    for rec in all_metrics:
        # replay restored records through the callback so external result
        # files converge regardless of where the previous run crashed
        if on_epoch is not None:
            on_epoch(rec)
    for epoch in range(start_epoch, cfg.finetune_epoch):
        rng = jax.random.fold_in(base_rng, epoch)
        if deadline is not None and _time.time() > deadline:
            log.info("smoke finetune: deadline reached before epoch %d, "
                     "returning %d completed epochs", epoch, len(all_metrics))
            break
        losses = []
        if cfg.backward_finetune:
            for lo in range(0, len(test_data), ccfg.test_batch_size):
                sl = slice(lo, lo + ccfg.test_batch_size)
                for _ in range(cfg.finetune_steps):
                    rng, key = jax.random.split(rng)
                    params, opt_state, loss = backward_step(
                        params, opt_state, key,
                        maybe_shard(test_data.data[sl], video=True), Q
                    )
                    losses.append(loss)  # device future; synced at epoch end
        else:
            w_train = pipeline.reweights(train_data, Q)
            n = len(train_data)
            if cfg.device_pool:
                # re-drawn per epoch (weights change with Q anyway), so all
                # sims are eventually trained on
                data_dev, w_dev = _draw_pool(epoch, w_train)
                m = data_dev.shape[0]
                pos = 0
                for _ in range(cfg.finetune_steps):
                    sel = np.arange(pos, pos + cfg.finetune_batch_size) % m
                    pos = (pos + cfg.finetune_batch_size) % m
                    rng, key = jax.random.split(rng)
                    params, opt_state, loss = weighted_step_pool(
                        params, opt_state, key,
                        jnp.asarray(sel, jnp.int32), data_dev, w_dev)
                    losses.append(loss)  # device future; synced at epoch end
                # free the multi-GB HBM pool before the sampling-heavy
                # calibrate/evaluate phases (it is re-drawn next epoch
                # anyway; keeping it resident puts eval at OOM risk)
                data_dev = w_dev = None
            else:
                pos = 0
                for _ in range(cfg.finetune_steps):
                    sel = np.arange(pos, pos + cfg.finetune_batch_size) % n
                    pos = (pos + cfg.finetune_batch_size) % n
                    rng, key = jax.random.split(rng)
                    params, opt_state, loss = weighted_step(
                        params, opt_state, key,
                        maybe_shard(train_data.data[sel], video=True), maybe_shard(w_train[sel]),
                    )
                    losses.append(loss)  # device future; synced at epoch end

        losses = [float(l) for l in losses]  # one sync per epoch
        rng, key = jax.random.split(rng)
        Q = pipeline.calibrate(params, cal_data, Q, key)
        # sync here so a device fault in the queued calibration chunks
        # surfaces in THIS phase, not as an opaque failure while the next
        # jit traces (observability for TPU-worker crashes)
        log.info("smoke epoch %d calibrated Q %.5f", epoch, float(Q))

        rng, key = jax.random.split(rng)
        metrics = pipeline.evaluate(params, test_data, Q, key)
        log.info("smoke epoch %d Q %.5f loss %.5f metrics %s",
                 epoch, float(Q), float(np.mean(losses)) if losses else float("nan"),
                 metrics)
        all_metrics.append(
            {"epoch": epoch, "quantile": float(Q),
             "loss": float(np.mean(losses)) if losses else None, "eval": metrics}
        )
        # persist state+history BEFORE the callback: a crash between them
        # then re-fires the callback on resume instead of losing the record
        if state_dir is not None:
            save_phase_state(state_dir, params, opt_state, Q, epoch)
            save_phase_history(state_dir, all_metrics, config_repr=repr(cfg))
        if on_epoch is not None:
            on_epoch(all_metrics[-1])
    return params, Q, all_metrics


def run_inference_resilient(
    cfg: SmokeInferenceConfig,
    make_pipeline,
    params,
    train_data: Optional[SmokeDataset],
    cal_data: SmokeDataset,
    test_data: SmokeDataset,
    on_epoch=None,
    deadline: Optional[float] = None,
    state_dir: Optional[str] = None,
    fault_retries: int = 2,
    backoff_s: float = 30.0,
):
    """`run_inference` that survives a TPU worker crash mid-phase.

    Round 3 lost three at-scale 2D runs to "UNAVAILABLE: TPU worker process
    crashed or restarted" faults; the bash retry loop around the process is
    now in code: on a device fault the dead PJRT client is dropped
    (utils/faults.reinit_backend), a FRESH pipeline is built via
    `make_pipeline()` — the old one's jitted programs capture now-dead
    device constants (schedule tables, solver masks) — and the phase loop
    re-enters, resuming bit-identically from the last epoch persisted in
    `state_dir` (fold_in per-epoch RNG + saved params/opt/Q-hat).

    `make_pipeline`: zero-arg factory returning a SmokePipeline. `params`
    is snapshotted to host up front so no retry depends on dead buffers.
    Without `state_dir` a fault replays the phase from epoch 0 (correct,
    just wasteful).
    """
    from safediffcon_tpu.utils.faults import resilient_phase

    return resilient_phase(
        make_pipeline,
        lambda pipe, p: run_inference(
            cfg, pipe, p, train_data, cal_data, test_data,
            on_epoch=on_epoch, deadline=deadline, state_dir=state_dir),
        params, retries=fault_retries, backoff_s=backoff_s,
        describe="smoke finetune")
