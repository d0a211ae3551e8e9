"""Unified CLI for the safediffcon_tpu framework.

Replaces the reference's per-suite argparse mains and bash sweep wrappers
(reference: 1D/train.py, 1D/run_posttrain.py, 1D/run_inference_ft.py,
2d/train_2d.py, 2d/inference_2d.py, tokamak/pretrain.py,
tokamak/run_inference.py, */scripts/*.sh) with one entry point:

    python -m safediffcon_tpu.cli.main <task> <phase> [options]

tasks:  burgers | tokamak | smoke
phases: generate-data | pretrain | posttrain | infft | eval

Results are written as JSON next to the checkpoints; checkpoints embed the
conformal quantile (the reference convention).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import sys
import time

import numpy as np


def _setup_logging():
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s",
        stream=sys.stdout,
    )


def _save_results(out_dir: str, name: str, payload) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, name)
    with open(path, "w") as f:
        json.dump(payload, f, indent=2, default=float)
    return path


def _register_run(out_dir: str, args) -> None:
    """Experiment metadata registry (reference convention:
    experiments/metadata/*.json, 1D/train.py:34-50,
    tokamak/inference/pipeline.py:426-443)."""
    import datetime

    meta_path = os.path.join(out_dir, "metadata", f"{args.phase}.json")
    os.makedirs(os.path.dirname(meta_path), exist_ok=True)
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    run_id = f"{args.task}-{args.phase}-{len(meta)}"
    meta[run_id] = {
        "date": datetime.datetime.now().isoformat(timespec="seconds"),
        "args": {k: v for k, v in vars(args).items() if v is not None},
    }
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=2)


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--data", default=None, help="dataset .npz path")
    p.add_argument("--out", default="experiments", help="output/checkpoint dir")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--steps", type=int, default=None, help="override step count")
    p.add_argument("--dim", type=int, default=None, help="override model width")
    p.add_argument("--checkpoint", type=int, default=None, help="milestone to load")
    p.add_argument("--n-train", type=int, default=None, help="generate-data: train size")
    p.add_argument("--n-cal", type=int, default=None, help="generate-data: cal size")
    p.add_argument("--n-test", type=int, default=None, help="generate-data: test size")
    p.add_argument("--no-dp", action="store_true",
                   help="disable automatic data parallelism over multiple devices")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel devices on the video frame axis "
                        "(smoke/UNet3D): builds a 2-D (data, frames) mesh "
                        "with device_count//sp x sp devices")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest saved state in --out: "
                        "pretrain restores the latest step milestone; "
                        "posttrain/infft restore epoch-granular phase state "
                        "(params+opt+Q-hat, <out>/<task>-<phase>-state)")
    p.add_argument("--steps-per-call", type=int, default=None,
                   help="pretrain: optimizer steps fused per device call "
                        "(lax.scan); default 25 on TPU, 1 elsewhere — "
                        "amortizes dispatch latency on tunneled chips")
    p.add_argument("--train-deadline-s", type=float, default=None,
                   help="pretrain: wall-clock budget in seconds — the loop "
                        "stops cleanly at the first chunk boundary past the "
                        "budget and checkpoints the step reached (resume "
                        "with --resume)")
    p.add_argument("--remat-policy", default="full",
                   choices=("full", "save_heavy"),
                   help="smoke pretrain: UNet3D remat granularity — 'full' "
                        "(min HBM) or 'save_heavy' (save conv/dot outputs, "
                        "recompute only elementwise; the MFU lever)")
    p.add_argument("--conv-impl", default="xla", choices=("xla", "pallas"),
                   help="smoke: 3x3x3 conv implementation (pallas = fused "
                        "im2col MXU kernel, ops/conv3d_mxu.py)")
    p.add_argument("--attn-impl", default="packed", choices=("heads", "packed"),
                   help="smoke: UNet3D attention matmul layout — 'packed' "
                        "stacks heads into full-128-tile MXU matmuls "
                        "(models/unet3d.py); checkpoints interchange")
    p.add_argument("--eval-chunk", type=int, default=10,
                   help="smoke: test-set sub-batch per fused "
                        "sample->solve->metrics program (HBM footprint "
                        "scales with it; 10 fits the reference B=50 test "
                        "set on a 16 GB chip); 0 = whole test set at once")
    p.add_argument("--cal-chunk", type=int, default=50,
                   help="smoke: calibration sub-batch per device call")
    p.add_argument("--from-phase", default="pretrain",
                   choices=("pretrain", "posttrain", "infft"),
                   help="eval: which phase's checkpoint to load")
    p.add_argument("--ddim-steps", type=int, default=None,
                   help="eval: override the sampler's DDIM step count "
                        "(reference defaults: 200 burgers / 200 tokamak / "
                        "100 smoke)")
    p.add_argument("--model-w", action="store_true",
                   help="burgers pretrain: train the w-only prior model "
                        "p(w | u0, uT) into <out>/burgers-pretrain-w "
                        "(reference is_model_w, 1D/model/diffusion.py:678) "
                        "— the prior for --two-model sampling")
    p.add_argument("--two-model", action="store_true",
                   help="burgers eval: compose the main denoiser with the "
                        "w-only prior from <out>/burgers-pretrain-w "
                        "(reference eval_two_models, "
                        "1D/model/diffusion.py:226-239)")
    p.add_argument("--prior-beta", type=float, default=0.5,
                   help="two-model composition weight beta "
                        "(reference prior_beta, 1D/model/diffusion.py:55)")
    p.add_argument("--normalize-beta", action="store_true",
                   help="two-model: use the normalized composition "
                        "(out - (1-beta)*out_w)/beta")
    p.add_argument("--prior-checkpoint", type=int, default=None,
                   help="two-model: milestone of the w-model checkpoint "
                        "(default: latest in <out>/burgers-pretrain-w)")
    p.add_argument("--checkpoints", default=None,
                   help="eval: sweep milestones — 'LO:HI[:STEP]' (HI inclusive)"
                        " or a comma list '10,20,170'; writes a results table")




def _resume_dir(args, ckpt_dir):
    """Full-state resume: pretrain() restores step/opt/EMA from the latest
    milestone in this directory when --resume is set."""
    return ckpt_dir if getattr(args, "resume", False) else None


def _phase_state_dir(args, task):
    """Epoch-granular crash resume for the posttrain/InfFT loops: with
    --resume, the phase persists (params, opt moments, Q) per epoch under
    <out>/<task>-<phase>-state and picks up from the latest saved epoch."""
    if not getattr(args, "resume", False):
        return None
    return os.path.join(args.out, f"{task}-{args.phase}-state")


def _train_deadline(args):
    s = getattr(args, "train_deadline_s", None)
    return None if s is None else time.time() + s


def _steps_per_call(args):
    # explicit None check: --steps-per-call 0/1 means "no chunking"
    if getattr(args, "steps_per_call", None) is not None:
        return max(args.steps_per_call, 1)
    import jax

    return 25 if jax.default_backend() == "tpu" else 1


def _dispatch_load(ds_cls, data_path: str, split: str, **kw):
    """Route --data to the loader matching its on-disk format.

    *.npz           -> native consolidated arrays (`load`)
    *.h5 / *.hdf5   -> reference Burgers HDF5 (`load_h5`; per-split sibling
                       files `burgers_{split}.h5` are resolved automatically,
                       reference: 1D/data/load_hdf5.py:6-57)
    HF dataset dir  -> reference tokamak datasets.load_from_disk layout
                       (`load_hf`, reference: tokamak/data/tokamak_dataset.py:5-56)
    other dir       -> reference smoke per-sim npy-dir layout
                       (`load_sim_dirs`, reference: 2d/ddpm/data_2d.py:43-113)
    """
    if data_path.endswith((".h5", ".hdf5")):
        if not hasattr(ds_cls, "load_h5"):
            raise SystemExit(f"{ds_cls.__name__} has no HDF5 loader")
        path, base = data_path, os.path.basename(data_path)
        for other in ("train", "cal", "test"):
            if other != split and other in base:
                cand = os.path.join(
                    os.path.dirname(data_path), base.replace(other, split))
                if os.path.exists(cand):
                    path = cand
        return ds_cls.load_h5(path, split, **kw)
    if os.path.isdir(data_path):
        if os.path.exists(os.path.join(data_path, "dataset_info.json")) or os.path.exists(
            os.path.join(data_path, "state.json")
        ):
            if not hasattr(ds_cls, "load_hf"):
                raise SystemExit(f"{ds_cls.__name__} has no HF-dataset loader")
            return ds_cls.load_hf(data_path, split, **kw)
        if not hasattr(ds_cls, "load_sim_dirs"):
            raise SystemExit(f"{ds_cls.__name__} has no sim-dir loader")
        return ds_cls.load_sim_dirs(data_path, split, **kw)
    return ds_cls.load(data_path, split, **kw)


def _load_params(args, out_dir, task, step=None):
    """Load model params (+ Q if present) for the requested phase."""
    from safediffcon_tpu.utils.checkpoint import latest_step, load_checkpoint

    phase = getattr(args, "from_phase", "pretrain")
    if args.phase in ("posttrain", "infft"):
        phase = "pretrain"  # finetuning always starts from the pretrain ckpt
    ckpt_dir = os.path.join(out_dir, f"{task}-{phase}")
    if step is None:  # explicit None checks: milestone 0 is a valid step
        step = args.checkpoint
    if step is None:
        step = latest_step(ckpt_dir)
    if step is None:
        raise SystemExit(
            f"no checkpoint found in {ckpt_dir} — run `{task} {phase}` first "
            f"(or pass --checkpoint/--out)"
        )
    restored = load_checkpoint(ckpt_dir, step)
    params = restored.get("ema_params", restored.get("params"))
    return params, restored.get("Q")


def _parse_checkpoints(spec: str):
    """'LO:HI[:STEP]' (HI inclusive) or comma list -> milestone list."""
    try:
        if ":" in spec:
            parts = [int(x) for x in spec.split(":")]
            lo, hi = parts[0], parts[1]
            stride = parts[2] if len(parts) > 2 else 1
            if stride <= 0:
                raise ValueError(f"stride must be positive, got {stride}")
            steps = list(range(lo, hi + 1, stride))
        else:
            steps = [int(x) for x in spec.split(",")]
    except ValueError as e:
        raise SystemExit(
            f"bad --checkpoints spec {spec!r} (want 'LO:HI[:STEP]' or a comma "
            f"list): {e}"
        )
    if not steps:
        raise SystemExit(
            f"--checkpoints spec {spec!r} selects no milestones (LO > HI?)"
        )
    return steps


def _eval_sweep(args, task: str, eval_one) -> None:
    """Evaluate one checkpoint or a --checkpoints sweep with a results table
    (reference: 1D/run_eval.py + 1D/eval.py:129-153).

    eval_one(step_or_None) -> metrics dict. Per-checkpoint failures are
    recorded and the sweep continues (reference: 1D/run_eval.py:27-32).
    """
    if not args.checkpoints:
        metrics = eval_one(None)
        print(_save_results(args.out, f"{task}_eval_results.json", metrics))
        print(json.dumps(metrics, default=float))
        return

    table = {}
    for step in _parse_checkpoints(args.checkpoints):
        logging.info("evaluating %s checkpoint %d", task, step)
        try:
            table[step] = eval_one(step)
        except Exception as e:  # keep sweeping past broken milestones
            logging.warning("checkpoint %d failed: %s", step, e)
            table[step] = {"error": str(e)}
    path = _save_results(args.out, f"{task}_eval_sweep.json", table)

    cols = sorted({
        k for m in table.values()
        for k, v in m.items() if isinstance(v, (int, float))
    })
    print("\t".join(["checkpoint"] + cols))
    for step, m in table.items():
        row = [str(step)] + [
            f"{m[k]:.6g}" if isinstance(m.get(k), (int, float)) else "-"
            for k in cols
        ]
        print("\t".join(row))
    print(path)


def run_burgers(args) -> int:
    import jax
    from safediffcon_tpu.tasks.burgers import config as C  # noqa
    from safediffcon_tpu.tasks.burgers.config import (
        BurgersConformalConfig, BurgersInfFTConfig, BurgersPostTrainConfig,
        BurgersPretrainConfig,
    )
    from safediffcon_tpu.tasks.burgers.data import BurgersDataset, generate_burgers_dataset
    from safediffcon_tpu.tasks.burgers import pipeline as P

    data_path = args.data or os.path.join(args.out, "burgers.npz")
    if args.phase == "generate-data":
        kw = {k: v for k, v in dict(n_train=args.n_train, n_cal=args.n_cal, n_test=args.n_test).items() if v is not None}
        generate_burgers_dataset(data_path, seed=args.seed, **kw)
        print(f"wrote {data_path}")
        return 0

    dim = args.dim or 128
    if args.phase == "pretrain":
        cfg = BurgersPretrainConfig(dim=dim, seed=args.seed)
        # --model-w trains the w-only prior into its own checkpoint dir
        # (the two-model composition's second model)
        suffix = "-w" if args.model_w else ""
        ckpt_dir = os.path.join(args.out, f"burgers-pretrain{suffix}")
        train = _dispatch_load(BurgersDataset, data_path, "train")
        P.pretrain(cfg, train, num_steps=args.steps,
                   checkpoint_dir=ckpt_dir,
                   resume_dir=_resume_dir(args, ckpt_dir),
                   steps_per_call=_steps_per_call(args),
                   deadline=_train_deadline(args),
                   model_w=args.model_w)
        return 0

    def _with_prior(p):
        """--two-model: pair the main params with the w-only prior's."""
        if not args.two_model:
            return p
        from safediffcon_tpu.utils.checkpoint import latest_step, load_checkpoint

        w_dir = os.path.join(args.out, "burgers-pretrain-w")
        step = args.prior_checkpoint
        if step is None:
            step = latest_step(w_dir)
        if step is None:
            raise SystemExit(
                f"--two-model: no w-model checkpoint in {w_dir} — run "
                "`burgers pretrain --model-w` first")
        restored = load_checkpoint(w_dir, step)
        return (p, restored.get("ema_params", restored.get("params")))

    params = None
    if not (args.phase == "eval" and args.checkpoints):
        # sweep mode reloads per milestone; skip the redundant upfront load
        params, _ = _load_params(args, args.out, "burgers")
        params = _with_prior(params)

    def _ccfg(base=None):
        c = base or BurgersConformalConfig()
        if args.ddim_steps:
            c = dataclasses.replace(c, ddim_sampling_steps=args.ddim_steps)
        return c

    pipe_kw = dict(dim=dim, two_model=args.two_model,
                   prior_beta=args.prior_beta,
                   normalize_beta=args.normalize_beta)
    pipe = P.BurgersPipeline(_ccfg(), **pipe_kw)
    cal = _dispatch_load(BurgersDataset, data_path, "cal")
    test = _dispatch_load(BurgersDataset, data_path, "test")

    make_pipe = lambda: P.BurgersPipeline(_ccfg(), **pipe_kw)
    if args.two_model and args.phase != "eval":
        raise SystemExit("--two-model is a sampling/eval surface (the "
                         "reference composes models at inference only); "
                         "finetune the main model, then eval --two-model")
    if args.phase == "posttrain":
        cfg = BurgersPostTrainConfig(seed=args.seed)
        finetune = _dispatch_load(BurgersDataset, data_path, "train", subset=cfg.finetune_subset_size)
        state, Q, metrics = P.posttrain_resilient(
            cfg, make_pipe, params, finetune, cal, test,
            finetune_steps=args.steps,
            state_dir=_phase_state_dir(args, "burgers"))
        from safediffcon_tpu.utils.checkpoint import save_finetuned
        save_finetuned(os.path.join(args.out, "burgers-posttrain"), state.ema_params, Q)
        print(_save_results(args.out, "burgers_posttrain_results.json", metrics))
    elif args.phase == "infft":
        cfg = BurgersInfFTConfig(seed=args.seed)
        state, Q, metrics = P.inference_finetune_resilient(
            cfg, make_pipe, params, cal, test,
            state_dir=_phase_state_dir(args, "burgers"))
        from safediffcon_tpu.utils.checkpoint import save_finetuned
        save_finetuned(os.path.join(args.out, "burgers-infft"), state.ema_params, Q)
        print(_save_results(args.out, "burgers_infft_results.json", metrics))
    elif args.phase == "eval":
        import jax.numpy as jnp

        def eval_one(step):
            p = params if step is None else _with_prior(
                _load_params(args, args.out, "burgers", step=step)[0])
            rng = jax.random.PRNGKey(args.seed)
            Q = pipe.calibrate(p, cal.data, jnp.zeros(()), rng)
            metrics = pipe.evaluate(p, test, Q, rng)
            metrics["quantile"] = float(Q)
            return metrics

        _eval_sweep(args, "burgers", eval_one)
    else:
        raise SystemExit(f"unknown phase {args.phase}")
    return 0


def run_tokamak(args) -> int:
    import jax
    import jax.numpy as jnp
    from safediffcon_tpu.tasks.tokamak import (
        TokamakConformalConfig, TokamakDataset, TokamakPipeline,
        TokamakPretrainConfig, finetune_config, generate_tokamak_dataset,
        posttrain_config, pretrain, run_inference_resilient,
    )

    data_path = args.data or os.path.join(args.out, "tokamak.npz")
    if args.phase == "generate-data":
        kw = {k: v for k, v in dict(n_train=args.n_train, n_cal=args.n_cal, n_test=args.n_test).items() if v is not None}
        generate_tokamak_dataset(data_path, seed=args.seed, **kw)
        print(f"wrote {data_path}")
        return 0

    dim = args.dim or 128
    if args.phase == "pretrain":
        cfg = TokamakPretrainConfig(dim=dim, seed=args.seed)
        train = _dispatch_load(TokamakDataset, data_path, "train")
        pretrain(cfg, train, num_steps=args.steps,
                 checkpoint_dir=os.path.join(args.out, "tokamak-pretrain"),
                 resume_dir=_resume_dir(args, os.path.join(args.out, "tokamak-pretrain")),
                 steps_per_call=_steps_per_call(args),
                 deadline=_train_deadline(args))
        return 0

    params = None
    if not (args.phase == "eval" and args.checkpoints):
        # sweep mode reloads per milestone; skip the redundant upfront load
        params, _ = _load_params(args, args.out, "tokamak")

    cfg = posttrain_config() if args.phase == "posttrain" else finetune_config()
    if args.phase in ("posttrain", "infft"):
        make_pipe = lambda: TokamakPipeline(cfg.conformal, dim=dim)
        train = _dispatch_load(TokamakDataset, data_path, "train")
        cal = _dispatch_load(TokamakDataset, data_path, "cal")
        test = _dispatch_load(TokamakDataset, data_path, "test")
        params, Q, metrics = run_inference_resilient(
            cfg, make_pipe, params, train, cal, test,
            state_dir=_phase_state_dir(args, "tokamak"))
        from safediffcon_tpu.utils.checkpoint import save_finetuned
        save_finetuned(os.path.join(args.out, f"tokamak-{args.phase}"), params, Q)
        print(_save_results(args.out, f"tokamak_{args.phase}_results.json", metrics))
    elif args.phase == "eval":
        ccfg = TokamakConformalConfig()
        if args.ddim_steps:
            ccfg = dataclasses.replace(ccfg, ddim_sampling_steps=args.ddim_steps)
        pipe = TokamakPipeline(ccfg, dim=dim)
        cal = _dispatch_load(TokamakDataset, data_path, "cal")
        test = _dispatch_load(TokamakDataset, data_path, "test")

        def eval_one(step):
            p = params if step is None else _load_params(args, args.out, "tokamak", step=step)[0]
            rng = jax.random.PRNGKey(args.seed)
            Q = pipe.calibrate(p, cal, jnp.zeros(()), rng)
            metrics = pipe.evaluate(p, test, Q, rng)
            metrics["quantile"] = float(Q)
            return metrics

        _eval_sweep(args, "tokamak", eval_one)
    else:
        raise SystemExit(f"unknown phase {args.phase}")
    return 0


def run_smoke(args) -> int:
    import jax
    import jax.numpy as jnp
    from safediffcon_tpu.tasks.smoke import (
        SmokeConformalConfig, SmokeDataset, SmokePipeline, SmokePretrainConfig,
        finetune_config, generate_smoke_dataset, posttrain_config, pretrain,
        run_inference_resilient,
    )

    data_path = args.data or os.path.join(args.out, "smoke.npz")
    if args.phase == "generate-data":
        kw = {k: v for k, v in dict(n_train=args.n_train, n_cal=args.n_cal, n_test=args.n_test).items() if v is not None}
        generate_smoke_dataset(data_path, seed=args.seed, **kw)
        print(f"wrote {data_path}")
        return 0

    dim = args.dim or 64
    if args.phase == "pretrain":
        cfg = SmokePretrainConfig(dim=dim, seed=args.seed,
                                  remat_policy=args.remat_policy,
                                  conv_impl=args.conv_impl,
                                  attn_impl=args.attn_impl)
        train = _dispatch_load(SmokeDataset, data_path, "train")
        pretrain(cfg, train, num_steps=args.steps,
                 checkpoint_dir=os.path.join(args.out, "smoke-pretrain"),
                 resume_dir=_resume_dir(args, os.path.join(args.out, "smoke-pretrain")),
                 steps_per_call=_steps_per_call(args),
                 deadline=_train_deadline(args))
        return 0

    params = None
    if not (args.phase == "eval" and args.checkpoints):
        # sweep mode reloads per milestone; skip the redundant upfront load
        params, _ = _load_params(args, args.out, "smoke")

    # chunk sizes bound the fused programs' HBM footprint at reference
    # test/cal sizes (pipeline.py eval_chunk comment); 0 = unchunked
    chunk_kw = dict(eval_chunk=args.eval_chunk or None,
                    cal_chunk=args.cal_chunk or None)
    cfg = posttrain_config() if args.phase == "posttrain" else finetune_config()
    if args.phase in ("posttrain", "infft"):
        make_pipe = lambda: SmokePipeline(
            cfg.conformal, dim=dim, attn_impl=args.attn_impl,
            finetune_set="test" if cfg.backward_finetune else "train",
            **chunk_kw,
        )
        train = _dispatch_load(SmokeDataset, data_path, "train")
        cal = _dispatch_load(SmokeDataset, data_path, "cal")
        test = _dispatch_load(SmokeDataset, data_path, "test")
        # resilient: a TPU-worker crash mid-phase re-inits the backend and
        # resumes from the epoch-granular phase state (utils/faults.py)
        params, Q, metrics = run_inference_resilient(
            cfg, make_pipe, params, train, cal, test,
            state_dir=_phase_state_dir(args, "smoke"))
        from safediffcon_tpu.utils.checkpoint import save_finetuned
        save_finetuned(os.path.join(args.out, f"smoke-{args.phase}"), params, Q)
        print(_save_results(args.out, f"smoke_{args.phase}_results.json", metrics))
    elif args.phase == "eval":
        ccfg = SmokeConformalConfig()
        if args.ddim_steps:
            ccfg = dataclasses.replace(ccfg, ddim_sampling_steps=args.ddim_steps)
        pipe = SmokePipeline(ccfg, dim=dim,
                         attn_impl=args.attn_impl, **chunk_kw)
        cal = _dispatch_load(SmokeDataset, data_path, "cal")
        test = _dispatch_load(SmokeDataset, data_path, "test")

        def eval_one(step):
            p = params if step is None else _load_params(args, args.out, "smoke", step=step)[0]
            rng = jax.random.PRNGKey(args.seed)
            Q = pipe.calibrate(p, cal, jnp.zeros(()), rng)
            metrics = pipe.evaluate(p, test, Q, rng)
            metrics["quantile"] = float(Q)
            return metrics

        _eval_sweep(args, "smoke", eval_one)
    else:
        raise SystemExit(f"unknown phase {args.phase}")
    return 0


TASKS = {"burgers": run_burgers, "tokamak": run_tokamak, "smoke": run_smoke}
PHASES = ("generate-data", "pretrain", "posttrain", "infft", "eval")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="safediffcon", description=__doc__)
    parser.add_argument("task", choices=sorted(TASKS))
    parser.add_argument("phase", choices=PHASES)
    _add_common(parser)
    args = parser.parse_args(argv)
    _setup_logging()
    if not args.no_dp and args.phase != "generate-data":
        # data-parallel by default whenever >1 device is visible: batches
        # shard over a 1-axis mesh, params replicate, XLA inserts the
        # collectives (the reference's Accelerate-DDP equivalent,
        # 1D/model/trainer.py:47-50, 2d/default_config.yaml)
        from safediffcon_tpu.parallel.mesh import auto_mesh, init_distributed

        init_distributed()
        mesh = auto_mesh(sp=args.sp)
        if mesh is not None:
            logging.info("%s mesh active over %d devices",
                         "x".join(f"{mesh.shape[a]} {a}" for a in mesh.axis_names),
                         mesh.devices.size)
    _register_run(args.out, args)
    return TASKS[args.task](args)


if __name__ == "__main__":
    raise SystemExit(main())
