"""Round-4 UNet3D train-step MFU study (VERDICT r3 weak #1 / next #4).

Round 3 measured ~2.5 s/step at ~11% MFU for the bf16+remat UNet3D
fwd+bwd optimizer step (micro-batch 7, the reference's per-GPU batch,
2d/scripts/train.sh). Diagnosed causes: full-block remat recompute
(+~30% FLOPs) and dim-64 channels / dim_head-32 attention underfilling
the 128-wide MXU. This script A/Bs the controllable axes on the real
chip:

  - remat: full (round-3 default) vs save_heavy (save conv/dot outputs,
    recompute only the elementwise tail) vs none (if it fits)
  - micro-batch: 7 (accum 2) vs 14 (accum 1) — bigger M dims per launch

and records s/step, sustained TFLOP/s and MFU per config into
experiments/unet3d_mfu_round4.jsonl. Reference model:
2d/video_diffusion_pytorch/video_diffusion_pytorch_conv3d.py:357-574.
"""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from safediffcon_tpu.core.diffusion import DiffusionConfig, p_losses
from safediffcon_tpu.core.schedules import make_schedule
from safediffcon_tpu.models.unet3d import UNet3D
from safediffcon_tpu.tasks.smoke.task import train_conditioner

OUT = os.path.join(os.path.dirname(__file__), "unet3d_mfu_round4.jsonl")
PEAK_BF16 = 197e12  # v5e

FRAMES, SIZE, CH = 32, 64, 7
STEPS = int(os.environ.get("MFU_STEPS", 10))

sched = make_schedule(1000, "cosine")
dcfg = DiffusionConfig(timesteps=1000)
cond = train_conditioner()


def bench_config(remat, policy, batch, label, conv_impl="xla",
                 attn_impl="heads"):
    model = UNet3D(dim=64, dim_mults=(1, 2, 4), channels=CH,
                   compute_dtype=jnp.bfloat16, use_remat=remat,
                   remat_policy=policy, conv_impl=conv_impl,
                   attn_impl=attn_impl)
    apply_fn = lambda p, x, t: model.apply(p, x, t)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, FRAMES, SIZE, SIZE, CH))
    params = model.init(rng, x0, jnp.zeros((1,), jnp.int32))
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def loss_fn(p, rng, batch_x):
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (batch_x.shape[0],), 0, 1000)
        noise = jax.random.normal(rng_n, batch_x.shape, dtype=batch_x.dtype)
        return p_losses(apply_fn, p, sched, dcfg, batch_x, t, noise, cond).mean()

    @jax.jit
    def step(params, opt, rng, batch_x):
        loss, grads = jax.value_and_grad(loss_fn)(params, rng, batch_x)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    bx = jax.device_put(np.random.default_rng(0).normal(
        size=(batch, FRAMES, SIZE, SIZE, CH)).astype(np.float32))

    # FLOP count from XLA cost analysis of THIS config
    lowered = step.lower(params, opt, rng, bx)
    try:
        cost = lowered.compile().cost_analysis()
        flops = float(cost.get("flops", 0.0))
    except Exception:
        flops = float("nan")

    t_c0 = time.time()
    params, opt, loss = step(params, opt, rng, bx)
    jax.block_until_ready(loss)
    compile_s = time.time() - t_c0

    t0 = time.time()
    for i in range(STEPS):
        rng, k = jax.random.split(rng)
        params, opt, loss = step(params, opt, k, bx)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / STEPS

    rec = {
        "label": label, "remat": remat, "policy": policy, "batch": batch,
        "conv_impl": conv_impl, "attn_impl": attn_impl,
        "s_per_step": dt, "compile_s": compile_s,
        "flops_per_step": flops,
        "tflops_per_s": flops / dt / 1e12 if flops == flops else None,
        "mfu": flops / dt / PEAK_BF16 if flops == flops else None,
        "loss": float(loss),
    }
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def bench_op(label, fn, *args, steps=20, flops=None):
    """Time one isolated op fwd+bwd (sum-of-squares loss). Isolated ops
    compile in seconds-to-minutes even on the remote service, so this maps
    where the 2.5 s/step goes BEFORE any kernel work."""
    @jax.jit
    def fwd(*a):
        return fn(*a)

    @jax.jit
    def fwdbwd(*a):
        return jax.grad(lambda *aa: (fn(*aa) ** 2).sum().astype(jnp.float32))(*a)

    out = {}
    for name, f in (("fwd", fwd), ("fwdbwd", fwdbwd)):
        try:
            r = f(*args)
            jax.block_until_ready(r)
            t0_ = time.time()
            for _ in range(steps):
                r = f(*args)
            jax.block_until_ready(r)
            dt = (time.time() - t0_) / steps
            out[name] = dt
            if flops is not None:
                mult = 3.0 if name == "fwdbwd" else 1.0  # bwd ~= 2x fwd FLOPs
                out[name + "_mfu"] = flops * mult / dt / PEAK_BF16
        except Exception as e:  # noqa: BLE001
            out[name + "_error"] = str(e).splitlines()[0][:200]
    rec = {"op": label, **{k: (round(v, 6) if isinstance(v, float) else v)
                           for k, v in out.items()}}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def op_sweep(batch=7):
    """Per-op timing at the real UNet3D level shapes (dim 64, mults 1,2,4,
    32 frames of 64^2, micro-batch 7)."""
    import flax.linen as nn

    from safediffcon_tpu.models.unet3d import (
        SpatialLinearAttention3D, TemporalAttention,
    )

    rng = np.random.default_rng(0)
    levels = [(64, 64), (128, 32), (256, 16)]  # (channels, spatial)
    for ch, hw in levels:
        x = jnp.asarray(rng.normal(size=(batch, FRAMES, hw, hw, ch))
                        .astype(np.float32), dtype=jnp.bfloat16)
        # 3x3x3 conv — the FLOP carrier of every ResnetBlock3D
        conv = nn.Conv(ch, kernel_size=(3, 3, 3), padding="SAME",
                       dtype=jnp.bfloat16)
        p = conv.init(jax.random.PRNGKey(0), x)
        flops = 2.0 * batch * FRAMES * hw * hw * 27 * ch * ch
        bench_op(f"conv3x3x3_c{ch}_s{hw}",
                 lambda pp, xx, m=conv: m.apply(pp, xx), p, x, flops=flops)
        # the Pallas fused im2col kernel at the same shape (K = 27*ch)
        from safediffcon_tpu.ops.conv3d_mxu import conv3d_fused

        kf = jnp.asarray(rng.normal(size=(3, 3, 3, ch, ch))
                         .astype(np.float32) / np.sqrt(27 * ch),
                         dtype=jnp.bfloat16)
        bench_op(f"conv3x3x3_pallas_c{ch}_s{hw}",
                 lambda kk, xx: conv3d_fused(xx, kk, min(8, hw)), kf, x,
                 flops=flops)
        # GroupNorm(8)
        gn = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=jnp.bfloat16)
        pgn = gn.init(jax.random.PRNGKey(0), x)
        bench_op(f"groupnorm_c{ch}_s{hw}",
                 lambda pp, xx, m=gn: m.apply(pp, xx), pgn, x)
        # temporal attention (RoPE + 32x32 scores over B*HW token groups)
        ta = TemporalAttention(4, 32, dtype=jnp.bfloat16)
        pta = ta.init(jax.random.PRNGKey(0), x)
        bench_op(f"temporal_attn_c{ch}_s{hw}",
                 lambda pp, xx, m=ta: m.apply(pp, xx), pta, x)
        # spatial linear attention
        sa = SpatialLinearAttention3D(4, 32, dtype=jnp.bfloat16)
        psa = sa.init(jax.random.PRNGKey(0), x)
        bench_op(f"spatial_linattn_c{ch}_s{hw}",
                 lambda pp, xx, m=sa: m.apply(pp, xx), psa, x)
    # the 7x7x7 init conv (343-tap, C_in=7 -> 64)
    x7 = jnp.asarray(rng.normal(size=(batch, FRAMES, 64, 64, CH))
                     .astype(np.float32), dtype=jnp.bfloat16)
    c7 = nn.Conv(64, kernel_size=(7, 7, 7), padding="SAME", dtype=jnp.bfloat16)
    p7 = c7.init(jax.random.PRNGKey(0), x7)
    bench_op("init_conv7x7x7",
             lambda pp, xx, m=c7: m.apply(pp, xx), p7, x7,
             flops=2.0 * batch * FRAMES * 64 * 64 * 343 * CH * 64)
    # spatial-only downsample / transposed upsample convs
    xd = jnp.asarray(rng.normal(size=(batch, FRAMES, 64, 64, 64))
                     .astype(np.float32), dtype=jnp.bfloat16)
    cd = nn.Conv(64, kernel_size=(1, 4, 4), strides=(1, 2, 2),
                 padding=((0, 0), (1, 1), (1, 1)), dtype=jnp.bfloat16)
    pd = cd.init(jax.random.PRNGKey(0), xd)
    bench_op("downsample_conv144",
             lambda pp, xx, m=cd: m.apply(pp, xx), pd, xd)
    xu = jnp.asarray(rng.normal(size=(batch, FRAMES, 32, 32, 128))
                     .astype(np.float32), dtype=jnp.bfloat16)
    cu = nn.ConvTranspose(64, kernel_size=(1, 4, 4), strides=(1, 2, 2),
                          padding="SAME", dtype=jnp.bfloat16)
    pu = cu.init(jax.random.PRNGKey(0), xu)
    bench_op("upsample_convT144",
             lambda pp, xx, m=cu: m.apply(pp, xx), pu, xu)


def op_sweep_1d(batch=50):
    """Per-op timing at the 1D bench's UNet2D shapes (dim 128, mults
    (1,2,4,8), 16x128 spatial, batch 50 — the config whose guided DDIM
    step measures 57.9% MFU with the residual 1.73x 'inside the
    conv/attention kernels', BASELINE.md round-3 closure). Identifies
    which kernel carries the residual."""
    import flax.linen as nn

    from safediffcon_tpu.models.layers import Attention, LinearAttention

    rng = np.random.default_rng(0)
    # (channels, (h, w)) per level: spatial halves in BOTH dims per level
    levels = [(128, (16, 128)), (256, (8, 64)), (512, (4, 32)),
              (1024, (2, 16))]
    for ch, (hh, ww) in levels:
        x = jnp.asarray(rng.normal(size=(batch, hh, ww, ch))
                        .astype(np.float32), dtype=jnp.bfloat16)
        conv = nn.Conv(ch, kernel_size=(3, 3), padding="SAME",
                       dtype=jnp.bfloat16)
        p = conv.init(jax.random.PRNGKey(0), x)
        flops = 2.0 * batch * hh * ww * 9 * ch * ch
        bench_op(f"1d_conv3x3_c{ch}_s{hh}x{ww}",
                 lambda pp, xx, m=conv: m.apply(pp, xx), p, x, flops=flops)
        la = LinearAttention(4, 32, dtype=jnp.bfloat16)
        pla = la.init(jax.random.PRNGKey(0), x)
        bench_op(f"1d_linattn_c{ch}_s{hh}x{ww}",
                 lambda pp, xx, m=la: m.apply(pp, xx), pla, x)
    # mid full attention at the bottleneck
    xm = jnp.asarray(rng.normal(size=(batch, 2, 16, 1024))
                     .astype(np.float32), dtype=jnp.bfloat16)
    at = Attention(4, 32, dtype=jnp.bfloat16)
    pat = at.init(jax.random.PRNGKey(0), xm)
    bench_op("1d_midattn_c1024_s2x16",
             lambda pp, xx, m=at: m.apply(pp, xx), pat, xm)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    if os.environ.get("MFU_OPS", "1") == "1":
        op_sweep()
    if os.environ.get("MFU_OPS_1D", "1") == "1":
        try:
            op_sweep_1d()
        except Exception as e:  # noqa: BLE001 — layer-shape drift shouldn't kill the 3D sweep
            print(json.dumps({"op": "1d_sweep", "error": str(e)[:300]}), flush=True)
    configs = [
        ("full_b7", True, "full", 7, "xla", "heads"),
        ("save_heavy_b7", True, "save_heavy", 7, "xla", "heads"),
        ("save_heavy_b14", True, "save_heavy", 14, "xla", "heads"),
        ("none_b7", False, "full", 7, "xla", "heads"),
        ("full_b14", True, "full", 14, "xla", "heads"),
        ("pallas_conv_b7", True, "full", 7, "pallas", "heads"),
        ("pallas_conv_save_heavy_b7", True, "save_heavy", 7, "pallas", "heads"),
        # head-packed 128-tile attention matmuls (round-4, models/unet3d.py)
        ("packed_attn_b7", True, "full", 7, "xla", "packed"),
        # round-5 follow-ups to the measured 1.48x packed win: bigger M
        # dims per launch (b14 accum-1) and no-remat (drop the ~30%
        # recompute) on the packed layout
        ("packed_attn_b14", True, "full", 14, "xla", "packed"),
        ("packed_attn_none_b7", False, "full", 7, "xla", "packed"),
        ("packed_attn_none_b14", False, "full", 14, "xla", "packed"),
        ("packed_attn_save_heavy_b7", True, "save_heavy", 7, "xla", "packed"),
        ("packed_attn_pallas_conv_b7", True, "save_heavy", 7, "pallas", "packed"),
    ]
    sel = os.environ.get("MFU_CONFIGS")
    if sel is not None:
        names = set(n for n in sel.split(",") if n)
        configs = [c for c in configs if c[0] in names]
    for label, remat, policy, batch, conv_impl, attn_impl in configs:
        try:
            bench_config(remat, policy, batch, label, conv_impl=conv_impl,
                         attn_impl=attn_impl)
        except Exception as e:  # OOM configs are informative, not fatal
            msg = str(e).splitlines()[0][:300]
            print(json.dumps({"label": label, "error": msg}), flush=True)
            with open(OUT, "a") as f:
                f.write(json.dumps({"label": label, "error": msg}) + "\n")
