"""Round-5 compile prewarm for the UNet3D MFU study.

The remote compile service takes tens of minutes per UNet3D fwd+bwd
program but runs OFF-chip, so these compiles overlap the smoke datagen
currently holding the executor. Lower+compile each MFU full-step config
(exactly the HLO profile_unet3d_mfu_r4.py::bench_config builds — same
model flags, optimizer, loss) WITHOUT executing, so the persistent cache
(/tmp/jax_cache) is hot when the timing sweep runs on a quiet chip.

Configs via MFU_CONFIGS (same names as profile_unet3d_mfu_r4.py).
"""
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

FRAMES, SIZE, CH = 32, 64, 7
sched = make_schedule(1000, "cosine")
dcfg = DiffusionConfig(timesteps=1000)
cond = train_conditioner()

CONFIGS = {
    "full_b7": (True, "full", 7, "xla", "heads"),
    "save_heavy_b7": (True, "save_heavy", 7, "xla", "heads"),
    "save_heavy_b14": (True, "save_heavy", 14, "xla", "heads"),
    "packed_attn_b7": (True, "full", 7, "xla", "packed"),
    "packed_attn_save_heavy_b7": (True, "save_heavy", 7, "xla", "packed"),
    "pallas_conv_save_heavy_b7": (True, "save_heavy", 7, "pallas", "heads"),
}


def prewarm(label):
    remat, policy, batch, conv_impl, attn_impl = CONFIGS[label]
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
    t0 = time.time()
    step.lower(params, opt, rng, bx).compile()
    print(f"PREWARM {label}: compiled in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    sel = os.environ.get(
        "MFU_CONFIGS", "full_b7,save_heavy_b7,packed_attn_save_heavy_b7")
    for name in sel.split(","):
        if not name:
            continue
        try:
            prewarm(name)
        except Exception as e:  # noqa: BLE001
            print(f"PREWARM {name} FAILED: {str(e)[:300]}", flush=True)
    print("PREWARM_DONE", flush=True)
