"""Round-5 artifact restore: the durable artifacts/ directory is gitignored
(multi-GB binaries) and did not survive the round-4 -> round-5 re-clone, so
the 1D refscale base (MANIFEST.md rows burgers_ref.npz +
burgers_pretrain_ckpt-50000) is regenerated here exactly as round 2 built
it: 40k/1k/50 dataset at seed 0 and a 50k-step dim-128 bf16 pretrain
(reference training config 1D/configs/train_config.py:69-77; 50k is the
round-2 refscale base, not the full 200k).

Runs as the LIGHT concurrent lane while the 2D smoke datagen holds the
chip (round-3 note: light concurrent jobs share the tunnel fine; this one
is chunked into 50-step scans so each program is short).
"""
import logging
import os
import shutil
import time

import jax

logging.basicConfig(level=logging.INFO)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
t0 = time.time()


def tick(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)


from safediffcon_tpu.tasks.burgers.config import BurgersPretrainConfig
from safediffcon_tpu.tasks.burgers.data import (
    BurgersDataset, generate_burgers_dataset,
)
from safediffcon_tpu.tasks.burgers import pipeline as P

ART = "/root/repo/artifacts"
DATA = os.path.join(ART, "burgers_ref.npz")
CKPT_DIR = "/tmp/b_ref_ckpt"
STEPS = int(os.environ.get("B_PRETRAIN_STEPS", 50_000))

tick(f"devices: {jax.devices()}")
if not os.path.exists(DATA):
    generate_burgers_dataset(DATA, n_train=40000, n_cal=1000, n_test=50, seed=0)
    tick("burgers_ref.npz regenerated (41050 sims, seed 0)")

train = BurgersDataset.load(DATA, "train")
pre = BurgersPretrainConfig(dim=128, batch_size=16, lr=1e-5,
                            checkpoint_every=STEPS,
                            compute_dtype="bfloat16")
P.pretrain(pre, train, num_steps=STEPS, log_every=2000,
           checkpoint_dir=CKPT_DIR, resume_dir=CKPT_DIR, steps_per_call=50)
tick(f"pretrain {STEPS} steps done")

src = os.path.join(CKPT_DIR, f"ckpt-{STEPS}")
dst = os.path.join(ART, f"burgers_pretrain_ckpt-{STEPS}")
if os.path.exists(src) and not os.path.exists(dst):
    shutil.copytree(src, dst)
    tick(f"durable copy: {dst}")
print("RESTORE_1D_DONE", flush=True)
