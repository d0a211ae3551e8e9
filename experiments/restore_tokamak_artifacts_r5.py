"""Round-5 artifact restore: tokamak dataset + 200k pretrain (MANIFEST.md
rows tok_ref.npz + tokamak_pretrain_ckpt-200000), regenerated after the
round-4 -> round-5 re-clone dropped the gitignored artifacts/ binaries.
Exact round-3 recipe (run_tokamak_refscale.py): RL-in-the-loop closed-loop
datagen 48950/1000/50 at gen_batch 512, then the reference-length 200k-step
dim-128 bf16 pretrain (tokamak/configs: train length 200000) chunked at 50
steps/call.
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


from safediffcon_tpu.tasks.tokamak import (
    TokamakDataset, TokamakPretrainConfig, generate_tokamak_dataset, pretrain,
)

ART = "/root/repo/artifacts"
DATA = os.path.join(ART, "tok_ref.npz")
CKPT_DIR = "/tmp/tok_ref_ckpt"
STEPS = int(os.environ.get("TOK_PRETRAIN_STEPS", 200_000))

tick(f"devices: {jax.devices()}")
if not os.path.exists(DATA):
    generate_tokamak_dataset(DATA, n_train=48950, n_cal=1000, n_test=50,
                             gen_batch=512)
    tick("tok_ref.npz regenerated (48950/1000/50 closed-loop trajectories)")

train = TokamakDataset.load(DATA, "train")
pre = TokamakPretrainConfig(dim=128, batch_size=32,
                            checkpoint_every=100_000,
                            compute_dtype="bfloat16")
pretrain(pre, train, num_steps=STEPS, log_every=5000,
         checkpoint_dir=CKPT_DIR, resume_dir=CKPT_DIR, steps_per_call=50)
tick(f"pretrain {STEPS} steps done")

src = os.path.join(CKPT_DIR, f"ckpt-{STEPS}")
dst = os.path.join(ART, f"tokamak_pretrain_ckpt-{STEPS}")
if os.path.exists(src) and not os.path.exists(dst):
    shutil.copytree(src, dst)
    tick(f"durable copy: {dst}")
print("RESTORE_TOK_DONE", flush=True)
