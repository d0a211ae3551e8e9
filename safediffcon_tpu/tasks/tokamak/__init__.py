"""Tokamak KSTAR control task plugin."""
from safediffcon_tpu.tasks.tokamak.task import (
    NT,
    PAD_SIZE,
    SCALER,
    TokamakConditioner,
    TokamakTaskConfig,
)
from safediffcon_tpu.tasks.tokamak.config import (
    TokamakConformalConfig,
    TokamakInferenceConfig,
    TokamakPretrainConfig,
    finetune_config,
    posttrain_config,
)
from safediffcon_tpu.tasks.tokamak.data import TokamakDataset, generate_tokamak_dataset
from safediffcon_tpu.tasks.tokamak.pipeline import (
    TokamakPipeline, pretrain, run_inference, run_inference_resilient,
)
