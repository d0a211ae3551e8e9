"""2D smoke control task plugin."""
from safediffcon_tpu.tasks.smoke.task import (
    FRAMES,
    RESCALER,
    SIZE,
    SmokeConditioner,
    SmokeTaskConfig,
)
from safediffcon_tpu.tasks.smoke.config import (
    SmokeConformalConfig,
    SmokeInferenceConfig,
    SmokePretrainConfig,
    finetune_config,
    posttrain_config,
)
from safediffcon_tpu.tasks.smoke.data import SmokeDataset, generate_smoke_dataset
from safediffcon_tpu.tasks.smoke.pipeline import (
    SmokePipeline, pretrain, run_inference, run_inference_resilient,
)
