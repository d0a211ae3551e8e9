"""safediffcon_tpu — TPU-native rebuild of SafeDiffCon (ICML 2025).

Safe PDE control with diffusion models + weighted conformal prediction,
re-designed for TPU: guided denoising as fused `lax.scan`, conformal
calibration as batched jittable math, and JAX physics solvers (Burgers FD,
incompressible smoke, KSTAR surrogate) replacing the reference's
torch/PhiFlow/Keras stack (reference: /root/reference, see SURVEY.md).

Layout convention: all trajectory tensors are channels-LAST
(batch, *spacetime, channels), the natural layout for XLA:TPU convolutions.
The reference uses torch channels-first; task modules document the mapping.
"""

__version__ = "0.1.0"

from safediffcon_tpu.core.schedules import DiffusionSchedule, make_schedule
from safediffcon_tpu.core.diffusion import GaussianDiffusion, DiffusionConfig

__all__ = [
    "DiffusionSchedule",
    "make_schedule",
    "GaussianDiffusion",
    "DiffusionConfig",
]
