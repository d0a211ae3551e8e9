from safediffcon_tpu.models.unet1d import UNet1D
from safediffcon_tpu.models.unet2d import UNet2D
from safediffcon_tpu.models.unet3d import UNet3D

__all__ = ["UNet1D", "UNet2D", "UNet3D"]
