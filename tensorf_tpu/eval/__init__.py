from .metrics import psnr, rgb_ssim, rgb_lpips
from .evaluation import (
    RendererHandle,
    evaluation,
    evaluation_path,
    psnrs_calculate,
)
from .vis import create_gif, save_rendered_image_per_train
