from .ckpt import save_checkpoint, load_checkpoint
from .misc import mse2psnr, visualize_depth_numpy
