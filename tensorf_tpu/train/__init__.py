from .losses import mse_loss, occlusion_loss, LossWeights
from .optim import make_optimizer
from .sampler import SimpleSampler
from .step import make_train_step, TrainStatics
