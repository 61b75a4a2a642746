from .config import ModelConfig, GridGeometry, MAT_MODE, VEC_MODE
from .tensorf import FIELD_MODELS, FieldModel
from .shading import init_shading, apply_shading
from .alpha_mask import AlphaGridMask, sample_alpha
