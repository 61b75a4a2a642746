"""Static model configuration + grid geometry.

The reference mixes hyperparameters, device state and derived quantities on
an nn.Module (models/tensorBase.py:51-118).  Here the static hyperparameters
are a frozen (hashable) dataclass so they can close over jitted functions,
and the derived grid geometry (units / step size / sample count —
models/tensorBase.py:104-116) is a tiny host-side value recomputed at
segment boundaries (upsample / shrink events).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import numpy as np

# Plane/line axis conventions (reference models/tensorBase.py:60-61).
MAT_MODE: Tuple[Tuple[int, int], ...] = ((0, 1), (0, 2), (1, 2))
VEC_MODE: Tuple[int, ...] = (2, 1, 0)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Hashable hyperparameters of a factorized radiance field.

    Mirrors the arg dict built at reference train.py:227-247 plus the
    TensorBase defaults (models/tensorBase.py:52-83).
    """

    model_name: str = "TensorVMSplit"  # TensorVMSplit | TensorCP | TensorVM
    density_n_comp: Tuple[int, ...] = (16, 16, 16)
    app_n_comp: Tuple[int, ...] = (48, 48, 48)
    app_dim: int = 27
    density_shift: float = -10.0
    distance_scale: float = 25.0
    alpha_mask_thres: float = 0.001
    ray_march_weight_thres: float = 0.0001
    fea2dense_act: str = "softplus"  # softplus | relu
    near_far: Tuple[float, float] = (2.0, 6.0)
    step_ratio: float = 0.5
    shading_mode: str = "MLP_Fea"  # MLP_PE | MLP_Fea | MLP | SH | RGB
    pos_pe: int = 6
    view_pe: int = 6
    fea_pe: int = 6
    feature_c: int = 128
    dtype: str = "float32"  # compute dtype for the shading MLP
    # Compute dtype for the factor-grid gathers: the footprint tables are
    # cast to this before sampling, which halves both the forward gather
    # bytes and the backward scatter-add bytes (the scatter is the step's
    # most expensive op; see scripts/bench_ops.py).  Parameters, optimizer
    # state and regularizers stay float32 regardless.
    grid_dtype: str = "float32"
    # Dtype of the one-hot-lerp matrices in line-factor matmul sampling,
    # SEPARATE from grid_dtype: bf16 one-hot matrices halve the step's
    # largest materialized intermediate (the (M, L) interpolation matrix,
    # ~6 ms/step on v5e) without touching the plane-table dtype (bf16
    # plane tables were a measured LOSS — XLA convert passes around the
    # backward scatter).  Interpolation weights lose ~2^-9 relative
    # precision; opt-in until a matched-seed quality A/B justifies a
    # default flip (full CPU drive at bf16: 31.67 dB vs the 32.07 dB
    # fp32 clean run on the sphere preset — within trajectory noise of
    # the 30 dB bar but not proven neutral).
    line_dtype: str = "float32"

    # --- FreeNeRF mask bit lengths (reference models/tensorBase.py:81-83) ---
    @property
    def pos_bit_length(self) -> int:
        return 2 * self.pos_pe * 3

    @property
    def view_bit_length(self) -> int:
        return 2 * self.view_pe * 3

    @property
    def fea_bit_length(self) -> int:
        return 2 * self.fea_pe * self.app_dim

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class GridGeometry:
    """aabb + grid resolution + derived sampling quantities (hashable).

    Derivations follow update_stepSize (models/tensorBase.py:104-116):
    units = aabb_size/(grid-1); step = mean(units)*step_ratio;
    n_samples = diag/step + 1.
    """

    aabb: Tuple[float, float, float, float, float, float]
    grid_size: Tuple[int, int, int]
    step_ratio: float

    @property
    def aabb_np(self) -> np.ndarray:
        return np.asarray(self.aabb, dtype=np.float32).reshape(2, 3)

    @property
    def aabb_size(self) -> np.ndarray:
        a = self.aabb_np
        return a[1] - a[0]

    @property
    def units(self) -> np.ndarray:
        return self.aabb_size / (np.asarray(self.grid_size, np.float32) - 1)

    @property
    def step_size(self) -> float:
        return float(np.mean(self.units) * self.step_ratio)

    @property
    def aabb_diag(self) -> float:
        return float(np.sqrt(np.sum(np.square(self.aabb_size))))

    @property
    def n_samples(self) -> int:
        return int(self.aabb_diag / self.step_size) + 1

    @staticmethod
    def create(aabb, grid_size, step_ratio) -> "GridGeometry":
        aabb = tuple(float(v) for v in np.asarray(aabb).reshape(-1))
        grid_size = tuple(int(g) for g in grid_size)
        return GridGeometry(aabb, grid_size, float(step_ratio))


def n_to_reso(n_voxels: int, aabb) -> Tuple[int, int, int]:
    """Voxel count -> per-axis resolution (reference utils.py:117-121).

    float32 arithmetic on purpose: the reference computes this in torch
    float32 and the truncation boundary differs in float64 (128^3 would
    give 127 per axis in double precision).
    """
    aabb = np.asarray(aabb, dtype=np.float32).reshape(2, 3)
    size = aabb[1] - aabb[0]
    voxel_size = np.float32((size.prod() / n_voxels) ** (1.0 / 3))
    return tuple(int(v) for v in (size / voxel_size).astype(np.int64))


def cal_n_samples(reso, step_ratio: float = 0.5) -> int:
    """||reso||2 / step_ratio (reference utils.py:124-125)."""
    return int(np.linalg.norm(reso) / step_ratio)


def n_voxel_schedule(n_init: int, n_final: int, n_events: int):
    """Geometric (log-space) voxel-count schedule (train.py:209-215)."""
    return [
        int(round(v))
        for v in np.exp(
            np.linspace(math.log(n_init), math.log(n_final), n_events + 1)
        )
    ][1:]
