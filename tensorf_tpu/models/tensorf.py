"""Tensor factorizations: TensorVMSplit, TensorCP, TensorVM.

TPU-native re-design of the reference factorized fields
(models/tensoRF.py:6-484).  Params are plain pytrees of channels-last
arrays; all feature computation is fixed-shape and fuses under jit.

Layout (differs from the torch NCHW reference on purpose):
  * plane factor i: (H, W, R) with H = grid[mat_mode[i][1]],
    W = grid[mat_mode[i][0]] — each bilinear tap reads a contiguous
    R-vector (lane dimension).
  * line factor i: (L, R) with L = grid[vec_mode[i]].

Init scales follow the reference: 0.1·randn for VM planes/lines
(tensoRF.py:158), 0.2·randn for CP lines (tensoRF.py:336,346); the basis
matrix is a bias-free linear layer with torch default init
(tensoRF.py:149,338).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.grid_sample import (
    footprint_sample_1d,
    footprint_sample_2d,
    grid_sample_1d,
    grid_sample_2d,
    line_sample_matmul,
    make_footprint_1d,
    make_footprint_2d,
)
from ..ops.resize import (
    resize_bilinear_align_corners,
    resize_linear_align_corners,
)
from .config import MAT_MODE, VEC_MODE, ModelConfig
from .shading import init_shading

# Below this length, line-factor sampling runs as a one-hot-lerp matmul on
# the MXU (ops/grid_sample.line_sample_matmul) — both directions beat the
# row-rate-bound gather/scatter by an order of magnitude.
_LINE_MATMUL_MAX_LEN = 1024


def _sample_line_packed(lpacked, coord, a_dtype=None):
    if lpacked.shape[0] <= _LINE_MATMUL_MAX_LEN:
        return line_sample_matmul(lpacked, coord, a_dtype=a_dtype)
    return footprint_sample_1d(
        make_footprint_1d(lpacked), lpacked.shape[0], coord
    )


def _line_a_dtype(cfg):
    """One-hot matrix dtype for line matmuls: bf16 when the model opts in
    via cfg.line_dtype (or legacy blanket cfg.grid_dtype=bfloat16)."""
    for d in (getattr(cfg, "line_dtype", "float32"), cfg.grid_dtype):
        if jnp.dtype(d) == jnp.bfloat16:
            return jnp.bfloat16
    return None


def _basis_init(key, fan_in: int, fan_out: int) -> jax.Array:
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(
        key, (fan_in, fan_out), minval=-bound, maxval=bound, dtype=jnp.float32
    )


def _off_diag_mean_abs(line: jax.Array) -> jax.Array:
    """Mean |off-diagonal| of the rank Gram matrix of one line factor.

    Reference vectorDiffs (tensoRF.py:175-184): lines are (L, R) here; the
    Gram is over ranks, normalized by the R^2 - R off-diagonal count.
    """
    a = line.T  # (R, L)
    gram = a @ a.T
    r = gram.shape[0]
    off = jnp.sum(jnp.abs(gram)) - jnp.sum(jnp.abs(jnp.diagonal(gram)))
    return off / (r * r - r)


def _tv_2d(plane: jax.Array) -> jax.Array:
    """Anisotropic squared-difference TV on an (H, W, C) plane.

    Matches TVLoss (loss.py:120-141) on a (1, C, H, W) tensor: the counts
    include the channel dimension.
    """
    H, W, C = plane.shape
    h_tv = jnp.sum(jnp.square(plane[1:] - plane[:-1]))
    w_tv = jnp.sum(jnp.square(plane[:, 1:] - plane[:, :-1]))
    count_h = (H - 1) * W * C
    count_w = H * (W - 1) * C
    return 2.0 * (h_tv / count_h + w_tv / count_w)


def _tv_1d(line: jax.Array) -> jax.Array:
    """TV over the length axis of an (L, C) line.

    The reference feeds (1, R, L, 1) lines into the same TVLoss, whose
    width term degenerates to 0/0 (loss.py:129-137 with w_x == 1) —
    intended semantics is TV over L only, which is what we compute.
    """
    L, C = line.shape
    h_tv = jnp.sum(jnp.square(line[1:] - line[:-1]))
    return 2.0 * (h_tv / ((L - 1) * C))


def _plane_shapes(cfg_ranks, grid_size):
    for i, (m0, m1) in enumerate(MAT_MODE):
        yield i, grid_size[m1], grid_size[m0], cfg_ranks[i]


class FieldModel:
    """Namespace of pure functions for one factorization (static registry)."""

    name = "base"

    @staticmethod
    def init(key, cfg: ModelConfig, grid_size) -> Dict:
        raise NotImplementedError

    @staticmethod
    def density_feature(cfg, params, xyz, mask) -> jax.Array:
        raise NotImplementedError

    @staticmethod
    def app_feature(cfg, params, xyz, mask) -> jax.Array:
        raise NotImplementedError


class TensorVMSplit(FieldModel):
    """Per-axis plane+line factors, separate density/appearance grids.

    Reference: models/tensoRF.py:141-327.
    """

    name = "TensorVMSplit"
    has_ortho = True

    @staticmethod
    def init(key, cfg: ModelConfig, grid_size) -> Dict:
        keys = jax.random.split(key, 14)
        dp, dl, ap, al = [], [], [], []
        for i, H, W, R in _plane_shapes(cfg.density_n_comp, grid_size):
            dp.append(0.1 * jax.random.normal(keys[i], (H, W, R)))
            L = grid_size[VEC_MODE[i]]
            dl.append(0.1 * jax.random.normal(keys[3 + i], (L, R)))
        for i, H, W, R in _plane_shapes(cfg.app_n_comp, grid_size):
            ap.append(0.1 * jax.random.normal(keys[6 + i], (H, W, R)))
            L = grid_size[VEC_MODE[i]]
            al.append(0.1 * jax.random.normal(keys[9 + i], (L, R)))
        return {
            "density_plane": tuple(dp),
            "density_line": tuple(dl),
            "app_plane": tuple(ap),
            "app_line": tuple(al),
            "basis": _basis_init(keys[12], sum(cfg.app_n_comp), cfg.app_dim),
            "render": init_shading(keys[13], cfg),
        }

    @staticmethod
    def density_feature(cfg, params, xyz, mask) -> jax.Array:
        """xyz (M, 3) normalized -> (M,).  Reference tensoRF.py:207-227."""
        feat = jnp.zeros(xyz.shape[:-1], dtype=xyz.dtype)
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            p = grid_sample_2d(params["density_plane"][i], xyz[..., (m0, m1)])
            l = grid_sample_1d(params["density_line"][i], xyz[..., VEC_MODE[i]])
            if mask is not None:
                # mask applied to both factors (squared), as the reference
                # intends at tensoRF.py:224-225.
                p = p * mask[i]
                l = l * mask[i]
            feat = feat + jnp.sum(p * l, axis=-1)
        return feat

    @staticmethod
    def app_feature(cfg, params, xyz, mask) -> jax.Array:
        """xyz (M, 3) -> (M, app_dim).  Reference tensoRF.py:230-263."""
        coefs = []
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            p = grid_sample_2d(params["app_plane"][i], xyz[..., (m0, m1)])
            l = grid_sample_1d(params["app_line"][i], xyz[..., VEC_MODE[i]])
            if mask is not None:
                p = p * mask[i]
                l = l * mask[i]
            coefs.append(p * l)
        return jnp.concatenate(coefs, axis=-1) @ params["basis"]

    @staticmethod
    def fused_features(cfg, params, xyz, den_mask, app_mask):
        """One gather pass -> (density_feature (M,), app_feature (M, app_dim)).

        The TPU-fast path: per axis, density+appearance planes are packed
        channel-wise into one footprint table (ops/grid_sample.py), so each
        sample costs 3 plane rows + 3 line rows instead of the reference's
        36 grid_sample rows (TPU gathers are row-rate bound).  Numerically
        identical to density_feature + app_feature for in-bbox samples.
        """
        den_feat = jnp.zeros(xyz.shape[:-1], dtype=xyz.dtype)
        app_coefs = []
        gdt = jnp.dtype(cfg.grid_dtype)
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            rd = cfg.density_n_comp[i]
            packed = jnp.concatenate(
                [params["density_plane"][i], params["app_plane"][i]], axis=-1
            ).astype(gdt)
            H, W, _ = packed.shape
            pv = footprint_sample_2d(
                make_footprint_2d(packed), H, W, xyz[..., (m0, m1)]
            )
            lpacked = jnp.concatenate(
                [params["density_line"][i], params["app_line"][i]], axis=-1
            )
            lv = _sample_line_packed(
                lpacked, xyz[..., VEC_MODE[i]], _line_a_dtype(cfg)
            )
            dp, ap = pv[..., :rd], pv[..., rd:]
            dl, al = lv[..., :rd], lv[..., rd:]
            if den_mask is not None:
                dp = dp * den_mask[i]
                dl = dl * den_mask[i]
            if app_mask is not None:
                ap = ap * app_mask[i]
                al = al * app_mask[i]
            den_feat = den_feat + jnp.sum(dp * dl, axis=-1)
            app_coefs.append(ap * al)
        app_feat = jnp.concatenate(app_coefs, axis=-1) @ params["basis"]
        return den_feat, app_feat

    @staticmethod
    def density_feature_fused(cfg, params, xyz, mask) -> jax.Array:
        """Density-only footprint path: 3 plane rows + 3 line matmuls.

        Same numerics as density_feature; used by the split render path
        (density over the full lattice, appearance only on the top-K
        shading samples) where packing appearance into the same gather
        would waste 3/4 of the gather/scatter bytes.
        """
        gdt = jnp.dtype(cfg.grid_dtype)
        feat = jnp.zeros(xyz.shape[:-1], dtype=xyz.dtype)
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            plane = params["density_plane"][i].astype(gdt)
            H, W, _ = plane.shape
            p = footprint_sample_2d(
                make_footprint_2d(plane), H, W, xyz[..., (m0, m1)]
            )
            l = _sample_line_packed(
                params["density_line"][i], xyz[..., VEC_MODE[i]],
                _line_a_dtype(cfg),
            )
            if mask is not None:
                p = p * mask[i]
                l = l * mask[i]
            feat = feat + jnp.sum(p * l, axis=-1)
        return feat

    @staticmethod
    def app_feature_fused(cfg, params, xyz, mask) -> jax.Array:
        """Appearance-only footprint path (see density_feature_fused)."""
        gdt = jnp.dtype(cfg.grid_dtype)
        coefs = []
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            plane = params["app_plane"][i].astype(gdt)
            H, W, _ = plane.shape
            p = footprint_sample_2d(
                make_footprint_2d(plane), H, W, xyz[..., (m0, m1)]
            )
            l = _sample_line_packed(
                params["app_line"][i], xyz[..., VEC_MODE[i]],
                _line_a_dtype(cfg),
            )
            if mask is not None:
                p = p * mask[i]
                l = l * mask[i]
            coefs.append(p * l)
        return jnp.concatenate(coefs, axis=-1) @ params["basis"]

    # ---- regularizers -----------------------------------------------------

    @staticmethod
    def ortho_reg(params) -> jax.Array:
        total = 0.0
        for l in params["density_line"] + params["app_line"]:
            total = total + _off_diag_mean_abs(l)
        return total

    @staticmethod
    def density_l1(params) -> jax.Array:
        total = 0.0
        for i in range(3):
            total = total + jnp.mean(jnp.abs(params["density_plane"][i]))
            total = total + jnp.mean(jnp.abs(params["density_line"][i]))
        return total

    @staticmethod
    def tv_density(params) -> jax.Array:
        # Planes only, with the in-model 1e-2 factor (tensoRF.py:195-199).
        return sum(_tv_2d(p) * 1e-2 for p in params["density_plane"])

    @staticmethod
    def tv_app(params) -> jax.Array:
        return sum(_tv_2d(p) * 1e-2 for p in params["app_plane"])

    # ---- shape-changing schedule events (host-side) -----------------------

    @staticmethod
    def upsample(cfg, params, grid_size) -> Dict:
        """Bilinear align_corners upsample of all factors (tensoRF.py:267-288)."""
        out = dict(params)
        for field in ("density", "app"):
            planes, lines = [], []
            for i in range(3):
                m0, m1 = MAT_MODE[i]
                planes.append(
                    resize_bilinear_align_corners(
                        params[f"{field}_plane"][i], grid_size[m1], grid_size[m0]
                    )
                )
                lines.append(
                    resize_linear_align_corners(
                        params[f"{field}_line"][i], grid_size[VEC_MODE[i]]
                    )
                )
            out[f"{field}_plane"] = tuple(planes)
            out[f"{field}_line"] = tuple(lines)
        return out

    @staticmethod
    def shrink(cfg, params, t_l, b_r) -> Dict:
        """Voxel-aligned crop of all factors (tensoRF.py:290-314)."""
        out = dict(params)
        for field in ("density", "app"):
            planes, lines = [], []
            for i in range(3):
                m0, m1 = MAT_MODE[i]
                v = VEC_MODE[i]
                planes.append(
                    params[f"{field}_plane"][i][
                        t_l[m1] : b_r[m1], t_l[m0] : b_r[m0], :
                    ]
                )
                lines.append(params[f"{field}_line"][i][t_l[v] : b_r[v], :])
            out[f"{field}_plane"] = tuple(planes)
            out[f"{field}_line"] = tuple(lines)
        return out

    @staticmethod
    def grid_size_of(params) -> Tuple[int, int, int]:
        # line i spans grid axis VEC_MODE[i]; VEC_MODE = (2, 1, 0).
        ls = [params["density_line"][i].shape[0] for i in range(3)]
        return (ls[2], ls[1], ls[0])


class TensorCP(FieldModel):
    """Rank-R CP decomposition: three line factors per field.

    Reference: models/tensoRF.py:330-484.
    """

    name = "TensorCP"
    has_ortho = False

    @staticmethod
    def init(key, cfg: ModelConfig, grid_size) -> Dict:
        keys = jax.random.split(key, 8)
        r_den, r_app = cfg.density_n_comp[0], cfg.app_n_comp[0]
        dl = tuple(
            0.2 * jax.random.normal(keys[i], (grid_size[VEC_MODE[i]], r_den))
            for i in range(3)
        )
        al = tuple(
            0.2 * jax.random.normal(keys[3 + i], (grid_size[VEC_MODE[i]], r_app))
            for i in range(3)
        )
        return {
            "density_line": dl,
            "app_line": al,
            "basis": _basis_init(keys[6], r_app, cfg.app_dim),
            "render": init_shading(keys[7], cfg),
        }

    @staticmethod
    def _line_product(lines, xyz):
        prod = grid_sample_1d(lines[0], xyz[..., VEC_MODE[0]])
        prod = prod * grid_sample_1d(lines[1], xyz[..., VEC_MODE[1]])
        prod = prod * grid_sample_1d(lines[2], xyz[..., VEC_MODE[2]])
        return prod  # (M, R)

    @staticmethod
    def density_feature(cfg, params, xyz, mask) -> jax.Array:
        prod = TensorCP._line_product(params["density_line"], xyz)
        if mask is not None:
            prod = prod * mask[0]
        return jnp.sum(prod, axis=-1)

    @staticmethod
    def app_feature(cfg, params, xyz, mask) -> jax.Array:
        prod = TensorCP._line_product(params["app_line"], xyz)
        if mask is not None:
            prod = prod * mask[0]
        return prod @ params["basis"]

    @staticmethod
    def fused_features(cfg, params, xyz, den_mask, app_mask):
        """One packed line gather per axis -> (density, appearance) features.

        3 gathered rows per sample (the density and appearance line factors
        share each row) instead of 12 separate grid_sample rows.
        """
        rd = cfg.density_n_comp[0]
        dprod = aprod = None
        for i in range(3):
            lpacked = jnp.concatenate(
                [params["density_line"][i], params["app_line"][i]], axis=-1
            )
            lv = _sample_line_packed(
                lpacked, xyz[..., VEC_MODE[i]], _line_a_dtype(cfg)
            )
            dl, al = lv[..., :rd], lv[..., rd:]
            dprod = dl if dprod is None else dprod * dl
            aprod = al if aprod is None else aprod * al
        if den_mask is not None:
            dprod = dprod * den_mask[0]
        if app_mask is not None:
            aprod = aprod * app_mask[0]
        return jnp.sum(dprod, axis=-1), aprod @ params["basis"]

    @staticmethod
    def density_feature_fused(cfg, params, xyz, mask) -> jax.Array:
        """CP density is lines-only — already the fast (matmul) path."""
        prod = None
        for i in range(3):
            lv = _sample_line_packed(
                params["density_line"][i], xyz[..., VEC_MODE[i]],
                _line_a_dtype(cfg),
            )
            prod = lv if prod is None else prod * lv
        if mask is not None:
            prod = prod * mask[0]
        return jnp.sum(prod, axis=-1)

    @staticmethod
    def app_feature_fused(cfg, params, xyz, mask) -> jax.Array:
        prod = None
        for i in range(3):
            lv = _sample_line_packed(
                params["app_line"][i], xyz[..., VEC_MODE[i]],
                _line_a_dtype(cfg),
            )
            prod = lv if prod is None else prod * lv
        if mask is not None:
            prod = prod * mask[0]
        return prod @ params["basis"]

    @staticmethod
    def density_l1(params) -> jax.Array:
        return sum(jnp.mean(jnp.abs(l)) for l in params["density_line"])

    @staticmethod
    def tv_density(params) -> jax.Array:
        # CP uses the 1e-3 factor (tensoRF.py:474-478).
        return sum(_tv_1d(l) * 1e-3 for l in params["density_line"])

    @staticmethod
    def tv_app(params) -> jax.Array:
        return sum(_tv_1d(l) * 1e-3 for l in params["app_line"])

    @staticmethod
    def upsample(cfg, params, grid_size) -> Dict:
        out = dict(params)
        for field in ("density", "app"):
            out[f"{field}_line"] = tuple(
                resize_linear_align_corners(
                    params[f"{field}_line"][i], grid_size[VEC_MODE[i]]
                )
                for i in range(3)
            )
        return out

    @staticmethod
    def shrink(cfg, params, t_l, b_r) -> Dict:
        out = dict(params)
        for field in ("density", "app"):
            out[f"{field}_line"] = tuple(
                params[f"{field}_line"][i][t_l[VEC_MODE[i]] : b_r[VEC_MODE[i]], :]
                for i in range(3)
            )
        return out

    @staticmethod
    def grid_size_of(params) -> Tuple[int, int, int]:
        ls = [params["density_line"][i].shape[0] for i in range(3)]
        return (ls[2], ls[1], ls[0])


class TensorVM(FieldModel):
    """Legacy shared-tensor VM variant (reference tensoRF.py:6-138).

    Single plane/line parameter blocks whose channel range is split between
    appearance ([:app_n]) and density ([-density_n:]).  Kept for surface
    parity; the split variant is the recommended model.
    """

    name = "TensorVM"
    has_ortho = True

    @staticmethod
    def init(key, cfg: ModelConfig, grid_size) -> Dict:
        # per-axis factor tuples (not one stacked cubic block) so shrink
        # can crop each axis independently — the reference's own stacked
        # layout is why its TensorVM.shrink is broken (tensoRF.py:137)
        r_total = cfg.app_n_comp[0] + cfg.density_n_comp[0]
        k1, k2, k3, k4 = jax.random.split(key, 4)
        pkeys = jax.random.split(k1, 3)
        lkeys = jax.random.split(k2, 3)
        planes, lines = [], []
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            planes.append(
                0.1
                * jax.random.normal(
                    pkeys[i], (grid_size[m1], grid_size[m0], r_total)
                )
            )
            lines.append(
                0.1
                * jax.random.normal(lkeys[i], (grid_size[VEC_MODE[i]], r_total))
            )
        return {
            "plane": tuple(planes),
            "line": tuple(lines),
            "basis": _basis_init(k3, cfg.app_n_comp[0] * 3, cfg.app_dim),
            "render": init_shading(k4, cfg),
        }

    @staticmethod
    def _gather(cfg, params, xyz, lo, hi):
        ps, ls = [], []
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            ps.append(grid_sample_2d(params["plane"][i][:, :, lo:hi], xyz[..., (m0, m1)]))
            ls.append(grid_sample_1d(params["line"][i][:, lo:hi], xyz[..., VEC_MODE[i]]))
        return ps, ls

    @staticmethod
    def density_feature(cfg, params, xyz, mask) -> jax.Array:
        r_total = params["plane"][0].shape[-1]
        ps, ls = TensorVM._gather(cfg, params, xyz, r_total - cfg.density_n_comp[0], r_total)
        feat = jnp.zeros(xyz.shape[:-1], dtype=xyz.dtype)
        for p, l in zip(ps, ls):
            feat = feat + jnp.sum(p * l, axis=-1)
        return feat

    @staticmethod
    def app_feature(cfg, params, xyz, mask) -> jax.Array:
        ps, ls = TensorVM._gather(cfg, params, xyz, 0, cfg.app_n_comp[0])
        coefs = jnp.concatenate([p * l for p, l in zip(ps, ls)], axis=-1)
        return coefs @ params["basis"]

    @staticmethod
    def fused_features(cfg, params, xyz, den_mask, app_mask):
        """Shared-tensor variant: the channel ranges already share rows, so
        one footprint gather per axis serves both fields."""
        rd, ra = cfg.density_n_comp[0], cfg.app_n_comp[0]
        den_feat = jnp.zeros(xyz.shape[:-1], dtype=xyz.dtype)
        app_coefs = []
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            plane = params["plane"][i]
            H, W, _ = plane.shape
            pv = footprint_sample_2d(
                make_footprint_2d(plane), H, W, xyz[..., (m0, m1)]
            )
            line = params["line"][i]
            lv = _sample_line_packed(
                line, xyz[..., VEC_MODE[i]], _line_a_dtype(cfg)
            )
            den_feat = den_feat + jnp.sum(
                pv[..., -rd:] * lv[..., -rd:], axis=-1
            )
            app_coefs.append(pv[..., :ra] * lv[..., :ra])
        app_feat = jnp.concatenate(app_coefs, axis=-1) @ params["basis"]
        return den_feat, app_feat

    @staticmethod
    def density_feature_fused(cfg, params, xyz, mask) -> jax.Array:
        """Shared-tensor variant: density channel range of the footprint."""
        rd = cfg.density_n_comp[0]
        feat = jnp.zeros(xyz.shape[:-1], dtype=xyz.dtype)
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            plane = params["plane"][i][:, :, -rd:]
            H, W, _ = plane.shape
            p = footprint_sample_2d(
                make_footprint_2d(plane), H, W, xyz[..., (m0, m1)]
            )
            l = _sample_line_packed(
                params["line"][i][:, -rd:], xyz[..., VEC_MODE[i]],
                _line_a_dtype(cfg),
            )
            feat = feat + jnp.sum(p * l, axis=-1)
        return feat

    @staticmethod
    def app_feature_fused(cfg, params, xyz, mask) -> jax.Array:
        ra = cfg.app_n_comp[0]
        coefs = []
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            plane = params["plane"][i][:, :, :ra]
            H, W, _ = plane.shape
            p = footprint_sample_2d(
                make_footprint_2d(plane), H, W, xyz[..., (m0, m1)]
            )
            l = _sample_line_packed(
                params["line"][i][:, :ra], xyz[..., VEC_MODE[i]],
                _line_a_dtype(cfg),
            )
            coefs.append(p * l)
        return jnp.concatenate(coefs, axis=-1) @ params["basis"]

    @staticmethod
    def ortho_reg(params) -> jax.Array:
        total = 0.0
        for i in range(3):
            total = total + _off_diag_mean_abs(params["line"][i])
        return total

    @staticmethod
    def density_l1(params) -> jax.Array:
        # mean |.| over ALL factor entries (reference density_L1 semantics)
        # computed as weighted sums so ragged per-axis shapes keep the
        # same value the stacked layout had
        p_sum = sum(jnp.sum(jnp.abs(p)) for p in params["plane"])
        p_n = sum(p.size for p in params["plane"])
        l_sum = sum(jnp.sum(jnp.abs(l)) for l in params["line"])
        l_n = sum(l.size for l in params["line"])
        return p_sum / p_n + l_sum / l_n

    @staticmethod
    def tv_density(params) -> jax.Array:
        return sum(_tv_2d(params["plane"][i]) * 1e-2 for i in range(3))

    @staticmethod
    def tv_app(params) -> jax.Array:
        return jnp.asarray(0.0)

    @staticmethod
    def upsample(cfg, params, grid_size) -> Dict:
        """Bilinear align_corners upsample (reference tensoRF.py:119-128)."""
        out = dict(params)
        planes, lines = [], []
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            planes.append(
                resize_bilinear_align_corners(
                    params["plane"][i], grid_size[m1], grid_size[m0]
                )
            )
            lines.append(
                resize_linear_align_corners(
                    params["line"][i], grid_size[VEC_MODE[i]]
                )
            )
        out["plane"] = tuple(planes)
        out["line"] = tuple(lines)
        return out

    @staticmethod
    def shrink(cfg, params, t_l, b_r) -> Dict:
        """Voxel-aligned crop of the shared factors.

        The reference's own TensorVM.shrink is broken (tensoRF.py:137
        slices a stacked cubic block with per-axis bounds, which cannot
        type-check); this implements the evidently *intended* semantics —
        the per-axis crop its TensorVMSplit sibling performs
        (tensoRF.py:290-314) — which the per-axis tuple layout makes
        directly expressible.
        """
        out = dict(params)
        planes, lines = [], []
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            v = VEC_MODE[i]
            planes.append(
                params["plane"][i][t_l[m1] : b_r[m1], t_l[m0] : b_r[m0], :]
            )
            lines.append(params["line"][i][t_l[v] : b_r[v], :])
        out["plane"] = tuple(planes)
        out["line"] = tuple(lines)
        return out

    @staticmethod
    def grid_size_of(params) -> Tuple[int, int, int]:
        # line i spans grid axis VEC_MODE[i]; VEC_MODE = (2, 1, 0).
        ls = [params["line"][i].shape[0] for i in range(3)]
        return (ls[2], ls[1], ls[0])


FIELD_MODELS = {
    m.name: m for m in (TensorVMSplit, TensorCP, TensorVM)
}


def spatial_label_tree(params: Dict):
    """Optimizer label pytree: 'spatial' for grids, 'network' for the rest.

    Mirrors the two LR groups of get_optparam_groups (tensoRF.py:166-172):
    planes/lines at lr_init, basis matrix + shading MLP at lr_basis.
    """
    def label_for(key):
        if "plane" in key or "line" in key:
            return "spatial"
        return "network"

    return {
        k: jax.tree.map(lambda _: label_for(k), v)
        for k, v in params.items()
    }
