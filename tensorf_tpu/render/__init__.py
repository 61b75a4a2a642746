from .volume import render_rays, feature2density, normalize_coord, RenderOutput
from .chunked import make_render_fn, render_chunked
from .culling import (
    compute_alpha_grid,
    update_alpha_mask,
    filter_rays_bbox,
    filter_rays_alpha,
)
