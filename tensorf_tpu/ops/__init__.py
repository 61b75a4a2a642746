from .grid_sample import (
    grid_sample_2d,
    grid_sample_1d,
    grid_sample_3d,
    make_footprint_2d,
    make_footprint_1d,
    footprint_sample_2d,
    footprint_sample_1d,
)
from .encoding import positional_encoding
from .sh import eval_sh_bases, eval_sh
from .render_math import raw2alpha, exclusive_transmittance
from .rays import (
    get_ray_directions,
    get_ray_directions_blender,
    get_rays,
    ndc_rays_blender,
    ndc_rays,
    aabb_intersect,
    sample_along_rays,
    sample_along_rays_ndc,
)
from .freq_mask import freq_reg_mask, free_masks, FreeMasks
from .resize import resize_bilinear_align_corners, resize_linear_align_corners
