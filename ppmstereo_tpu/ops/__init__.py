from ppmstereo_tpu.ops.geometry import (
    adaptive_max_pool2d,
    avg_pool2d,
    coords_grid_x,
    interp_ac_false,
    interp_bilinear,
    upsample2x_nearest,
)
from ppmstereo_tpu.ops.padding import InputPadder
from ppmstereo_tpu.ops.corr import build_corr_pyramid, corr_lookup
from ppmstereo_tpu.ops.upsample import convex_upsample_2d, convex_upsample_3d
