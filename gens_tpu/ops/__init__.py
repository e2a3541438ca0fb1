from gens_tpu.ops.interp import (
    bilerp,
    bilerp_nchw_grid,
    trilerp,
    nearest3d,
    lookup_volume_cascade,
    lookup_mask_cascade,
)
