from ucnerf_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d
from ucnerf_tpu.ops.interpolate import (resize_bilinear, resize_trilinear,
                                        resize_nearest, upsample2x_nearest)
from ucnerf_tpu.ops.pe import positional_encoding, pe_dim
from ucnerf_tpu.ops.warp import homo_warp
from ucnerf_tpu.ops.ndc import world_to_ref_ndc, project_to_pixel
from ucnerf_tpu.ops.composite import raw2alpha, raw2outputs, depth2dist
from ucnerf_tpu.ops.sampling import (sample_pdf, stage_depth_candidates,
                                     stratified_jitter, sample_points_uniform)
from ucnerf_tpu.ops.rays import (ray_dirs_from_pixels, gumbel_topk_sample,
                                 build_train_rays, build_test_rays)
