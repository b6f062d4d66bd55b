from ucnerf_tpu.render.renderer import (gen_dir_feature, gen_pts_feats,
                                        render_rays, render_image_chunked)
