from ucnerf_tpu.eval.metrics import (psnr, ssim, depth_metrics,
                                     rgb_evaluation, depth_evaluation)
