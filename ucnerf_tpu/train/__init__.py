from ucnerf_tpu.train.losses import (img2mse, mse2psnr, cas_mvsnet_loss,
                                     edge_preserving_smoothness,
                                     gradient_scaleinv_loss, total_loss)
