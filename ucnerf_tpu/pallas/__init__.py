from ucnerf_tpu.pallas.mlp_kernel import (fused_nerf_mlp, pack_mlp_weights,
                                          pallas_supported)
