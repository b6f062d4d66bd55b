from ucnerf_tpu.models.nerf import BaseAdaptRenderer, UCNeRFMLP
from ucnerf_tpu.models.mvs import CascadeMVSNet
from ucnerf_tpu.models.factory import create_models, init_params
