from ucnerf_tpu.parallel.mesh import make_mesh, scene_batch_sharding
from ucnerf_tpu.parallel.sharding import make_parallel_train_step, stack_batches
