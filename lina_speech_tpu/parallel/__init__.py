from lina_speech_tpu.parallel.mesh import make_mesh, MeshConfig
from lina_speech_tpu.parallel.sharding import (
    DEFAULT_PARAM_RULES,
    param_shardings,
    shard_params,
    shard_batch,
)
