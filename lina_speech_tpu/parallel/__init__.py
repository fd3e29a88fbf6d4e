from lina_speech_tpu.parallel.mesh import (
    ensure_virtual_cpu_devices,
    make_mesh,
    MeshConfig,
)
from lina_speech_tpu.parallel.multihost import (
    distributed_init,
    globalize_batch,
    make_multihost_mesh,
    process_batch_slice,
)
from lina_speech_tpu.parallel.sharding import (
    DEFAULT_PARAM_RULES,
    param_shardings,
    shard_params,
    shard_batch,
)
