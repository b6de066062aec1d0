from attention_models_tpu.parallel.mesh import (
    create_mesh,
    batch_sharding,
    replicated_sharding,
    runtime_init,
)
from attention_models_tpu.parallel.pipeline import (
    ambient_pp_mesh,
    pipeline_apply,
)
from attention_models_tpu.parallel.sharding import (
    DEFAULT_PARAM_RULES,
    param_shardings,
    shard_pytree,
)
