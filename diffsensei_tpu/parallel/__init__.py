from diffsensei_tpu.parallel.mesh import (
    MeshSpec,
    make_mesh,
    shard_batch,
    shard_params,
    unet_param_sharding_rules,
    llm_param_sharding_rules,
)
