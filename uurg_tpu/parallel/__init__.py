from uurg_tpu.parallel.mesh import (
    make_mesh,
    parse_mesh_spec,
    batch_sharding,
    replicate,
    shard_params_fsdp,
    shard_batch,
    tp_param_specs,
    shard_params_tp,
    DIT_TP_RULES,
    SD_TP_RULES,
)
from uurg_tpu.parallel.pipeline import (
    dit_apply_pipelined,
    pipeline_blocks,
    shard_params_pp,
)
from uurg_tpu.parallel.sequence import ring_attention, sequence_parallel
