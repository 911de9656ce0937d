from diffsensei_tpu.ops.masked_ip import (
    build_ip_attention_bias,
    rasterize_dialog_embedding,
    seq_len_to_hw,
)
from diffsensei_tpu.ops.attention import attention_ref, multi_head_attention
# NOTE: the flash_attention/groupnorm functions are NOT re-exported here —
# binding them would shadow their submodules of the same name
# (`from diffsensei_tpu.ops import flash_attention` must stay the module).
from diffsensei_tpu.ops.flash_attention import flash_attention as fused_attention
from diffsensei_tpu.ops.groupnorm import groupnorm_silu as fused_groupnorm_silu
