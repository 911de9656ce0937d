from diffsensei_tpu.ops.masked_ip import (
    build_ip_attention_bias,
    rasterize_dialog_embedding,
    seq_len_to_hw,
)
from diffsensei_tpu.ops.attention import attention_ref, multi_head_attention
from diffsensei_tpu.ops.flash_attention import flash_attention
from diffsensei_tpu.ops.groupnorm import groupnorm_silu
