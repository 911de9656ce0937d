from diffsensei_tpu.ops.masked_ip import (
    build_ip_attention_bias,
    rasterize_dialog_embedding,
    seq_len_to_hw,
)
from diffsensei_tpu.ops.attention import multi_head_attention
