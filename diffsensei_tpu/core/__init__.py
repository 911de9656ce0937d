from diffsensei_tpu.core.buckets import SIZE_BUCKETS, get_bucket_size, snap_to_bucket
from diffsensei_tpu.core.config import (
    MangaConfig,
    ResamplerConfig,
    UNetConfig,
    VAEConfig,
    TextEncoderConfig,
    VisionEncoderConfig,
    PipelineConfig,
    load_yaml_config,
)
from diffsensei_tpu.core.dtypes import DTypePolicy
