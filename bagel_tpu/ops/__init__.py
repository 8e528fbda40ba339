from bagel_tpu.ops.attention import (
    cache_block_mask,
    dot_attention,
    mask_to_bias,
    segment_mask,
    train_packed_mask,
)
from bagel_tpu.ops.embeds import (
    flattened_position_ids_extrapolate,
    flattened_position_ids_interpolate,
    sincos_2d_grid,
    timestep_embedding,
)
from bagel_tpu.ops.norms import group_norm, layer_norm, rms_norm
from bagel_tpu.ops.rope import (
    apply_rope,
    apply_rope_2d,
    rope_2d_tables,
    rope_cos_sin,
)

__all__ = [
    "cache_block_mask",
    "dot_attention",
    "mask_to_bias",
    "segment_mask",
    "train_packed_mask",
    "flattened_position_ids_extrapolate",
    "flattened_position_ids_interpolate",
    "sincos_2d_grid",
    "timestep_embedding",
    "group_norm",
    "layer_norm",
    "rms_norm",
    "apply_rope",
    "apply_rope_2d",
    "rope_2d_tables",
    "rope_cos_sin",
]
