from bagel_tpu.models.qwen2 import (
    KVCache,
    decode_text,
    embed_tokens,
    init_qwen2_params,
    kv_cache_init,
    llm_extend,
    llm_forward_train,
    lm_logits,
)
from bagel_tpu.models.siglip import init_siglip_params, siglip_encode
from bagel_tpu.models.vae import init_vae_params, vae_decode, vae_encode
from bagel_tpu.models.bagel import (
    PackedTrainBatch,
    bagel_forward_train,
    cfg_combine,
    init_bagel_params,
    patchify_latent,
    shifted_timesteps,
    unpatchify_latent,
)

__all__ = [
    "KVCache", "decode_text", "embed_tokens", "init_qwen2_params",
    "kv_cache_init", "llm_extend", "llm_forward_train", "lm_logits",
    "init_siglip_params", "siglip_encode",
    "init_vae_params", "vae_decode", "vae_encode",
    "PackedTrainBatch", "bagel_forward_train", "cfg_combine",
    "init_bagel_params", "patchify_latent", "shifted_timesteps",
    "unpatchify_latent",
]
