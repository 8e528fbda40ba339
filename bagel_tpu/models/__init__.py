from bagel_tpu.models.qwen2 import (
    KVCache,
    decode_text,
    embed_tokens,
    init_qwen2_params,
    kv_cache_init,
    llm_extend,
    lm_logits,
)

__all__ = [
    "KVCache",
    "decode_text",
    "embed_tokens",
    "init_qwen2_params",
    "kv_cache_init",
    "llm_extend",
    "lm_logits",
]
