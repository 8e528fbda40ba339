"""bagel-tpu: a TPU-native (JAX/XLA/Pallas) unified multimodal framework.

Capabilities mirror ByteDance-Seed/Bagel (BAGEL-7B-MoT): visual understanding
(SigLIP NaViT encode + Qwen2 MoT autoregressive decode), text-to-image
generation (CFG rectified-flow over FLUX-VAE latents), image editing and
interleaved think-mode sessions — rebuilt TPU-first rather than ported.
"""

__version__ = "0.2.0"

from bagel_tpu.configs import (
    BagelConfig,
    Qwen2Config,
    SiglipConfig,
    VAEConfig,
    tiny_bagel,
    tiny_qwen2,
    tiny_siglip,
    tiny_vae,
)

__all__ = [
    "BagelConfig",
    "Qwen2Config",
    "SiglipConfig",
    "VAEConfig",
    "tiny_bagel",
    "tiny_qwen2",
    "tiny_siglip",
    "tiny_vae",
]
