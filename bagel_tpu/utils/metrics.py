"""Throughput accounting: analytic FLOPs model + MFU (SURVEY §5.1).

Mirrors the reference's qwen2_flop_coefficients / detect_peak_tflops
(pretrain_unified_navit.py:46-95) with TPU peak tables, and exposes a
jax.profiler trace helper — the observability layer the reference lacks.
"""

from __future__ import annotations

import contextlib
import logging
import sys
import time
from typing import Optional

import jax

from bagel_tpu.configs import Qwen2Config

# bf16 dense peak TFLOP/s per chip
TPU_PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5e": 197.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,  # trillium
    "cpu": 1.0,
}


def detect_peak_tflops() -> float:
    kind = jax.devices()[0].device_kind
    for name, tf in TPU_PEAK_TFLOPS.items():
        if name.lower() in kind.lower():
            return tf
    return TPU_PEAK_TFLOPS.get(jax.devices()[0].platform, 100.0)


def qwen2_flop_coefficients(cfg: Qwen2Config, mot: bool = True):
    """(flops_per_token, flops_per_seqlen_sq) for one fwd+bwd pass.

    dense: 6 * active params per token; attention: 12 * head_dim * heads *
    layers per seqlen^2 (the reference's coefficients,
    pretrain_unified_navit.py:46-65). MoT runs both experts densely in
    training, doubling the dense term.
    """
    d, f, L, v = (
        cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers,
        cfg.vocab_size,
    )
    hd = cfg.head_dim
    qd = cfg.num_attention_heads * hd
    kvd = cfg.num_key_value_heads * hd
    per_layer = d * (qd + 2 * kvd) + qd * d + 3 * d * f
    if mot:
        per_layer *= 2
    dense = 6 * (L * per_layer + 2 * v * d)
    attn = 12 * hd * cfg.num_attention_heads * L
    return dense, attn


class ThroughputMeter:
    """Windowed tokens/s + MFU (pretrain_unified_navit.py:737-785)."""

    def __init__(self, cfg: Qwen2Config, n_chips: int = 1, mot: bool = True):
        self.dense_c, self.attn_c = qwen2_flop_coefficients(cfg, mot)
        self.peak = detect_peak_tflops() * n_chips * 1e12
        self.reset()

    def reset(self):
        self.tokens = 0
        self.seqlen_sq = 0
        self.t0 = time.perf_counter()

    def update(self, num_tokens: int, sample_lens=None):
        self.tokens += num_tokens
        if sample_lens is not None:
            self.seqlen_sq += sum(l * l for l in sample_lens)

    def window(self) -> dict:
        elapsed = max(time.perf_counter() - self.t0, 1e-6)
        flops = self.dense_c * self.tokens + self.attn_c * self.seqlen_sq
        return dict(
            tokens_per_sec=self.tokens / elapsed,
            actual_tflops=flops / elapsed / 1e12,
            mfu=(flops / elapsed) / self.peak,
            elapsed=elapsed,
        )


def make_logger(name: str = "bagel_tpu", log_file: Optional[str] = None,
                rank: int = 0) -> logging.Logger:
    """rank-0 file+stdout logger (train_utils.py:8-26 equivalent)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    if rank == 0:
        fmt = logging.Formatter("[%(asctime)s] %(message)s")
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_file:
            fh = logging.FileHandler(log_file)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    else:
        logger.addHandler(logging.NullHandler())
    return logger


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
