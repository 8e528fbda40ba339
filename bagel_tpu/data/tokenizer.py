"""Tokenizer plumbing.

Real checkpoints use the Qwen2 byte-level BPE tokenizer (the reference
vendors HF code at modeling/qwen2/tokenization_qwen2*.py); this framework
loads it with the NATIVE from-scratch implementation in data/bpe.py — no
`transformers` dependency on the data path (exact token-id parity is
pinned by tests/test_tokenizer.py). The special-token registration
mirrors data_utils.add_special_tokens:130-165. Tests use MockTokenizer
(no files needed).
"""

from __future__ import annotations

from typing import List, Tuple

SPECIAL_TOKENS = ["<|im_start|>", "<|im_end|>", "<|vision_start|>", "<|vision_end|>"]


def add_special_tokens(tokenizer) -> Tuple[object, dict, int]:
    """Register BAGEL's special tokens; returns (tokenizer, ids, n_added)."""
    existing = set()
    for v in tokenizer.special_tokens_map.values():
        if isinstance(v, str):
            existing.add(v)
        elif isinstance(v, list):
            existing.update(v)
    new_tokens = [t for t in SPECIAL_TOKENS if t not in existing]
    num_new = tokenizer.add_tokens(new_tokens)
    ids = dict(
        bos_token_id=tokenizer.convert_tokens_to_ids("<|im_start|>"),
        eos_token_id=tokenizer.convert_tokens_to_ids("<|im_end|>"),
        start_of_image=tokenizer.convert_tokens_to_ids("<|vision_start|>"),
        end_of_image=tokenizer.convert_tokens_to_ids("<|vision_end|>"),
    )
    return tokenizer, ids, num_new


def load_tokenizer(path: str):
    """Load the Qwen2 BPE tokenizer from a checkpoint dir with the native
    implementation (data/bpe.py) and register the BAGEL special tokens."""
    from bagel_tpu.data.bpe import ByteBPETokenizer

    tokenizer = ByteBPETokenizer.from_checkpoint(path)
    return add_special_tokens(tokenizer)


class MockTokenizer:
    """Deterministic hash tokenizer for tests: reversible for decode display.

    vocab layout: [0..n_text) hashed text ids, then 4 special ids.
    """

    def __init__(self, vocab_size: int = 512):
        self.vocab_size = vocab_size
        self._n_text = vocab_size - 4
        self.special = {
            "<|im_start|>": self._n_text,
            "<|im_end|>": self._n_text + 1,
            "<|vision_start|>": self._n_text + 2,
            "<|vision_end|>": self._n_text + 3,
        }

    def encode(self, text: str) -> List[int]:
        return [(ord(c) * 7 + 13) % self._n_text for c in text]

    def decode(self, ids) -> str:
        return " ".join(str(int(i)) for i in ids)

    @property
    def new_token_ids(self) -> dict:
        return dict(
            bos_token_id=self.special["<|im_start|>"],
            eos_token_id=self.special["<|im_end|>"],
            start_of_image=self.special["<|vision_start|>"],
            end_of_image=self.special["<|vision_end|>"],
        )
