"""Real Qwen2 BPE tokenizer path (data/tokenizer.py).

The reference vendors the HF Qwen2 tokenizer (modeling/qwen2/
tokenization_qwen2.py) and registers BAGEL's four special tokens via
data_utils.add_special_tokens:130-165. We delegate the BPE itself to
`transformers` but own the registration protocol; these tests run the REAL
Qwen2Tokenizer class over a constructed byte-level BPE vocab (no network),
so the delegated path is exercised end to end, not mocked.
"""

import json
import os

import pytest

transformers = pytest.importorskip("transformers")

from bagel_tpu.data.tokenizer import (  # noqa: E402
    SPECIAL_TOKENS,
    add_special_tokens,
    load_tokenizer,
)


@pytest.fixture(scope="module")
def qwen2_dir(tmp_path_factory):
    """A tiny but real Qwen2 byte-level BPE checkpoint dir."""
    from transformers import Qwen2Tokenizer
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    td = tmp_path_factory.mktemp("qwen2_tok")
    vocab = {c: i for i, c in enumerate(bytes_to_unicode().values())}
    n = len(vocab)
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
              ("c", "a"), ("ca", "t")]
    for a, b in merges:
        vocab[a + b] = n
        n += 1
    vocab["<|endoftext|>"] = n
    (td / "vocab.json").write_text(json.dumps(vocab))
    (td / "merges.txt").write_text(
        "#version: 0.2\n" + "".join(f"{a} {b}\n" for a, b in merges)
    )
    tok = Qwen2Tokenizer(str(td / "vocab.json"), str(td / "merges.txt"))
    tok.save_pretrained(str(td))
    return str(td)


def test_load_and_register(qwen2_dir):
    tok, ids, num_new = load_tokenizer(qwen2_dir)
    # all four BAGEL specials registered, appended at the end of the vocab
    assert num_new == 4
    assert sorted(ids.values()) == list(
        range(len(tok) - 4, len(tok))
    )
    assert ids["bos_token_id"] == tok.convert_tokens_to_ids("<|im_start|>")
    assert ids["start_of_image"] == tok.convert_tokens_to_ids("<|vision_start|>")


def test_specials_are_atomic(qwen2_dir):
    """Special tokens must encode to single ids (reference protocol: the
    packer emits exactly one <|vision_start|> id before image splits)."""
    tok, ids, _ = load_tokenizer(qwen2_dir)
    enc = tok.encode("<|vision_start|>hello<|vision_end|>")
    assert enc[0] == ids["start_of_image"]
    assert enc[-1] == ids["end_of_image"]
    assert len(enc) == 3  # hello merged to one id by the BPE merges


def test_bpe_roundtrip(qwen2_dir):
    tok, _, _ = load_tokenizer(qwen2_dir)
    for text in ("hello hello", "a cat", "hello, cat!"):
        assert tok.decode(tok.encode(text)) == text


def test_registration_idempotent(qwen2_dir):
    """Re-registering on a tokenizer that already has the specials must add
    zero tokens and return the same ids (resume path: the driver reloads the
    tokenizer and must not grow the vocab past the trained embedding)."""
    tok, ids1, _ = load_tokenizer(qwen2_dir)
    tok2, ids2, num_new = add_special_tokens(tok)
    assert num_new == 0
    assert ids1 == ids2


def test_autoload_preserves_added_tokens(qwen2_dir, tmp_path):
    """save_pretrained -> AutoTokenizer round trip keeps the registered
    specials at their ids (checkpoint save/resume parity)."""
    tok, ids, _ = load_tokenizer(qwen2_dir)
    out = tmp_path / "saved"
    tok.save_pretrained(str(out))
    from transformers import AutoTokenizer

    tok2 = AutoTokenizer.from_pretrained(str(out))
    for name, tid in ids.items():
        token = {
            "bos_token_id": "<|im_start|>",
            "eos_token_id": "<|im_end|>",
            "start_of_image": "<|vision_start|>",
            "end_of_image": "<|vision_end|>",
        }[name]
        assert tok2.convert_tokens_to_ids(token) == tid
