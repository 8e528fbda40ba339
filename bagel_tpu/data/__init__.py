from bagel_tpu.data.tokenizer import MockTokenizer, add_special_tokens, load_tokenizer

__all__ = ["MockTokenizer", "add_special_tokens", "load_tokenizer"]
