from .text import normalize_tokens_expr, tokenize

__all__ = ["normalize_tokens_expr", "tokenize"]
