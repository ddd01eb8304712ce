from .exact import exact_avg, exact_sum
from .hashing import char_shingles, stable_md5, word_shingles

__all__ = ["exact_sum", "exact_avg", "stable_md5", "char_shingles", "word_shingles"]
