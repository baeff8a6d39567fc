from .text import tokens, word_shingles, normalize_ws  # noqa: F401
from .vectors import dot, l2_norm, cosine              # noqa: F401
from .cpe import split_cpe23                           # noqa: F401
