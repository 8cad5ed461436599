"""Pure per-record / per-batch functions (analysis, scoring, hashing)."""

from ..analysis.standard import analyze, fast_tokens, jdk_lower, scan, tokenize_column  # noqa: F401
from ..pipelines.dedup import jaccard, minhash_signature, shingles, simhash64  # noqa: F401
from ..search.similarity import BM25Scorer, BM25Similarity  # noqa: F401
from ..util.smallfloat import byte4_to_int, int_to_byte4  # noqa: F401
