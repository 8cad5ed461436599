"""Word2Vec-model synonym expansion
(`analysis/common/.../synonym/word2vec/Word2VecModel.java`,
`Word2VecSynonymProvider.java:41-105`, `Word2VecSynonymFilter.java`,
`Word2VecSynonymFilterFactory.java:41-72`).

The model stores L2-NORMALIZED term vectors (TermAndVector.normalizeVector);
synonyms for a term are its nearest neighbours under Lucene's DOT_PRODUCT
similarity score ``(1 + dot) / 2``, capped at `max_synonyms_per_term`
(default 5) and filtered at `min_accepted_similarity` (default 0.8),
self-match removed, descending similarity — the returned boost IS the
similarity (TermAndBoost).

The reference searches an HNSW graph over the model; vocabulary-sized
models here use one vectorized matmul per DISTINCT token (exact top-k —
the model is per-worker actor state, bounded by the embedding vocabulary,
not the corpus; the HNSW path exists in `index/hnsw.py` for corpus-scale
vectors).  Models load once per process from an `.npz` (terms + float32
matrix) — the Dl4j zip reader is out of scope in this container, so
`save`/`load` define the interchange format."""

from __future__ import annotations

import numpy as np

DEFAULT_MAX_SYNONYMS_PER_TERM = 5
DEFAULT_MIN_ACCEPTED_SIMILARITY = 0.8


class Word2VecModel:
    def __init__(self):
        self._terms: list[str] = []
        self._rows: list[np.ndarray] = []
        self._index: dict[str, int] = {}
        self._matrix: np.ndarray | None = None

    def add_term_and_vector(self, term: str, vector) -> None:
        """Vectors are L2-normalized on ingest (TermAndVector
        .normalizeVector) so DOT_PRODUCT similarity is cosine-scaled."""
        v = np.asarray(vector, dtype=np.float32)
        n = float(np.linalg.norm(v))
        if n > 0:
            v = v / np.float32(n)
        self._index[term] = len(self._terms)
        self._terms.append(term)
        self._rows.append(v)
        self._matrix = None

    def vector_value(self, term: str) -> np.ndarray | None:
        i = self._index.get(term)
        return self._rows[i] if i is not None else None

    @property
    def terms(self) -> list[str]:
        return self._terms

    @property
    def matrix(self) -> np.ndarray:
        if self._matrix is None:
            self._matrix = (np.stack(self._rows) if self._rows
                            else np.zeros((0, 0), dtype=np.float32))
        return self._matrix

    def __len__(self) -> int:
        return len(self._terms)

    def save(self, path: str) -> None:
        np.savez_compressed(path,
                            terms=np.array(self._terms, dtype=object),
                            matrix=self.matrix)

    @classmethod
    def load(cls, path: str) -> "Word2VecModel":
        data = np.load(path, allow_pickle=True)
        m = cls()
        for term, row in zip(data["terms"].tolist(), data["matrix"]):
            # rows were normalized before save; adding re-normalizes (no-op)
            m.add_term_and_vector(str(term), row)
        return m


class Word2VecSynonymProvider:
    """Exact top-k DOT_PRODUCT neighbours (`Word2VecSynonymProvider
    .getSynonyms`): k+1 searched (the term is its own nearest neighbour),
    self removed, `similarity >= min_accepted_similarity` kept,
    descending-similarity order, boost = similarity."""

    def __init__(self, model: Word2VecModel):
        self.model = model

    def get_synonyms(self, term: str,
                     max_synonyms_per_term: int = DEFAULT_MAX_SYNONYMS_PER_TERM,
                     min_accepted_similarity: float =
                     DEFAULT_MIN_ACCEPTED_SIMILARITY
                     ) -> list[tuple[str, float]]:
        if term is None:
            raise ValueError("Term must not be null")
        q = self.model.vector_value(term)
        if q is None or not len(self.model):
            return []
        sims = (1.0 + self.model.matrix @ q.astype(np.float32)) / 2.0
        k = min(max_synonyms_per_term + 1, len(sims))
        top = np.argpartition(-sims, k - 1)[:k]
        top = top[np.argsort(-sims[top], kind="stable")]
        out = []
        for i in top:
            syn = self.model.terms[int(i)]
            s = float(np.float32(sims[int(i)]))
            if syn != term and s >= min_accepted_similarity:
                out.append((syn, s))
        return out


_MODEL_CACHE: dict[str, Word2VecSynonymProvider] = {}


def provider_from_file(path: str) -> Word2VecSynonymProvider:
    """Per-process provider cache — the filter's model loads once per
    worker (actor `__init__` pattern), never per batch."""
    p = _MODEL_CACHE.get(path)
    if p is None:
        p = _MODEL_CACHE[path] = Word2VecSynonymProvider(
            Word2VecModel.load(path))
    return p


def expand_tokens(tokens, path: str,
                  max_synonyms_per_term: int = DEFAULT_MAX_SYNONYMS_PER_TERM,
                  min_accepted_similarity: float =
                  DEFAULT_MIN_ACCEPTED_SIMILARITY):
    """Word2VecSynonymFilter semantics over a flat token array: for each
    DISTINCT token, its accepted synonyms (computed once via the provider,
    then scattered) — returns {token: [synonym, ...]} for the chain stage
    to overlay at posInc 0."""
    provider = provider_from_file(path)
    out = {}
    for t in set(tokens):
        syns = provider.get_synonyms(t, max_synonyms_per_term,
                                     min_accepted_similarity)
        if syns:
            out[t] = [s for s, _ in syns]
    return out
