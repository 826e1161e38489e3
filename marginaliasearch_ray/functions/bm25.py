"""BM25 scoring math — numerically identical to the reference.

Reference: code/index/java/nu/marginalia/index/results/Bm25GraphVisitor.java
  :12    AVG_LENGTH = 5000
  :57-59 invFreq(N, n)  = ln(1 + (N - n + 0.5) / (n + 0.5))
  :66-70 f(count, len)  = count*(k1+1) / (count + k1*(1 - b + b*len/AVG_LENGTH))
Defaults k1 = 1.2, b = 0.5 from PrototypeRankingParameters.java:11-13
(code/functions/search-query/api/java/nu/marginalia/api/searchquery/model/
results/PrototypeRankingParameters.java).

All float64, vectorized over candidate arrays.
"""

from __future__ import annotations

import numpy as np

AVG_LENGTH = 5000.0
K1 = 1.2
B = 0.5


def idf(doc_count: int, doc_freq) -> np.ndarray:
    """invFreq — Bm25GraphVisitor.java:57-59."""
    n = np.asarray(doc_freq, dtype=np.float64)
    return np.log(1.0 + (doc_count - n + 0.5) / (n + 0.5))


def tf_saturation(count, length, k1: float = K1, b: float = B) -> np.ndarray:
    """f — Bm25GraphVisitor.java:66-70."""
    c = np.asarray(count, dtype=np.float64)
    length_ratio = np.asarray(length, dtype=np.float64) / AVG_LENGTH
    return (c * (k1 + 1.0)) / (c + k1 * (1.0 - b + b * length_ratio))


def bm25_term_score(doc_count: int, doc_freq, count, length,
                    k1: float = K1, b: float = B) -> np.ndarray:
    return idf(doc_count, doc_freq) * tf_saturation(count, length, k1, b)


def sql_bm25_term_expr(tf: str, df: str, n_docs: str, doc_len: str,
                       k1: float = K1, b: float = B) -> str:
    """DuckDB expression mirroring bm25_term_score exactly (float64)."""
    return (
        f"ln(1.0 + ({n_docs} - {df} + 0.5) / ({df} + 0.5))"
        f" * ({tf} * ({k1} + 1.0))"
        f" / ({tf} + {k1} * (1.0 - {b} + {b} * {doc_len} / {AVG_LENGTH}))"
    )
