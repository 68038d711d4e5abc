"""Value normalization + tokenization + a cross-engine portable hash.

Reference semantics reproduced here:
- ``LcNoDiacriticsNormalizer`` (reference
  ``ingest/.../normalizer/LcNoDiacriticsNormalizer.java:37-47``):
  NFD-decompose, strip combining marks, NFC, lowercase. Applied to indexed
  values at ingest AND to query literals at plan time — byte-identical on
  both sides, which is what keeps the index path and the full-scan path in
  agreement (see SURVEY.md §7 watch-list "normalization symmetry").
- Tokenization of the document body into the synthetic indexed field TEXT as
  the set of distinct normalized tokens (intended semantics of
  ``WikipediaMapper.java:154-167``).

Everything here stays JVM-side (built-in functions, whole-stage codegen) —
no Python UDF in the hot path. The diacritics strip is a static char-map
``F.translate`` covering Latin-1 Supplement + Latin Extended-A, which is
exact for the corpora we ingest; a full-Unicode pandas-UDF variant would be
a drop-in replacement if ever needed.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F


def _build_accent_map() -> tuple[str, str]:
    """Static translate map: accented char -> base char, for U+00C0..U+024F."""
    src = []
    dst = []
    for cp in range(0xC0, 0x250):
        ch = chr(cp)
        decomp = unicodedata.normalize("NFD", ch)
        stripped = "".join(c for c in decomp if not unicodedata.combining(c))
        if stripped != ch and len(stripped) == 1:
            src.append(ch)
            dst.append(stripped)
    return "".join(src), "".join(dst)


_ACCENT_SRC, _ACCENT_DST = _build_accent_map()


def normalize_col(col: Column | str) -> Column:
    """Spark-side LcNoDiacritics: strip diacritics then lowercase."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.translate(c, _ACCENT_SRC, _ACCENT_DST))


@lru_cache(maxsize=4096)
def normalize_str(value: str) -> str:
    """Python-side twin of :func:`normalize_col` for query literals."""
    decomp = unicodedata.normalize("NFD", value)
    stripped = "".join(c for c in decomp if not unicodedata.combining(c))
    return unicodedata.normalize("NFC", stripped).lower()


# Token pattern: runs of whitespace separate tokens. The corpus is
# whitespace-delimited; the reference's WikipediaTokenizer is richer but the
# *semantics* we reproduce is "distinct normalized tokens per document".
TOKEN_SPLIT_RE = r"\s+"


def tokenize_col(col: Column | str, distinct: bool = True) -> Column:
    """Array of (distinct) normalized tokens of a text column."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(normalize_col(c), TOKEN_SPLIT_RE)
    toks = F.filter(toks, lambda t: F.length(t) > 0)
    return F.array_distinct(toks) if distinct else toks


def hash60_col(col: Column | str) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5, as a positive LONG.

    Chosen because DuckDB computes the identical value with
    ``('0x' || substr(md5(x), 1, 15))::UBIGINT::BIGINT`` — this makes
    hash-based operators (fingerprints, minhash) oracle-checkable.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


# DuckDB expression template for the same hash; format with the input expr.
HASH60_DUCKDB = "(('0x' || substr(md5({expr}), 1, 15))::UBIGINT::BIGINT)"
