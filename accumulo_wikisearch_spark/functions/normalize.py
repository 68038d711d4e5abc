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
no Python UDF in the hot path. The diacritics strip is full-Unicode while
remaining pure Catalyst: a static ``F.translate`` map of every BMP
precomposed character whose canonical decomposition strips to a single base
char (Latin-1 through Latin Extended Additional, Greek Extended, Cyrillic —
the same set ``LcNoDiacriticsNormalizer``'s NFD pass handles), followed by
a ``regexp_replace`` that removes free-standing combining marks (decomposed
input). Byte-identical to the Python twin ``normalize_str`` (NFD → strip
marks → NFC → lower) for all canonical single-base decompositions.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F


@lru_cache(maxsize=1)
def _accent_map() -> tuple[str, str]:
    """Translate map: precomposed char -> base char across the whole BMP
    (LcNoDiacriticsNormalizer.java:37-47 does the same strip via NFD),
    PLUS every free-standing combining mark appended to src with no dst
    counterpart — translate DELETES unmatched src chars, which strips
    decomposed input in the same single pass. One char-map lookup per
    char, fully inside whole-stage codegen; measurably cheaper than a
    regexp_replace over the text (which cost ~30% of index-build time)."""
    src = []
    dst = []
    for cp in range(0xC0, 0x10000):
        ch = chr(cp)
        decomp = unicodedata.normalize("NFD", ch)
        stripped = "".join(c for c in decomp if not unicodedata.combining(c))
        if stripped != ch and len(stripped) == 1:
            src.append(ch)
            dst.append(stripped)
    marks = [
        chr(cp) for cp in range(0x0300, 0x10000) if unicodedata.combining(chr(cp))
    ]
    return "".join(src) + "".join(marks), "".join(dst)


def normalize_col(col: Column | str) -> Column:
    """Spark-side LcNoDiacritics: strip diacritics then lowercase.

    Measured: the BMP-sized map does NOT dominate index build — a fresh
    session's first build pays ~5.5 s of whole-stage-codegen/JIT warm-up
    regardless of map size (warm rebuilds: ~2 s at sf0.1, map or no map),
    so no ASCII fast-path guard is warranted."""
    c = F.col(col) if isinstance(col, str) else col
    src, dst = _accent_map()
    return F.lower(F.translate(c, src, dst))


@lru_cache(maxsize=4096)
def normalize_str(value: str) -> str:
    """Python-side twin of :func:`normalize_col` for query literals."""
    decomp = unicodedata.normalize("NFD", value)
    stripped = "".join(c for c in decomp if not unicodedata.combining(c))
    return unicodedata.normalize("NFC", stripped).lower()


# Token split patterns by tokenizer mode:
# - "word" (the EngineConfig default): punctuation-aware word splitting
#   (letters+digits runs), the intent of the reference's Lucene
#   WikipediaTokenizer (WikipediaMapper.java:154-167, :226-234):
#   "abacus," and "abacus." index as the token "abacus". Digits kept;
#   underscores split.
# - "whitespace": runs of whitespace separate tokens — the compat mode.
#   On the all-lowercase-alnum synthetic corpus the two modes tokenize
#   identically, which keeps the DuckDB oracles valid under either.
# - "wiki": markup-aware — strip [[link]]/{{template}} syntax FIRST (see
#   strip_wiki_markup_col), then word-split. The closest match to what
#   Lucene's WikipediaTokenizer emits on real dump text, where
#   "[[United States|the US]]" should index "the us", not "united".
TOKEN_SPLIT_RE = r"\s+"
_SPLIT_BY_MODE = {
    "whitespace": TOKEN_SPLIT_RE,
    "word": r"[^\p{L}\p{N}]+",
    "wiki": r"[^\p{L}\p{N}]+",
}

# [[target]] → target; [[target|label]] → label (pipe trick: display text
# wins, matching how WikipediaTokenizer surfaces link text)
_WIKI_LINK_RE = r"\[\[(?:[^\[\]\|]*\|)?([^\[\]]*)\]\]"
_WIKI_TMPL_RE = r"\{\{[^{}]*\}\}"


def strip_wiki_markup_col(col: Column | str) -> Column:
    """Remove wiki markup before tokenization: ``{{templates}}`` deleted
    (innermost-first, 3 passes ≈ nesting depth 3 — deeper nests leave
    brace residue the word splitter then drops as punctuation) and
    ``[[target|label]]`` / ``[[target]]`` reduced to their display text.
    Pure ``regexp_replace`` chain — JVM-side, stays in codegen."""
    c = F.col(col) if isinstance(col, str) else col
    for _ in range(3):
        c = F.regexp_replace(c, _WIKI_TMPL_RE, " ")
    return F.regexp_replace(c, _WIKI_LINK_RE, "$1")


def tokenize_col(
    col: Column | str, distinct: bool = True, mode: str = "whitespace"
) -> Column:
    """Array of (distinct) normalized tokens of a text column."""
    c = F.col(col) if isinstance(col, str) else col
    if mode == "wiki":
        c = strip_wiki_markup_col(c)
    toks = F.split(normalize_col(c), _SPLIT_BY_MODE[mode])
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
