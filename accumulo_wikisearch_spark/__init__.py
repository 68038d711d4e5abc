"""accumulo_wikisearch_spark — a PySpark-native document-search engine.

A from-scratch engine with the query and data-processing capabilities of
apache/accumulo-wikisearch (boolean fielded search over an inverted index,
two-tier posting lists, JEXL-subset query language), re-expressed as
idiomatic Spark DataFrame plans, plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

Reference semantics are cited throughout as ``file:line`` paths relative to
the reference checkout (read-only); no reference code is ported — only the
observable behavior is reproduced with DataFrame/SQL plans.
"""

from accumulo_wikisearch_spark.config import EngineConfig
from accumulo_wikisearch_spark.api import Wikisearch

__all__ = ["EngineConfig", "Wikisearch"]
__version__ = "0.1.0"
