"""spark-transcript-dedup: a from-scratch PySpark-native near-duplicate
detection + clustering engine for multi-turn conversation transcripts.

Capabilities rebuilt from mhaseebtariq/doppel-speller (see SURVEY.md):
staged exact -> candidate-generation -> verification matching, re-expressed
as Spark DataFrame plans (MinHash+LSH candidate join, exact-Jaccard +
banded-Levenshtein verification, large-star/small-star connected-components
clustering).
"""

from dedup.config import DedupConfig
from dedup.session import get_spark

__all__ = ["DedupConfig", "get_spark"]
__version__ = "0.1.0"
