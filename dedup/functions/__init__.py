from dedup.functions.normalize import normalize_text_col, transform_title
from dedup.functions.shingle import char_ngrams_col, words_col
from dedup.functions.similarity import (
    deletion_ratio_col,
    levenshtein_ratio_pairs,
    staged_levenshtein_ratio_col,
    token_sort_col,
)
from dedup.functions.sketch import minhash_signature_udf, band_hashes_col, simhash_udf

__all__ = [
    "normalize_text_col",
    "transform_title",
    "char_ngrams_col",
    "words_col",
    "deletion_ratio_col",
    "levenshtein_ratio_pairs",
    "staged_levenshtein_ratio_col",
    "token_sort_col",
    "minhash_signature_udf",
    "band_hashes_col",
    "simhash_udf",
]
