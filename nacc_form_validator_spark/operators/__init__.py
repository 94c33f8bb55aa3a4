"""Corpus-level operators: dedup, similarity search, text stats, multimodal."""

from nacc_form_validator_spark.operators.dedup import (connected_components,
                                                       dedup_components,
                                                       embedding_neardup_pairs,
                                                       exact_dedup,
                                                       minhash_lsh_pairs,
                                                       minhash_signature,
                                                       ngram_jaccard_pairs,
                                                       lsh_band_plan,
                                                       simhash,
                                                       simhash_band_plan,
                                                       simhash_pairs,
                                                       with_simhash_bands)
from nacc_form_validator_spark.operators.simsearch import (brute_force_topk,
                                                           cosine, lsh_topk)
from nacc_form_validator_spark.operators.textstats import (bpeish_token_count,
                                                           fingerprint,
                                                           quality_score,
                                                           whitespace_token_count)

__all__ = [
    "connected_components", "dedup_components",
    "embedding_neardup_pairs", "exact_dedup", "minhash_lsh_pairs",
    "minhash_signature", "ngram_jaccard_pairs", "simhash", "simhash_pairs",
    "simhash_band_plan", "lsh_band_plan", "with_simhash_bands",
    "brute_force_topk", "cosine", "lsh_topk", "bpeish_token_count",
    "fingerprint", "quality_score", "whitespace_token_count",
]
