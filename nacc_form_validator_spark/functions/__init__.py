"""Vectorized payload stages (the recast ``function``-rule registry).

The reference dispatches named functions per record
(/root/reference/nacc_form_validator/nacc_validator.py:947-978); here each
registered stage is a vectorized Column expression or Arrow pandas UDF
applied to whole DataFrames.
"""

from nacc_form_validator_spark.functions.heuristics import (GOPHER_RULES,
                                                            doc_stats,
                                                            gopher_sql,
                                                            packed_word_fold,
                                                            with_doc_stats)
from nacc_form_validator_spark.functions.extract import (extract_text,
                                                         extract_text_sql,
                                                         with_extracted_text)
from nacc_form_validator_spark.functions.langid import (langid_expr,
                                                        langid_sql,
                                                        make_langid_udf)
from nacc_form_validator_spark.functions.perplexity import (
    make_ppl_bigram_udf, ppl_bigram_py, ppl_unigram_expr, ppl_unigram_sql)
from nacc_form_validator_spark.functions.scrub import (scrub_expr, scrub_hits,
                                                       scrub_sql, with_scrub)
from nacc_form_validator_spark.functions.urlfilter import (domain_key,
                                                           url_host,
                                                           with_url_filter)

__all__ = [
    "GOPHER_RULES", "doc_stats", "gopher_sql", "packed_word_fold",
    "with_doc_stats",
    "extract_text", "extract_text_sql", "with_extracted_text",
    "langid_expr", "langid_sql", "make_langid_udf",
    "make_ppl_bigram_udf", "ppl_bigram_py", "ppl_unigram_expr",
    "ppl_unigram_sql", "scrub_expr", "scrub_hits", "scrub_sql", "with_scrub",
    "domain_key", "url_host", "with_url_filter",
]
