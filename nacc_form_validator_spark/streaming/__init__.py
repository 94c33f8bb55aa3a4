"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.7); this module lifts the same
compiled rule plans onto streams:

- :func:`stream_quality_filter` — stateless stages (cast, heuristics,
  langid, perplexity, per-field + cross-field rules, scrub) apply to a
  ``readStream`` source unchanged: one compiled plan serves batch and
  streaming (same Column expressions, no code fork);
- :func:`stateful_recrawl_monitor` — the longitudinal dimension
  (previous-visit rules) needs state on a stream; implemented with
  ``applyInPandasWithState`` keyed by url, holding the last crawl's
  summary per url (the streaming analogue of the window pass in
  history.py).

Streaming writes use availableNow/trigger semantics with checkpointing —
at scale the sink is the same bucketed decisions layout as batch.
"""

from nacc_form_validator_spark.streaming.pipeline import (
    stateful_recrawl_monitor, stream_quality_filter,
    windowed_metrics_stream)

__all__ = ["stream_quality_filter", "stateful_recrawl_monitor",
           "windowed_metrics_stream"]
