"""Staging area for not-yet-registered round queries.

EMPTY again since round 11: all twelve round-10 staged operators
(quantile_sketch_events, weighted_quantiles_doclen, robust_stats_value,
countmin_trigram_freq, hll_distinct_trigrams, ngram_novelty_scores,
ann_sq8_rerank, bloom_semijoin_orders, phrase_top_bigram,
streaming_countmin, streaming_hll_distinct, streaming_adaptive_sample)
were promoted into ``plans/queries.py`` per the rotation playbook and
now live in the driver-verified registry. The module and the
``STAGED`` dict stay so tools (plan_audit/scale_check/oracle_check
``--staged``) resolve without special-casing rounds that stage
nothing.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from .queries import QueryFn, QuerySpec

STAGED: Dict[str, QuerySpec] = {}


def register_staged(
    name: str,
    oracle: Optional[str] = None,
    tags: Tuple[str, ...] = (),
    bench_fn: Optional[QueryFn] = None,
):
    def deco(fn: QueryFn) -> QueryFn:
        STAGED[name] = QuerySpec(name, fn, oracle, tags, bench_fn)
        return fn

    return deco
