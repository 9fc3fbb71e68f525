"""Staging area for not-yet-registered round queries.

EMPTY since round 10: all nine round-9 staged operators
(kmv_source_overlap, kmv_overlap_matrix, streaming_kmv_distinct,
heavy_hitters_per_lang, hybrid_search_rrf3, streaming_ann_ingest,
ann_cosine_topk_ivfpq_residual, bpe_byte_level_encode,
containment_decontamination) were promoted into ``plans/queries.py``
per the rotation playbook and now live in the driver-verified
registry. The module and the ``STAGED`` dict stay so tools
(plan_audit/scale_check/oracle_check ``--staged``) resolve without
special-casing rounds that stage nothing.
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
