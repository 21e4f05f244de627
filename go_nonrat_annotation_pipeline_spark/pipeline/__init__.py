"""End-to-end annotation pipeline (reference parity layer).

Re-expresses the reference's fixed dataflow DAG — GAF scan → QC joins →
WITH_INFO consolidation → duplicate merge → FULL_ANNOT upsert → stale
delete — as composable DataFrame operators (SURVEY.md §3.2/§3.3, §7.3).
"""
