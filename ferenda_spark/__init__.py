"""ferenda_spark — a from-scratch, PySpark-native knowledge-graph
construction engine with the document-to-Linked-Data capabilities of the
reference (mavteam/ferenda; see SURVEY.md §0 — reference tree empty at
survey time, spec authority is BASELINE.json north_rule/north_star).

Layout
------
- ``session``    : tuned SparkSession factory (AQE, Arrow, UTC, shuffle sizing)
- ``schemas``    : every table schema, fixed and explicit (SURVEY §1.2)
- ``sources``    : deterministic web-corpus generator + stage-table catalog
- ``functions``  : scalar/vectorized fns — HTML→text extract, text stats, URIs
- ``operators``  : parse (FSM+citations), entity linking, triple materialize,
                   rollups, graph joins, dedup, similarity, multimodal
- ``plans``      : the end-to-end pipeline DAG, ledger (checkpoint/resume),
                   per-partition lineage
- ``streaming``  : incremental ingest (Trigger.AvailableNow + foreachBatch)
"""

__version__ = "0.1.0"
