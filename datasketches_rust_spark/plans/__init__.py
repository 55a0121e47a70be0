"""Planning layer.

Intentionally thin: the engine declares everything at the DataFrame /
SQL level and lets Catalyst + AQE own logical/physical planning —
column pruning, predicate/partition pushdown, broadcast selection,
skew-join splitting (SURVEY.md §4). No custom Catalyst rules or
strategies exist because none were needed; the places where the
DEFAULT physical plan was wrong at scale are handled as explicit
dataflow topology instead:

* hot-bucket stratification before bucket aggregation
  (`operators/lsh.py`),
* direct-read file scheduling for binary payloads
  (`operators/signatures.py::signatures_direct`),
* fused multi-family banding (`operators/dedup.py`),
* measured session conf (`session.py::ENGINE_CONF`).

Snapshots of the resulting physical plans, with review notes, are in
the repo-root PLANS.md (regenerate via tools/explain_plans.py).
"""
