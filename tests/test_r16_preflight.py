"""r16 registration pre-flight (VERDICT r14 #6): the r19+r20 cohorts
must be mechanically registrable next round. The four r14
double-emitting faces tripped schema-lint only AFTER registration;
this dry-run pins the checklist facts now so r16's draft→@query flip
is a no-surprise move:

- no draft id collides with the registered set;
- every draft carries a non-empty module-map oracle (so the
  registered face lands in registry.ORACLES by construction — no
  post-hoc mirroring like dedup-lsh-recall-audit needed);
- the ONE face that emits a double column is known by name
  (graph-assortativity → ('assortativity',), a final per-row IEEE
  close over exact integer degree sums) and is the only
  DOUBLE_FACE_ALLOWLIST entry r16 must add — derived live at
  sf0.001 in the dry-run session this test records, and re-derived
  by test_schema_lint the moment the cohort registers.

The r16 window after the flip: the 20 new faces + the 30
alphabetically-first remaining r8-stale ids (41 remain after r15
took agg-corr-matrix .. agg-vector-mean), registry at the terminal
399; bench.py needs no touch (it imports __spark_entry__, pinned by
test_bench_sees_full_registry's mechanism assertions).
"""

from __future__ import annotations

from medallion_delta_lake_spark.plans import queries_r19 as r19
from medallion_delta_lake_spark.plans import queries_r20 as r20
from medallion_delta_lake_spark.plans import registry


def test_r19_r20_flip_is_mechanical():
    drafts = {**r19.R19_QUERIES, **r20.R20_QUERIES}
    oracles = {**r19.R19_ORACLES, **r20.R20_ORACLES}
    assert len(drafts) == 20 == len(oracles)
    assert not (set(drafts) & set(registry.QUERIES)), (
        "draft ids collide with registered ids"
    )
    empty = [k for k, v in oracles.items() if not v.strip()]
    assert not empty, f"drafts without oracle SQL: {empty}"
    # the allowlist doesn't carry unregistered ids (stale-entry lint
    # would fire) — r16 adds graph-assortativity at registration time
    assert "graph-assortativity" not in registry.DOUBLE_FACE_ALLOWLIST
