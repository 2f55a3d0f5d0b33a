"""Pipeline drivers (SURVEY.md §3 E1 / §7 Phase 6).

The reference's outermost entry point is an Airflow DAG chaining four
Dataproc jobs; the engine equivalent is plain Python functions per
layer (bronze → silver → gold) over the operator modules, runnable
standalone or wrapped by any orchestrator. State passes only through
persisted tables, so every layer is independently re-runnable — the
property the reference's dedup+MERGE design exists to provide.
"""
