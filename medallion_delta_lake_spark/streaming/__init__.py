"""Structured Streaming surface of the engine (SURVEY.md §2.11).

The reference's incrementality is batch re-run + MERGE; this module
supplies the true streaming equivalents: watermarked tumbling-window
aggregation, streaming dedup, and custom stateful processing via
``applyInPandasWithState``. Every streaming plan has a batch twin with
identical semantics so results are oracle-checkable.
"""
