"""Engine operators: small pure functions, DataFrame in → DataFrame out.

Each module maps to a SURVEY.md §2 operator family:

- clean.py      §2.2/§2.4/§2.7 — dedup, dropna, filters, null profiling
- derive.py     §2.2/§2.8 — derived columns, availability-time derivations
- joins.py      §2.3 — left equi/as-of joins, spatial nearest-neighbor
- agg.py        §2.4 — dynamic group-by averages, profiling counts
- upsert.py     §2.9 — generic SCD-1 merge with source sync
- window.py     §2.11 — window/top-k per group, latest-per-key
- dedup.py      §2.11 — exact + MinHash/SimHash/Jaccard/embedding near-dup
- simsearch.py  §2.11 — embedding similarity search (brute force + LSH)
- text.py       §2.11 — language-ID, quality scoring, tokens, fingerprints
- multimodal.py §2.11 — binary-payload plumbing (decode stubs)
"""
