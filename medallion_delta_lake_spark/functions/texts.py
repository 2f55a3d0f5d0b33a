"""Text expression helpers (tokenize / normalize / shingle).

Shared by the text-analysis and near-dup-dedup operators (SURVEY.md
§2.11). All native Catalyst expressions — the tokenizer is a split on
whitespace after normalization, deliberately simple and deterministic
so a SQL oracle can reproduce it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: Column | str) -> Column:
    """Lowercase, collapse whitespace runs, trim."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def tokenize(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize_text(col), " ")


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (array<string>, distinct, order-free).

    Built with transform over token indexes + array_distinct; stays in
    codegen. Documents shorter than ``n`` tokens yield the whole text
    as a single shingle so they still participate in dedup.
    """
    toks = tokenize(col)
    ngrams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.array_distinct(ngrams)
