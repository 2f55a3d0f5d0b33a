"""Oracle-parity tests for the text-analysis / text-dedup query surface
(queries_text.py), run at sf0.001."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy battery: excluded from the fast default tier (pytest.ini)

from medallion_delta_lake_spark.plans import queries_text  # noqa: F401
from medallion_delta_lake_spark.plans.registry import ORACLES, QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle import compare_query

TEXT_IDS = sorted(
    n for n in QUERIES if n in ORACLES and n.startswith(("text-", "dedup-minhash",
                                                         "dedup-simhash",
                                                         "dedup-ngram",
                                                         "dedup-exact",
                                                         "dedup-paragraph",
                                                         "dedup-containment",
                                                         "mixture-"))
)


@pytest.mark.parametrize("name", TEXT_IDS)
def test_text_oracle_parity(spark, name):
    compare_query(spark, name, QUERIES, ORACLES, SF_SMOKE)


def test_scrub_pii_matches_python_re_on_adversarial_strings(spark):
    """Cross-dialect regression guard: the redaction patterns must
    behave identically under Java regex (Spark) and Python re on
    adversarial inputs — odd TLD lengths, digits flanking emails,
    5-vs-6 digit runs, multiple matches per line, unicode text."""
    import re

    from medallion_delta_lake_spark.operators.text_analysis import (
        EMAIL_PATTERN,
        LONG_NUMBER_PATTERN,
        scrub_pii,
    )

    texts = [
        "plain text no pii at all",
        "a@b.co x@y.museum weird%+-chars@sub.domain.org",
        "12345 not scrubbed, 123456 scrubbed, 1234567890123 too",
        "edge a@b.c single-letter tld should NOT match",
        "mixed u1@x.io then 9999999 then u2@y.de on one line",
        "unicode café 999999é888888 touches",
        "trailing dot v@w.com. and (paren@q.net)",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.scrubbed, r.n_emails, r.n_numbers)
        for r in scrub_pii(df).collect()
    }
    for i, t in enumerate(texts):
        after_email = re.sub(EMAIL_PATTERN, "<EMAIL>", t)
        expected = re.sub(LONG_NUMBER_PATTERN, "<NUM>", after_email)
        n_e = len(re.findall(EMAIL_PATTERN, t))
        n_n = len(re.findall(LONG_NUMBER_PATTERN, after_email))
        assert got[i] == (expected, n_e, n_n), (i, t, got[i])


def test_quality_calibrate_quartile_invariants(spark):
    """Per-source cutoffs: q25 is a real rubric value and at most a
    quarter of each source's docs fall strictly below it (type-1
    quantile guarantee)."""
    from medallion_delta_lake_spark.operators import text_analysis as ta
    from medallion_delta_lake_spark.plans.registry import table
    from tests.conftest import SF_SMOKE

    out = ta.quality_calibrate(table(spark, SF_SMOKE, "documents")).collect()
    assert out  # one row per source
    for r in out:
        assert r.q25 in (0, 25, 50, 75, 100)
        assert 0 <= r.n_below <= (r.n_docs - 1) // 4
