"""cross_doc_gram_coverage: exact substring-level duplication
coverage (Lee et al. 2022 shape). Hand-checked interval-union math,
cross-doc-only semantics, truncation bound, degenerate lengths."""

import pytest

# r13 test tiering (VERDICT r12 #2): this suite runs in the FULL tier
# (tools/round_close.py --full-tests); the default time-boxed tier
# excludes it so the driver's verification window completes.
pytestmark = pytest.mark.full

from owl_etl_spark.operators.dedup import cross_doc_gram_coverage


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in cross_doc_gram_coverage(df, **kw).collect()}


def test_shared_span_counted_at_every_offset(spark):
    # "abcdef" shared; 4-grams abcd/bcde/cdef duplicated at stride 1.
    out = _run(
        spark,
        [(1, "XXabcdefYY"), (2, "ZZZabcdefWW"), (3, "qqqrstuvwx")],
        gram_chars=4,
    )
    # doc 1: positions 3,4,5 duplicated -> union covers chars 3..8 = 6
    assert out[1]["n_grams"] == 7
    assert out[1]["n_dup_positions"] == 3
    assert out[1]["covered_chars"] == 6
    # doc 2: positions 4,5,6 -> also 6 chars
    assert out[2]["n_dup_positions"] == 3
    assert out[2]["covered_chars"] == 6
    # doc 3 shares nothing
    assert out[3]["n_dup_positions"] == 0 and out[3]["covered_chars"] == 0


def test_disjoint_islands_sum_without_overlap(spark):
    # two shared spans separated by unique filler: islands add up
    a = "abcd" + "11111" + "wxyz"
    b = "abcd" + "22222" + "wxyz"
    out = _run(spark, [(1, a), (2, b)], gram_chars=4)
    # each island is one duplicated position (exactly one 4-gram fits)
    assert out[1]["n_dup_positions"] == 2
    assert out[1]["covered_chars"] == 8


def test_intra_doc_repetition_alone_does_not_count(spark):
    out = _run(spark, [(1, "ababababab"), (2, "qrstuvwxyz")], gram_chars=4)
    assert out[1]["n_dup_positions"] == 0


def test_short_docs_and_truncation(spark):
    out = _run(
        spark,
        [(1, "abc"), (2, "0123456789abcdefgh"), (3, "0123456789ZZZZabcdefgh")],
        gram_chars=4,
        max_chars=10,
    )
    assert out[1]["n_grams"] == 0 and out[1]["covered_chars"] == 0
    # only the first 10 chars are analyzed: "0123456789" matches doc 3's
    # head; the "abcdefgh" tails are beyond max_chars and must NOT count
    assert out[2]["n_grams"] == 7
    assert out[2]["n_dup_positions"] == 7
    assert out[2]["covered_chars"] == 10
    assert out[3]["covered_chars"] == 10


def test_min_docs_threshold(spark):
    rows = [(1, "abcdXX"), (2, "abcdYY"), (3, "abcdZZ")]
    strict = _run(spark, rows, gram_chars=4, min_docs=3)
    assert strict[1]["n_dup_positions"] == 1  # abcd in all 3 docs
    stricter = _run(spark, rows, gram_chars=4, min_docs=4)
    assert stricter[1]["n_dup_positions"] == 0


def test_bad_params_rejected(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        cross_doc_gram_coverage(df, gram_chars=0)
    with pytest.raises(ValueError):
        cross_doc_gram_coverage(df, gram_chars=64, max_chars=32)


# ---------------------------------------------------------------------------
# remove_duplicated_spans: the action step (span merge + stitch)
# ---------------------------------------------------------------------------


def _run_remove(spark, rows, **kw):
    from owl_etl_spark.operators.dedup import remove_duplicated_spans

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in remove_duplicated_spans(df, **kw).collect()}


def test_remove_spans_stitches_clean_text(spark):
    out = _run_remove(
        spark,
        [(1, "XXabcdefYY"), (2, "ZZZabcdefWW"), (3, "qqqrstuvwx")],
        gram_chars=4,
    )
    assert out[1]["clean_text"] == "XXYY"
    assert out[1]["n_spans"] == 1 and out[1]["removed_chars"] == 6
    assert out[2]["clean_text"] == "ZZZWW"
    assert out[3]["clean_text"] == "qqqrstuvwx" and out[3]["n_spans"] == 0


def test_remove_spans_two_islands(spark):
    out = _run_remove(
        spark,
        [(5, "abcdQQQQQwxyzKK"), (6, "abcdPPPPPwxyzJJ")],
        gram_chars=4,
    )
    assert out[5]["clean_text"] == "QQQQQKK"
    assert out[5]["n_spans"] == 2 and out[5]["removed_chars"] == 8


def test_remove_spans_fully_duplicated_doc_empties(spark):
    out = _run_remove(spark, [(1, "abcdefgh"), (2, "abcdefgh")], gram_chars=4)
    assert out[1]["clean_text"] == "" and out[1]["removed_chars"] == 8
    assert out[1]["n_spans"] == 1


def test_remove_spans_matches_coverage_counts(spark):
    from owl_etl_spark.operators.dedup import cross_doc_gram_coverage

    rows = [
        (1, "aaaa bbbb cccc dddd"),
        (2, "bbbb cccc xxxx yyyy"),
        (3, "dddd aaaa zzzz wwww"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cov = {r["doc_id"]: r for r in cross_doc_gram_coverage(df, gram_chars=5).collect()}
    rem = _run_remove(spark, rows, gram_chars=5)
    for k in cov:
        assert rem[k]["removed_chars"] == cov[k]["covered_chars"]
        assert len(rem[k]["clean_text"]) + rem[k]["removed_chars"] == len(rows[k - 1][1])
