"""Corpus-cleaning operators: Gopher repetition signals, C4 line
filters, PII redaction, benchmark contamination."""

import pytest
from pyspark.sql import functions as F

from woodwork_spark.operators import cleaning


@pytest.fixture(scope="module")
def lined_docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat down.\nthe cat sat down.\nanother line here."),
            (2, "all unique lines.\nno repeats at all.\nthird line fine."),
            (3, "short\nenable javascript now.\nthis line stays okay."),
        ],
        "doc_id long, text string",
    )


def test_duplicate_line_fractions(spark, lined_docs):
    e = cleaning.duplicate_line_exprs("text")
    rows = {
        r["doc_id"]: r
        for r in lined_docs.select(
            "doc_id", *(v.alias(k) for k, v in e.items()),
        ).collect()
    }
    assert rows[1]["dup_line_fraction"] == pytest.approx(1 / 3)
    assert rows[2]["dup_line_fraction"] == 0.0
    # doc 1: dup line is 17 chars of 17+17+18=52 total
    assert rows[1]["dup_line_char_fraction"] == pytest.approx(17 / 52)


def test_top_ngram_fraction(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b x y")], "doc_id long, text string",
    )
    out = cleaning.top_ngram_fraction(df, "doc_id", "text", n=2).first()
    # bigrams: "a b" x3, "b a" x2, "b x", "x y"
    assert out["top_gram"] == "a b"
    assert out["top_gram_count"] == 3
    # 3 * 3 chars / 15 doc chars
    assert out["top_ngram_char_fraction"] == pytest.approx(9 / 15)


def test_duplicate_ngram_fraction(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b c a b c"), (2, "p q r s t u")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in cleaning.duplicate_ngram_fraction(
            df, "doc_id", "text", n=3,
        ).collect()
    }
    # doc1 trigram occurrences: 7 total, distinct {abc,bca,cab}=3 -> 4 dups
    assert rows[1]["n_grams"] == 7
    assert rows[1]["dup_grams"] == 4
    assert rows[1]["dup_ngram_fraction"] == pytest.approx(4 / 7)
    assert rows[2]["dup_ngram_fraction"] == 0.0


def test_c4_line_filter(spark, lined_docs):
    e = cleaning.c4_line_filter_exprs("text")
    rows = {
        r["doc_id"]: r
        for r in lined_docs.select(
            "doc_id", *(v.alias(k) for k, v in e.items()),
        ).collect()
    }
    # doc 3: "short" (1 word) out, "enable javascript now." (blacklist)
    # out, last line kept
    assert rows[3]["n_lines"] == 3
    assert rows[3]["n_lines_kept"] == 1
    assert rows[3]["clean_text"] == "this line stays okay."
    assert rows[1]["n_lines_kept"] == 3


def test_pii_redaction(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                "mail bob.smith+x@corp.example.org or 10.0.255.1 "
                "or +1 (555) 867-5309 now",
            ),
        ],
        "doc_id long, text string",
    )
    out = df.select(
        cleaning.pii_redact_expr("text").alias("t"),
        *(v.alias(k) for k, v in cleaning.pii_count_exprs("text").items()),
    ).first()
    assert out["t"] == "mail <EMAIL> or <IP> or <PHONE> now"
    assert (out["n_email"], out["n_ipv4"], out["n_phone"]) == (1, 1, 1)


def test_contamination_report(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta"),
            (2, "totally different words in this document here"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "x alpha beta gamma delta epsilon y")],
        "doc_id long, text string",
    )
    out = cleaning.contamination_report(
        corpus, bench, "doc_id", "text", n=5, min_overlap=1,
    ).collect()
    assert len(out) == 1
    assert out[0]["doc_id"] == 1 and out[0]["bench_id"] == 100
    # shared 5-grams: "alpha beta gamma delta epsilon" only
    assert out[0]["n_shared_grams"] == 1


def test_remove_boilerplate_lines_cross_document(spark):
    from woodwork_spark.operators.cleaning import remove_boilerplate_lines

    footer = "all rights reserved"
    rows = [
        (0, f"unique zero\n{footer}"),
        (1, f"unique one\n{footer}\nunique one b"),
        (2, f"{footer}"),          # only boilerplate -> empty, not lost
        (3, "standalone doc"),     # untouched
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(df, "text", "doc_id", min_docs=3).collect()
    }
    assert out[0] == "unique zero"
    assert out[1] == "unique one\nunique one b"  # order preserved
    assert out[2] == ""
    assert out[3] == "standalone doc"
    assert len(out) == 4


def test_remove_boilerplate_preserves_whitespace_and_nulls(spark):
    from woodwork_spark.operators.cleaning import remove_boilerplate_lines

    footer = "all rights reserved"
    code = "def f():\n    return 1\n\ndef g():\n    return 2"
    rows = [
        (0, f"{code}\n{footer}"),
        (1, footer),
        (2, footer),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(df, "text", "doc_id", min_docs=3).collect()
    }
    # indentation and blank lines survive untouched
    assert out[0] == code
    # NULL text stays NULL, not coerced to empty string
    assert out[3] is None


def test_remove_boilerplate_literal_separator(spark):
    from woodwork_spark.operators.cleaning import remove_boilerplate_lines

    rows = [(0, "keep|common"), (1, "also|common"), (2, "common")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(
            df, "text", "doc_id", min_docs=3, sep="|",
        ).collect()
    }
    # '|' must be a literal separator, not a regex alternation
    assert out[0] == "keep"
    assert out[1] == "also"
    assert out[2] == ""


# ---------------------------------------------------------------------------
# repeated_spans / mask_repeated_spans
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def span_docs(spark):
    # docs 1 and 2 share the 12-char block "SHAREDBLOCKX" twice over;
    # doc 3 is clean; doc 4 is NULL text; doc 5 is shorter than span_len
    return spark.createDataFrame(
        [
            (1, "aaaSHAREDBLOCKXbbbSHAREDBLOCKXccc"),
            (2, "zzSHAREDBLOCKXqq"),
            (3, "nothing in common here at all!!"),
            (4, None),
            (5, "tiny"),
        ],
        "doc_id long, text string",
    )


def test_repeated_spans_finds_shared_block(spark, span_docs):
    from woodwork_spark.lifecycle import release

    out = cleaning.repeated_spans(
        span_docs, "doc_id", "text", span_len=12, min_docs=2,
    )
    rows = sorted(
        (r["doc_id"], r["span_start"], r["span_end"]) for r in out.collect()
    )
    release(out)
    # doc 1: two islands (offsets 4-15 and 19-30, 1-based);
    # doc 2: one island (3-14); doc 3/4/5: none
    assert rows == [(1, 4, 15), (1, 19, 30), (2, 3, 14)]


def test_repeated_spans_merges_touching_islands(spark):
    from woodwork_spark.lifecycle import release

    # the shared region is longer than span_len -> consecutive windows
    # overlap and must merge into ONE island spanning the whole repeat
    df = spark.createDataFrame(
        [(1, "xxABCDEFGHIJyy"), (2, "ABCDEFGHIJ")],
        "doc_id long, text string",
    )
    out = cleaning.repeated_spans(df, "doc_id", "text", span_len=4, min_docs=2)
    rows = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in out.collect()
    )
    release(out)
    assert rows == [(1, 3, 12, 7), (2, 1, 10, 7)]


def test_mask_repeated_spans_reconstruction(spark, span_docs):
    from woodwork_spark.lifecycle import release

    out = cleaning.mask_repeated_spans(
        span_docs, "doc_id", "text", span_len=12, min_docs=2,
        replacement="<DUP>", out_col="masked",
    )
    got = {r["doc_id"]: r["masked"] for r in out.collect()}
    release(out)
    assert got[1] == "aaa<DUP>bbb<DUP>ccc"
    assert got[2] == "zz<DUP>qq"
    # untouched / NULL / short docs pass through
    assert got[3] == "nothing in common here at all!!"
    assert got[4] is None
    assert got[5] == "tiny"


def test_mask_repeated_spans_whole_doc(spark):
    from woodwork_spark.lifecycle import release

    # a doc that IS entirely a repeated span survives as empty text
    df = spark.createDataFrame(
        [(1, "ABCDEF"), (2, "xxABCDEFyy")], "doc_id long, text string",
    )
    out = cleaning.mask_repeated_spans(
        df, "doc_id", "text", span_len=6, min_docs=2,
    )
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    release(out)
    assert got[1] == ""
    assert got[2] == "xxyy"


def test_repeated_spans_param_validation(spark, span_docs):
    with pytest.raises(ValueError):
        cleaning.repeated_spans(span_docs, "doc_id", "text", span_len=1)
    with pytest.raises(ValueError):
        cleaning.repeated_spans(span_docs, "doc_id", "text", min_docs=1)
