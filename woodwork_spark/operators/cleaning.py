"""Corpus-cleaning operators for LLM training pipelines: Gopher-style
repetition signals, C4-style line filtering, PII redaction, and
benchmark-contamination checks.

Design (100 TB first):

- Per-document signals (repetition ratios, line filters, PII scrub) are
  pure Column expressions over the line/token arrays — one projection,
  no shuffle, whole-stage codegen, embarrassingly parallel.
- Cross-document signals (top/duplicated n-gram fractions, benchmark
  contamination) explode n-grams and aggregate on (doc, gram-hash):
  the same shuffle shape as vocabulary building, which scales linearly
  in corpus token count.  Grams are hashed to longs BEFORE the shuffle
  so shuffle bytes are 8B/gram, not the gram text.
- The benchmark side of a contamination check is tiny by construction
  (a benchmark suite, not a corpus) — it is broadcast, so the overlap
  join is shuffle-free on the corpus side.

References (behavioral, public): Gopher (Rae et al. 2021, §A1.1
repetition filters), C4 (Raffel et al. 2020, §2.2 line heuristics).
Reference repo has no corpus-cleaning ops; these extend SURVEY.md §2's
LLM-pipeline section.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from woodwork_spark.lifecycle import attach_persisted, persisted_frames
from woodwork_spark.operators.text import tokens_expr

# ---------------------------------------------------------------------------
# Gopher-style repetition signals (per-document: no shuffle)
# ---------------------------------------------------------------------------


def lines_expr(text_col: str, sep: str = "\n") -> Column:
    """Non-empty trimmed lines of a document.  ``sep`` is a LITERAL
    separator (regex-quoted): '|' or '.' must not be interpreted as a
    pattern."""
    return F.filter(
        F.transform(
            F.split(F.col(text_col), "\\Q" + sep + "\\E"),
            lambda l: F.trim(l),
        ),
        lambda l: l != "",
    )


def duplicate_line_exprs(text_col: str, sep: str = "\n") -> dict[str, Column]:
    """Gopher duplicate-line signals: fraction of lines (and of line
    characters) that are repeats of an earlier identical line.  Pure
    array expressions — distinct-vs-total over the per-doc line array."""
    lines = lines_expr(text_col, sep)
    uniq = F.array_distinct(lines)
    n = F.size(lines)
    chars = F.aggregate(lines, F.lit(0), lambda a, l: a + F.length(l))
    uchars = F.aggregate(uniq, F.lit(0), lambda a, l: a + F.length(l))
    return {
        "dup_line_fraction": (n - F.size(uniq)) / F.greatest(n, F.lit(1)),
        "dup_line_char_fraction": (chars - uchars)
        / F.greatest(chars, F.lit(1)),
    }


def _gram_rows(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gram, gram_chars) rows: word n-grams with their character
    length (tokens + separating spaces).  Tokenize once into a bound
    array column, then one explode — the gram lambda never re-splits."""
    toks = df.select(
        F.col(id_col).alias("id"), tokens_expr(text_col).alias("__toks"),
    )
    grams = F.expr(
        f"transform(sequence(1, greatest(size(__toks) - {n - 1}, 1)), "
        f"i -> array_join(slice(__toks, i, {n}), ' '))",
    )
    return (
        toks.select("id", F.explode(grams).alias("gram"))
        .filter(F.col("gram") != "")
        .select("id", "gram", F.length("gram").alias("gram_chars"))
    )


def top_ngram_fraction(
    df: DataFrame, id_col: str, text_col: str, n: int = 2,
) -> DataFrame:
    """Gopher top-n-gram signal: per document, the fraction of
    characters covered by the single most frequent word n-gram
    (count * gram_chars / doc_chars).  Explode + groupBy(doc, gram) +
    per-doc max — shuffle keyed on (doc, gram), linear in corpus tokens."""
    rows = _gram_rows(df, id_col, text_col, n)
    per_gram = rows.groupBy("id", "gram").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.first("gram_chars").alias("gram_chars"),
    )
    top = per_gram.groupBy("id").agg(
        F.max(F.struct("cnt", "gram_chars", "gram")).alias("top"),
    )
    chars = df.select(
        F.col(id_col).alias("id"), F.length(F.trim(F.col(text_col))).alias("doc_chars"),
    )
    return top.join(chars, "id").select(
        F.col("id").alias(id_col),
        F.col("top.gram").alias("top_gram"),
        F.col("top.cnt").alias("top_gram_count"),
        (
            F.col("top.cnt") * F.col("top.gram_chars")
            / F.greatest(F.col("doc_chars"), F.lit(1))
        ).alias("top_ngram_char_fraction"),
    )


def duplicate_ngram_fraction(
    df: DataFrame, id_col: str, text_col: str, n: int = 5,
) -> DataFrame:
    """Gopher duplicated-n-gram signal: per document, the fraction of
    n-gram occurrences that are repeats (occurrences beyond the first of
    each distinct gram).  Same (doc, gram) shuffle shape."""
    rows = _gram_rows(df, id_col, text_col, n)
    per_gram = rows.groupBy("id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    return per_gram.groupBy("id").agg(
        F.sum("cnt").alias("n_grams"),
        (F.sum("cnt") - F.count(F.lit(1))).alias("dup_grams"),
    ).select(
        F.col("id").alias(id_col),
        "n_grams",
        "dup_grams",
        (F.col("dup_grams") / F.greatest(F.col("n_grams"), F.lit(1))).alias(
            "dup_ngram_fraction",
        ),
    )


# ---------------------------------------------------------------------------
# C4-style line filtering (per-document: no shuffle)
# ---------------------------------------------------------------------------

C4_BLACKLIST = ["javascript", "lorem ipsum", "cookie policy", "{"]


def c4_line_filter_exprs(
    text_col: str,
    sep: str = "\n",
    min_words: int = 3,
    require_terminal_punct: bool = True,
    blacklist: list[str] = None,
) -> dict[str, Column]:
    """C4 §2.2 line heuristics: keep lines with >= min_words words,
    ending in terminal punctuation, not containing blacklist terms.
    Returns cleaned text plus kept/total counts — one projection."""
    bl = C4_BLACKLIST if blacklist is None else blacklist
    lines = lines_expr(text_col, sep)

    def _keep(l):
        cond = F.size(F.split(l, r"\s+")) >= min_words
        if require_terminal_punct:
            cond = cond & l.rlike(r"[.!?\"']$")
        for term in bl:
            cond = cond & ~F.contains(F.lower(l), F.lit(term))
        return cond

    kept = F.filter(lines, _keep)
    return {
        "clean_text": F.array_join(kept, sep),
        "n_lines": F.size(lines),
        "n_lines_kept": F.size(kept),
    }


# ---------------------------------------------------------------------------
# PII redaction (per-document: no shuffle)
# ---------------------------------------------------------------------------

# Conservative patterns valid in both Java regex (Spark) and RE2
# (DuckDB/Go) so results are engine-portable: no lookaround, no
# backrefs.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d[\d()\- ]{6,}\d",
}

PII_REPLACEMENTS = {"email": "<EMAIL>", "ipv4": "<IP>", "phone": "<PHONE>"}


def pii_redact_expr(text_col) -> Column:
    """Replace emails, IPv4s, and international-format phone numbers
    with typed placeholder tags.  Chained JVM regexp_replace — order
    matters (emails first: an email never contains an IP-shaped span,
    but a phone pattern could eat pieces of either)."""
    out = F.col(text_col) if isinstance(text_col, str) else text_col
    for kind in ("email", "ipv4", "phone"):
        out = F.regexp_replace(out, PII_PATTERNS[kind], PII_REPLACEMENTS[kind])
    return out


def pii_count_exprs(text_col) -> dict[str, Column]:
    """Per-kind PII hit counts (size of regexp_extract_all)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return {
        f"n_{kind}": F.size(F.regexp_extract_all(col, F.lit(pat), 0))
        for kind, pat in PII_PATTERNS.items()
    }


# ---------------------------------------------------------------------------
# Benchmark contamination (corpus x benchmark n-gram overlap)
# ---------------------------------------------------------------------------


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str = None,
    bench_text_col: str = None,
    n: int = 5,
    min_overlap: int = 1,
) -> DataFrame:
    """Docs sharing >= min_overlap distinct word n-grams with any
    benchmark doc: (doc_id, bench_id, n_shared_grams).

    The classic decontamination step before training.  Corpus grams are
    hashed to longs (xxhash64) before the join so the corpus-side
    shuffle moves 8 bytes per distinct (doc, gram); the benchmark side
    (small by construction) is broadcast — the join adds NO corpus
    shuffle beyond the distinct."""
    bench_id_col = bench_id_col or id_col
    bench_text_col = bench_text_col or text_col
    c = _gram_rows(corpus, id_col, text_col, n)
    b = _gram_rows(benchmark, bench_id_col, bench_text_col, n)
    ch = c.select("id", F.xxhash64("gram").alias("g")).distinct()
    bh = b.select(
        F.col("id").alias("bench_id"), F.xxhash64("gram").alias("g"),
    ).distinct()
    return (
        ch.join(F.broadcast(bh), "g")
        .groupBy("id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
        .filter(F.col("n_shared_grams") >= min_overlap)
        .select(
            F.col("id").alias(id_col),
            "bench_id",
            "n_shared_grams",
        )
    )


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_docs: int = 2,
    sep: str = "\n",
    out_col: str = None,
    group_col: str = None,
) -> DataFrame:
    """Cross-document boilerplate removal: drop every line that appears
    (exact match after trim) in at least ``min_docs`` DISTINCT documents
    — cookie banners, nav menus, license footers.  The intra-document
    twin is ``duplicate_line_exprs``; this one needs corpus context.

    Matching is on the TRIMMED line, but documents are reassembled from
    their ORIGINAL lines — indentation and blank lines survive, which
    matters for code and whitespace-significant text; blank lines are
    never counted as boilerplate.  NULL text stays NULL; documents whose
    every line is boilerplate survive with empty text (count them, don't
    lose them).

    Shape: one shared posexplode (persisted — the frequency agg and the
    keep-join both consume it) -> per-line distinct-doc count keyed on
    xxhash64(trimmed line) so the shuffle carries 8-byte longs, not line
    text -> join back, keep below threshold, reassemble in original
    order via array_sort over (pos, line) structs.

    ``group_col`` scopes the frequency count to a group (usually the
    registered domain): nav chrome is ubiquitous within ONE site but
    rare corpus-wide, so per-domain counting catches it without
    inflating the global threshold — the C4/CCNet per-site convention.
    The shuffle key gains the group column; the shape is otherwise
    identical.
    """
    out_col = out_col or text_col
    # \Q...\E: the separator is a LITERAL, not a regex — split and the
    # final rejoin must be inverses ('|' or '.' as sep would otherwise
    # shred the text).  Lines keep their ORIGINAL content (indentation,
    # blank lines); only the trimmed form is the boilerplate KEY, and
    # blank lines are never counted as boilerplate.
    sep_lit = "\\Q" + sep + "\\E"
    gcols = [group_col] if group_col else []
    exploded = (
        df.select(
            F.col(id_col),
            *[F.col(c) for c in gcols],
            F.posexplode(F.split(F.col(text_col), sep_lit)).alias(
                "__pos", "__line",
            ),
        )
        # 8-byte hashed key: the frequency shuffle and the join carry
        # longs, not line text (collision odds ~n^2/2^64, negligible)
        .withColumn("__key", F.xxhash64(F.trim("__line")))
        .persist()
    )
    freq = (
        exploded.filter(F.trim("__line") != "")
        .groupBy(*gcols, "__key")
        .agg(F.count_distinct(id_col).alias("__docs"))
    )
    kept = (
        exploded.join(freq, gcols + ["__key"], "left")
        .filter(F.col("__docs").isNull() | (F.col("__docs") < min_docs))
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                    lambda s: s["__line"],
                ),
                sep,
            ).alias("__clean"),
        )
    )
    out = (
        df.join(kept, id_col, "left")
        .withColumn(
            out_col,
            F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(
                F.coalesce("__clean", F.lit("")),
            ),
        )
        .drop("__clean")
    )
    # the cached line explode rides on the result; free it with
    # lifecycle.release(result) after the cleaned corpus is written
    return attach_persisted(out, exploded)


def dedup_lines_global(
    df: DataFrame,
    text_col: str,
    id_col: str,
    sep: str = "\n",
    out_col: str = None,
) -> DataFrame:
    """Corpus-global line deduplication: every repeated line keeps only
    its FIRST occurrence (ordered by (``id_col``, position)); all later
    occurrences — in the same document or any other — are dropped.
    The paragraph/line-level analogue of exact document dedup: where
    ``remove_boilerplate_lines`` drops frequent lines EVERYWHERE, this
    keeps exactly one canonical copy, which is the semantics training
    pipelines want for repeated passages that are legitimate content.

    Matching is on the trimmed line; blank lines always survive (they're
    document structure).  NULL text stays NULL.  Documents reassemble
    from ORIGINAL lines in original order.

    Shape: one posexplode -> min(struct(id, pos)) per xxhash64'd line
    key (map-side partials; the shuffle carries 8-byte hashes + two
    longs, never text) -> join back on the hash, keep winners ->
    array_sort regroup.  No windows, no single reducer; identical
    shuffle shape to remove_boilerplate_lines.
    """
    out_col = out_col or text_col
    sep_lit = "\\Q" + sep + "\\E"
    exploded = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), sep_lit)).alias(
                "__pos", "__line",
            ),
        )
        # TWO independent 64-bit hashes = a 128-bit composite key:
        # deletion-by-key semantics cannot tolerate 64-bit birthday
        # collisions (~50% at ~5e9 distinct lines); 128 bits pushes the
        # odds to ~n^2/2^128.  Shuffle rows stay 16 bytes + two longs.
        .withColumn("__key", F.xxhash64(F.trim("__line")))
        .withColumn("__key2", F.xxhash64(F.trim("__line"), F.lit(1)))
        .persist()
    )
    first = (
        exploded.filter(F.trim("__line") != "")
        .groupBy("__key", "__key2")
        .agg(F.min(F.struct(F.col(id_col), F.col("__pos"))).alias("__first"))
        .select(
            "__key",
            "__key2",
            F.col(f"__first.{id_col}").alias("__fid"),
            F.col("__first.__pos").alias("__fpos"),
        )
    )
    kept = (
        exploded.join(first, ["__key", "__key2"], "left")
        .filter(
            F.col("__fid").isNull()  # blank lines: always keep
            | (
                (F.col(id_col) == F.col("__fid"))
                & (F.col("__pos") == F.col("__fpos"))
            ),
        )
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                    lambda s: s["__line"],
                ),
                sep,
            ).alias("__clean"),
        )
    )
    out = (
        df.join(kept, id_col, "left")
        .withColumn(
            out_col,
            F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(
                F.coalesce("__clean", F.lit("")),
            ),
        )
        .drop("__clean")
    )
    return attach_persisted(out, exploded)


def dedup_paragraphs_global(
    df: DataFrame,
    text_col: str,
    id_col: str,
    out_col: str = None,
) -> DataFrame:
    """Corpus-global PARAGRAPH deduplication — the middle ground between
    line dedup (too fine: drops repeated short lines that are ordinary
    prose) and whole-document MinHash (too coarse: misses a boilerplate
    paragraph pasted into thousands of otherwise-distinct pages).
    Documents split on blank lines (one or more, any surrounding
    horizontal whitespace); every repeated paragraph — matched on its
    trimmed text — keeps only its FIRST occurrence ordered by
    (``id_col``, position); later occurrences in the same or any other
    document are dropped; survivors reassemble in original order joined
    by a normalized ``\\n\\n``.

    Same scale shape as :func:`dedup_lines_global`: one posexplode ->
    min(struct(id, pos)) per 128-bit paragraph hash (map-side partials;
    the shuffle carries hashes + two longs, never paragraph text) ->
    hash join back to keep winners -> array_sort regroup.  No windows,
    no single reducer.

    Empty/whitespace-only fragments (split artifacts) are dropped from
    the reassembly; NULL text stays NULL; a document whose every
    paragraph loses becomes the empty string.
    """
    out_col = out_col or text_col
    exploded = (
        df.select(
            F.col(id_col),
            F.posexplode(
                F.split(F.col(text_col), r"[ \t]*\n[ \t]*(\n[ \t]*)+"),
            ).alias("__pos", "__para"),
        )
        .withColumn("__t", F.trim("__para"))
        .filter(F.col("__t") != "")
        # 2x64-bit composite key, same birthday-bound rationale as
        # dedup_lines_global
        .withColumn("__key", F.xxhash64("__t"))
        .withColumn("__key2", F.xxhash64("__t", F.lit(1)))
        .persist()
    )
    first = (
        exploded.groupBy("__key", "__key2")
        .agg(F.min(F.struct(F.col(id_col), F.col("__pos"))).alias("__first"))
        .select(
            "__key",
            "__key2",
            F.col(f"__first.{id_col}").alias("__fid"),
            F.col("__first.__pos").alias("__fpos"),
        )
    )
    kept = (
        exploded.join(first, ["__key", "__key2"], "left")
        .filter(
            (F.col(id_col) == F.col("__fid"))
            & (F.col("__pos") == F.col("__fpos")),
        )
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__para"))),
                    lambda s: F.trim(s["__para"]),
                ),
                "\n\n",
            ).alias("__clean"),
        )
    )
    out = (
        df.join(kept, id_col, "left")
        .withColumn(
            out_col,
            F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(
                F.coalesce("__clean", F.lit("")),
            ),
        )
        .drop("__clean")
    )
    return attach_persisted(out, exploded)


def normalize_unicode_expr(text_col: str, form: str = "NFC",
                           strip_accents: bool = False):
    """Unicode normalization as an Arrow-batched pandas UDF — mojibake
    and mixed-form text (decomposed vs precomposed accents) is endemic
    in web corpora, and exact-dedup keys are wrong without a canonical
    form.  Spark has no builtin normalizer, so this is a documented
    vectorized-Python touchpoint (pandas ``str`` ops over Arrow
    batches, never per-row Python).  ``strip_accents`` additionally
    removes combining marks after NFD (the utf8proc/ICU convention).
    NULLs pass through.
    """
    import unicodedata

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"invalid normalization form {form!r}")

    from pyspark.sql.functions import pandas_udf

    # note: module-level ``pd`` import is load-bearing — postponed
    # annotations resolve the hint strings against module globals
    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            if strip_accents:
                # decompose, drop combining marks, then STILL apply the
                # requested form — the stripped residue must come back
                # recomposed/folded, not left NFD
                v = "".join(
                    ch
                    for ch in unicodedata.normalize("NFD", v)
                    if not unicodedata.combining(ch)
                )
            return unicodedata.normalize(form, v)

        return s.map(one, na_action="ignore")

    return _norm(F.col(text_col))


def contamination_fraction(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str = None,
    bench_text_col: str = None,
    n: int = 5,
) -> DataFrame:
    """Per-document contamination RATE: the fraction of each doc's
    distinct word n-grams that appear anywhere in the benchmark —
    the number a decontamination gate actually thresholds on
    (``contamination_report`` lists matching pairs; this scores every
    doc, including the clean ones with rate 0).

    Same join shape as the report: corpus grams hash to longs and
    dedupe per doc (one map-side-combinable shuffle), the benchmark's
    distinct gram-hash set is broadcast, membership resolves in a
    LEFT join inside the same stage, and one per-doc agg finishes.
    Docs shorter than ``n`` tokens contribute their whole text as one
    gram (the module's gram convention), so every doc gets a defined
    rate (gram-less docs — empty text — rate 0).

    Returns ``(id_col, n_grams, n_contaminated, contaminated_frac)``.
    """
    bench_id_col = bench_id_col or id_col
    bench_text_col = bench_text_col or text_col
    c = _gram_rows(corpus, id_col, text_col, n)
    ch = c.select("id", F.xxhash64("gram").alias("g")).distinct()
    bh = (
        _gram_rows(benchmark, bench_id_col, bench_text_col, n)
        .select(F.xxhash64("gram").alias("g"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    per_doc = (
        ch.join(F.broadcast(bh), "g", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_contaminated"),
        )
    )
    return (
        corpus.select(F.col(id_col).alias("id")).distinct()
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.coalesce(
                F.col("n_contaminated") / F.col("n_grams"), F.lit(0.0),
            ).alias("contaminated_frac"),
        )
    )


def dup_rate_timeseries(
    df: DataFrame,
    ts_col: str,
    text_col: str,
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Ingestion-health trend: per time bucket, the exact-duplicate
    rate (1 - distinct fingerprints / docs) WITHIN the bucket and the
    rate of collisions against any EARLIER bucket — the two numbers
    that separate "this crawl re-sends its own pages" from "this crawl
    re-sends last week's".

    One (bucket, fingerprint) aggregation (map-side combinable), one
    first-occurrence agg per fingerprint reduced from those rows, one
    compact join back on the fingerprint — shuffles scale with
    distinct (bucket, fp) pairs, never raw text.

    Returns ``(bucket_s, n_docs, n_distinct, within_dup_rate,
    n_seen_before, cross_dup_rate)``.
    """
    from woodwork_spark.operators.text import fingerprint_expr
    from woodwork_spark.operators.timeseries import bucket_expr

    b = bucket_expr(ts_col, bucket_seconds)
    pairs = (
        df.select(b.alias("__b"), fingerprint_expr(text_col).alias("__fp"))
        .groupBy("__b", "__fp")
        .agg(F.count(F.lit(1)).alias("__n"))
    ).persist()
    firsts = pairs.groupBy("__fp").agg(F.min("__b").alias("__first_b"))
    j = pairs.join(firsts, "__fp")
    out = j.groupBy(F.col("__b").alias("bucket_s")).agg(
        F.sum("__n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_distinct"),
        (
            1.0 - F.count(F.lit(1)) / F.sum("__n").cast("double")
        ).alias("within_dup_rate"),
        F.sum(
            F.when(F.col("__first_b") < F.col("__b"), F.col("__n"))
            .otherwise(0),
        ).alias("n_seen_before"),
        (
            F.sum(
                F.when(F.col("__first_b") < F.col("__b"), F.col("__n"))
                .otherwise(0),
            )
            / F.sum("__n").cast("double")
        ).alias("cross_dup_rate"),
    )
    from woodwork_spark.lifecycle import attach_persisted

    return attach_persisted(out, pairs)


def luhn_valid_expr(digits_col) -> Column:
    """Luhn checksum validity of a digit string — the verification step
    that separates REAL payment-card numbers from random 16-digit
    noise in PII sweeps (redacting only Luhn-valid candidates cuts
    false positives by ~90%).

    Pure Column expression: reversed digit array, position-aware
    doubling with the >9 fold, one ``aggregate`` sum — codegen all the
    way; NULL/non-digit input yields false.
    """
    c = F.col(digits_col) if isinstance(digits_col, str) else digits_col
    clean = F.regexp_replace(c, r"[^0-9]", "")
    rev = F.reverse(clean)
    n = F.length(rev)
    total = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), n),
            # every second digit (from the right) doubles; the >9 fold
            # happens in the accumulator
            lambda i: (F.ascii(F.substr(rev, i, F.lit(1))) - 48)
            * F.when(i % 2 == 0, 2).otherwise(1),
        ),
        F.lit(0),
        lambda acc, d: acc + F.when(d > 9, d - 9).otherwise(d),
    )
    return F.when(
        (n >= 12) & (n <= 19), (total % 10) == 0,
    ).otherwise(F.lit(False))


# ---------------------------------------------------------------------------
# Exact repeated-substring spans (cross-document, char-level)
# ---------------------------------------------------------------------------


def repeated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_len: int = 50,
    min_docs: int = 2,
) -> DataFrame:
    """Char-level exact repeated substrings across documents: every
    maximal character range covered by some length-``span_len`` window
    whose text occurs in at least ``min_docs`` DISTINCT documents.
    This is the practical Spark form of suffix-array substring dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better"): fixed-length rolling windows instead of suffix
    arrays, which keeps the work a plain explode + aggregate and finds
    every repeat of length >= span_len (a repeat of exactly span_len
    aligns with at least one window in both documents regardless of
    offset, because EVERY start position emits a window).

    The line-level twin is :func:`remove_boilerplate_lines`; this one
    catches boilerplate that does not respect line boundaries (inlined
    license headers, templated sentences, concatenated nav text).

    Shape (100 TB first): one explode to (doc, start) per window — the
    window TEXT never shuffles; each window is reduced to a 16-byte
    double ``xxhash64`` key (two independent seeds: collision odds
    ~n^2/2^128, negligible at any corpus size) — then one aggregate on
    the key counting distinct docs, one semi-join back, and per-doc
    island-merging through a window partitioned by doc id (bounded by
    document length, arbitrarily parallel across docs).  Offsets are
    1-based chars, consistent with ``substr``.

    Returns ``(id_col, span_start, span_end, n_windows)`` — one row per
    maximal merged island; ``n_windows`` is how many qualifying windows
    the island merged.  Touching islands (gap of 0 chars) merge.
    """
    from pyspark.sql import Window

    if span_len < 2:
        raise ValueError(f"span_len must be >= 2, got {span_len}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    from .scale import fan_out_scan

    gram = F.substr(F.col(text_col), F.col("span_start"), F.lit(span_len))
    # the per-char window explode + double xxhash64 is the expensive
    # stage; a single-row-group input would fuse it all into ONE scan
    # task (fan_out_scan is a no-op once the scan parallelizes)
    win = (
        fan_out_scan(df.filter(F.length(text_col) >= span_len))
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.lit(1), F.length(text_col) - span_len + 1),
            ).alias("span_start"),
            F.col(text_col),
        )
        .select(
            id_col,
            "span_start",
            # 16-byte key, text dropped before any shuffle
            F.xxhash64(gram).alias("__h1"),
            F.xxhash64(F.lit("ww-span-2"), gram).alias("__h2"),
        )
        .persist()
    )
    rep = (
        win.groupBy("__h1", "__h2")
        .agg(F.count_distinct(id_col).alias("__docs"))
        .filter(F.col("__docs") >= min_docs)
        .select("__h1", "__h2")
    )
    marked = win.join(rep, ["__h1", "__h2"], "left_semi").select(
        id_col, "span_start",
    )
    w = Window.partitionBy(id_col).orderBy("span_start")
    prev_end = F.max(
        F.col("span_start") + span_len - 1,
    ).over(w.rowsBetween(Window.unboundedPreceding, -1))
    islands = (
        marked.withColumn(
            "__brk",
            F.when(
                F.col("span_start") > F.coalesce(prev_end, F.lit(-1)) + 1,
                1,
            ).otherwise(0),
        )
        .withColumn("__isl", F.sum("__brk").over(w))
        .groupBy(id_col, "__isl")
        .agg(
            F.min("span_start").alias("span_start"),
            (F.max("span_start") + span_len - 1).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .drop("__isl")
    )
    # the cached window table feeds both the frequency agg and the
    # semi-join; free it with lifecycle.release(result) after consuming
    return attach_persisted(islands, win)


def mask_repeated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_len: int = 50,
    min_docs: int = 2,
    replacement: str = "",
    out_col: str = None,
    spans: DataFrame = None,
) -> DataFrame:
    """Cut every cross-document repeated span (per
    :func:`repeated_spans`) out of ``text_col``, splicing
    ``replacement`` where each maximal island was.  ALL occurrences are
    removed (the span is boilerplate by construction — it appears in
    ``min_docs``+ documents); for keep-one-copy semantics dedup at the
    document level instead.

    Reconstruction is a pure fold over the doc's sorted island array
    (bounded by document length): no UDF, no second pass over the
    corpus — documents without repeated spans pass through untouched
    via the left join.  NULL text stays NULL.

    Pass ``spans`` (a frame from :func:`repeated_spans`, same id/
    span_start/span_end columns) to reuse a precomputed island table —
    the report-then-mask pipeline otherwise pays the corpus window
    explode twice.
    """
    out_col = out_col or text_col
    if spans is None:
        spans = repeated_spans(df, id_col, text_col, span_len, min_docs)
    per_doc = spans.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct("span_start", "span_end")),
        ).alias("__spans"),
    )
    rebuilt = F.aggregate(
        F.col("__spans"),
        F.struct(F.lit(1).alias("pos"), F.lit("").alias("acc")),
        lambda acc, sp: F.struct(
            (sp["span_end"] + F.lit(1)).alias("pos"),
            F.concat(
                acc["acc"],
                F.substr(
                    F.col(text_col), acc["pos"], sp["span_start"] - acc["pos"],
                ),
                F.lit(replacement),
            ).alias("acc"),
        ),
        lambda acc: F.concat(
            acc["acc"],
            F.substr(F.col(text_col), acc["pos"], F.length(text_col)),
        ),
    )
    out = (
        df.join(per_doc, id_col, "left")
        .withColumn(
            out_col,
            F.when(F.col(text_col).isNull(), F.lit(None))
            .when(F.col("__spans").isNull(), F.col(text_col))
            .otherwise(rebuilt),
        )
        .drop("__spans")
    )
    return attach_persisted(out, *persisted_frames(spans))


# Gopher (Rae et al. 2021, A.1.1) required-stopword list.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules_exprs(
    text_col: str,
    sep: str = "\n",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> dict[str, Column]:
    """The Gopher document-quality rules (Rae et al. 2021 §A.1.1) as
    one dict of boolean Columns plus the overall conjunction — the
    third member of the standard filter stack next to
    :func:`c4_line_filter_exprs` and ``text.quality_score_exprs``:

    word count in [min, max]; mean word length in [3, 10]; symbol
    (# / ellipsis) to word ratio <= 0.1; <= 90% of lines
    bullet-initial; <= 30% of lines ellipsis-terminal; >= 80% of words
    contain an alphabetic character; >= 2 distinct required stopwords
    present.

    Pure per-document Column expressions (one projection, no shuffle,
    no UDFs); NULL text fails every rule.  Word = whitespace token;
    NULL-safe via a zero-word floor in the denominators.
    """
    words = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != "",
    )
    n_words = F.size(words)
    denom_w = F.greatest(n_words, F.lit(1)).cast("double")
    lines = lines_expr(text_col, sep)
    n_lines = F.size(lines)
    denom_l = F.greatest(n_lines, F.lit(1)).cast("double")
    mean_wl = (
        F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w)) / denom_w
    )
    n_symbols = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), "#", ""))
        + F.size(F.split(F.col(text_col), r"\.\.\.|…", -1)) - 1
    )
    bullet_lines = F.size(
        F.filter(lines, lambda l: l.rlike(r"^[\-\*•]")),
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$")),
    )
    alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]")),
    )
    lowered = F.lower(F.col(text_col))
    stop_hits = sum(
        F.when(
            lowered.rlike(r"(^|[^a-z])" + s + r"([^a-z]|$)"), 1,
        ).otherwise(0)
        for s in GOPHER_STOPWORDS
    )
    rules = {
        "r_word_count": (n_words >= min_words) & (n_words <= max_words),
        "r_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "r_symbol_ratio": (n_symbols / denom_w) <= max_symbol_ratio,
        "r_bullet_lines": (bullet_lines / denom_l) <= max_bullet_line_frac,
        "r_ellipsis_lines": (ellipsis_lines / denom_l)
        <= max_ellipsis_line_frac,
        "r_alpha_words": (alpha_words / denom_w) >= min_alpha_word_frac,
        "r_stopwords": stop_hits >= min_stopword_hits,
    }
    rules = {
        k: F.when(F.col(text_col).isNotNull(), v).otherwise(F.lit(False))
        for k, v in rules.items()
    }
    overall = None
    for v in rules.values():
        overall = v if overall is None else (overall & v)
    rules["gopher_pass"] = overall
    return rules


def gopher_report(
    df: DataFrame,
    text_col: str,
    group_cols=(),
    **params,
) -> DataFrame:
    """Pass rate per Gopher rule (and overall), optionally per group —
    one projection + one map-side-combinable aggregate.  Returns
    ``(group_cols..., n_docs, <rule>_rate..., gopher_pass_rate)``."""
    group_cols = (
        [group_cols] if isinstance(group_cols, str) else list(group_cols)
    )
    exprs = gopher_rules_exprs(text_col, **params)
    flagged = df.select(
        *group_cols,
        *[v.alias(k) for k, v in exprs.items()],
    )
    return flagged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.avg(F.col(k).cast("double")).alias(f"{k}_rate")
            for k in exprs
        ],
    )


def dedup_spans_global(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 20,
    out_col: str = None,
) -> DataFrame:
    """Cross-document SUBSTRING deduplication at k-token granularity —
    the Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better", ExactSubstr) gap that paragraph dedup leaves open:
    boilerplate that straddles paragraph boundaries, license headers
    glued to prose, navigation chrome.  Every k-token window is
    fingerprinted corpus-wide; a window occurrence that is not the
    global FIRST occurrence of its fingerprint (ordered by (``id_col``,
    position)) marks its k tokens for removal; survivors rejoin in
    order.  Documents shorter than ``k`` tokens are untouched; removal
    regions merge (overlapping duplicate windows erase their union);
    each duplicated span keeps its first occurrence.

    This is the shuffle-friendly approximation of suffix-array
    ExactSubstr: windows rather than maximal repeats (a repeat of
    length L >= k is covered by its L-k+1 windows, so it IS removed in
    full from every non-first document), and the winner's copy is kept
    intact unless another duplicated span overlaps it.  Output text is
    whitespace-normalized (tokens rejoined with single spaces) — the
    cost of token-level reassembly, shared with tokenize/detokenize
    round trips.

    Scale shape: ONE projection builds the token array; windows explode
    as (id, pos, 2x64-bit hash) — the shuffle never carries text; the
    winner groupBy is map-side combinable; the removal mask is a
    per-document RUNNING-MAX sweep (one window partitioned by doc id
    over tokens + duplicate-interval rows — interval unions WITHOUT the
    k-fold explode of enumerating covered positions); reassembly is the
    same array_sort regroup as paragraph dedup.  No single reducer; per
    reducer state is one document's tokens.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    out_col = out_col or text_col
    from pyspark.sql import Window as W

    base = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"),
            lambda t: t != "",
        ).alias("__toks"),
    ).persist()
    n = F.size("__toks")
    wins = base.select(
        F.col(id_col),
        F.explode(
            F.when(
                n >= k,
                F.transform(
                    F.sequence(F.lit(1), n - k + 1),
                    lambda i: F.struct(
                        F.xxhash64(
                            F.concat_ws(" ", F.slice("__toks", i, k)),
                        ).alias("h1"),
                        F.xxhash64(
                            F.concat_ws(" ", F.slice("__toks", i, k)),
                            F.lit(1),
                        ).alias("h2"),
                        (i - 1).alias("p"),
                    ),
                ),
            ).otherwise(F.array()),
        ).alias("__w"),
    ).select(
        id_col,
        F.col("__w.h1").alias("__h1"),
        F.col("__w.h2").alias("__h2"),
        F.col("__w.p").alias("__wpos"),
    ).persist()
    first = wins.groupBy("__h1", "__h2").agg(
        F.min(F.struct(F.col(id_col), F.col("__wpos"))).alias("__f"),
    ).select(
        "__h1", "__h2",
        F.col(f"__f.{id_col}").alias("__fid"),
        F.col("__f.__wpos").alias("__fpos"),
    )
    dup = (
        wins.join(first, ["__h1", "__h2"])
        .filter(
            (F.col(id_col) != F.col("__fid"))
            | (F.col("__wpos") != F.col("__fpos")),
        )
        .select(
            id_col,
            F.col("__wpos").alias("__pos"),
            (F.col("__wpos") + F.lit(k - 1)).alias("__end"),
            F.lit(None).cast("string").alias("__tok"),
            F.lit(0).alias("__is_tok"),
        )
    )
    toks = base.select(
        id_col,
        F.posexplode("__toks").alias("__pos", "__tok"),
    ).select(
        id_col, "__pos",
        F.lit(None).cast("long").alias("__end"),
        "__tok", F.lit(1).alias("__is_tok"),
    )
    # running max of duplicate-interval ends: a token at __pos is erased
    # iff some duplicate window starting at or before it still covers it
    sweep_w = (
        W.partitionBy(id_col)
        .orderBy("__pos", "__is_tok")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    swept = toks.unionByName(dup).withColumn(
        "__cov", F.max("__end").over(sweep_w),
    )
    kept = (
        swept.filter(
            (F.col("__is_tok") == 1)
            & (F.col("__cov").isNull() | (F.col("__cov") < F.col("__pos"))),
        )
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__tok"))),
                    lambda s: s["__tok"],
                ),
                " ",
            ).alias("__clean"),
        )
    )
    out = (
        df.join(kept, id_col, "left")
        .withColumn(
            out_col,
            F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(
                F.coalesce("__clean", F.lit("")),
            ),
        )
        .drop("__clean")
    )
    return attach_persisted(out, base, wins)


def bitext_qa_exprs(
    src_col: str,
    tgt_col: str,
    max_len_ratio: float = 2.0,
) -> dict[str, Column]:
    """Parallel-corpus (bitext) QA signals for translation training
    pairs — the standard pre-filters every MT pipeline runs before
    alignment-model scoring (length-ratio and copy heuristics per
    Moses/OPUS cleaning conventions):

    - ``src_tokens`` / ``tgt_tokens``: whitespace token counts;
    - ``len_ratio``: longer/shorter CHARACTER length (NULL when either
      side is empty — emptiness is its own flag);
    - ``ratio_ok``: len_ratio <= ``max_len_ratio``;
    - ``is_copy``: case-folded trimmed equality (untranslated rows);
    - ``token_overlap``: |distinct src tokens ∩ distinct tgt tokens| /
      min(distinct counts) — near-1 on same-script pairs means the
      "translation" is mostly the source;
    - ``digit_mismatch``: the sorted multisets of digit runs differ
      (numbers must survive translation verbatim);
    - ``terminal_punct_match``: both sides end in terminal punctuation
      or both don't.

    All pure column expressions (one projection, no shuffle, RE2-safe
    regexes), composable with :func:`~woodwork_spark.operators.text.
    lang_id_expr` for the language-pair check.
    """
    if max_len_ratio <= 1.0:
        raise ValueError("max_len_ratio must be > 1")

    def toks(c):
        return F.filter(
            F.split(F.trim(F.col(c)), r"\s+"), lambda t: t != "",
        )

    s, t = F.trim(F.col(src_col)), F.trim(F.col(tgt_col))
    st, tt = toks(src_col), toks(tgt_col)
    ls, lt = F.length(s), F.length(t)
    longer = F.greatest(ls, lt).cast("double")
    shorter = F.least(ls, lt)
    sd = F.array_distinct(st)
    td = F.array_distinct(tt)
    inter = F.size(F.array_intersect(sd, td))
    min_d = F.least(F.size(sd), F.size(td))
    digits = lambda c: F.array_sort(  # noqa: E731
        F.regexp_extract_all(c, F.lit("[0-9]+"), 0),
    )
    term = lambda c: c.rlike(r"[.!?]$")  # noqa: E731
    return {
        "src_tokens": F.size(st),
        "tgt_tokens": F.size(tt),
        "len_ratio": F.when(shorter > 0, longer / shorter),
        "ratio_ok": F.when(
            shorter > 0, longer / shorter <= F.lit(float(max_len_ratio)),
        ).otherwise(F.lit(False)),
        "is_copy": (F.lower(s) == F.lower(t)) & (ls > 0),
        "token_overlap": F.when(
            min_d > 0, inter.cast("double") / min_d,
        ),
        "digit_mismatch": ~digits(s).eqNullSafe(digits(t)),
        "terminal_punct_match": term(s) == term(t),
    }


def bitext_filter(
    df: DataFrame,
    src_col: str,
    tgt_col: str,
    max_len_ratio: float = 2.0,
    min_tokens: int = 1,
    max_tokens: int = 250,
    max_overlap: float = 0.6,
    require_digit_parity: bool = True,
    keep_col: str = "bitext_keep",
) -> DataFrame:
    """Apply :func:`bitext_qa_exprs` and decide: keep a pair iff both
    sides are non-null with token counts in ``[min_tokens,
    max_tokens]``, the length ratio passes, it is not a copy, the
    distinct-token overlap is <= ``max_overlap``, and (when
    ``require_digit_parity``) the digit runs agree.  Adds every signal
    column plus ``keep_col`` — filter downstream so the rejects stay
    countable per reason (governance wants reject REASONS, not a
    silently smaller corpus).  One projection, no shuffle."""
    exprs = bitext_qa_exprs(src_col, tgt_col, max_len_ratio)
    out = df.withColumns(exprs)
    keep = (
        F.col(src_col).isNotNull() & F.col(tgt_col).isNotNull()
        & F.col("src_tokens").between(min_tokens, max_tokens)
        & F.col("tgt_tokens").between(min_tokens, max_tokens)
        & F.col("ratio_ok")
        & ~F.col("is_copy")
        & (
            F.col("token_overlap").isNull()
            | (F.col("token_overlap") <= F.lit(float(max_overlap)))
        )
    )
    if require_digit_parity:
        keep = keep & ~F.col("digit_mismatch")
    return out.withColumn(keep_col, keep)


def code_qa_exprs(text_col: str) -> dict[str, Column]:
    """Source-file quality signals (The Stack / StarCoder-style
    pre-filters for code corpora), one projection:

    - ``n_lines`` / ``max_line_len`` / ``avg_line_len``: minified or
      data-blob files show up as few huge lines;
    - ``alnum_frac``: alphanumeric characters / all characters —
      binary-ish or symbol-soup files sit low;
    - ``comment_line_frac``: lines whose trimmed head is a comment
      marker (``#``, ``//``, ``/*``, ``*``, ``--``) — near-1 means a
      license-header shell, near-0 on large files means generated code;
    - ``is_autogenerated``: the canonical "auto-generated / do not
      edit" markers anywhere in the first 500 chars;
    - ``mixed_indentation``: some lines open with tabs and others with
      spaces.

    All RE2-safe regex/array expressions — the same engine-portability
    contract as the PII patterns.
    """
    t = F.col(text_col)
    lines = F.split(t, "\n")
    nonempty = F.filter(lines, lambda l: F.trim(l) != "")
    line_lens = F.transform(nonempty, lambda l: F.length(l))
    n_lines = F.size(nonempty)
    total_len = F.aggregate(
        line_lens, F.lit(0), lambda a, x: a + x,
    )
    comment = F.filter(
        nonempty,
        lambda l: F.trim(l).rlike(r"^(#|//|/\*|\*|--)"),
    )
    head = F.lower(F.substring(t, 1, 500))
    return {
        "n_lines": n_lines,
        "max_line_len": F.array_max(line_lens),
        "avg_line_len": F.when(
            n_lines > 0, total_len.cast("double") / n_lines,
        ),
        "alnum_frac": F.when(
            F.length(t) > 0,
            F.length(F.regexp_replace(t, "[^A-Za-z0-9]", ""))
            / F.length(t).cast("double"),
        ),
        "comment_line_frac": F.when(
            n_lines > 0, F.size(comment).cast("double") / n_lines,
        ),
        "is_autogenerated": (
            F.contains(head, F.lit("auto-generated"))
            | F.contains(head, F.lit("autogenerated"))
            | F.contains(head, F.lit("do not edit"))
        ),
        "mixed_indentation": F.exists(
            lines, lambda l: l.startswith("\t"),
        ) & F.exists(lines, lambda l: l.rlike(r"^ +\S")),
    }
