"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

All pure Column expressions (split/regexp/aggregate/xxhash64) — the
whole module is UDF-free, so every operator runs inside whole-stage
codegen and composes with any DataFrame plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from woodwork_spark.lifecycle import attach_persisted, persisted_frames

# Small stopword sets per language (public common-word lists) for the
# n-gram/stopword-overlap language heuristic.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "with", "are", "this", "have", "not"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "las",
           "es", "por", "con", "para", "como"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht",
           "ein", "eine", "auf", "als", "auch", "sich"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "en", "un", "une",
           "que", "pour", "dans", "par", "sur"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "这", "他",
           "就", "人", "都", "一", "也"],
}


def tokens_expr(text_col):
    return F.split(F.trim(F.col(text_col)), r"\s+")


def token_count_expr(text_col):
    """Whitespace token count."""
    return F.size(tokens_expr(text_col))


def bpe_ish_token_count_expr(text_col):
    """Sub-word-ish token estimate: split on whitespace AND
    punctuation/digit boundaries (a cheap BPE-ish proxy: words plus
    punctuation marks count separately)."""
    return F.size(
        F.filter(
            F.split(
                F.col(text_col),
                r"(\s+|(?<=[\p{Punct}])|(?=[\p{Punct}]))",
            ),
            lambda t: t != "",
        ),
    )


def quality_score_exprs(text_col):
    """Heuristic quality signals (length, punctuation density, stopword
    ratio, mean word length, uppercase ratio) + a composite [0,1] score —
    the standard cheap pre-filters for LLM training corpora."""
    toks = tokens_expr(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    n_punct = n_chars - F.length(F.regexp_replace(text_col, r"[\.,!\?;:]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(text_col, r"[A-Z]", ""))
    en_stop = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(LANG_STOPWORDS["en"])),
    )
    mean_word_len = (
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
        / F.greatest(n_tokens, F.lit(1))
    )
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    upper_ratio = n_upper / F.greatest(n_chars, F.lit(1))
    stop_ratio = en_stop / F.greatest(n_tokens, F.lit(1))
    composite = (
        F.when(n_tokens < 5, 0.0)
        .when(mean_word_len < 2, 0.2)
        .when(mean_word_len > 12, 0.2)
        .otherwise(
            F.least(
                F.lit(1.0),
                0.4
                + 0.4 * F.least(stop_ratio * 3, F.lit(1.0))
                + 0.2 * (1 - F.least(punct_ratio * 5, F.lit(1.0))),
            ),
        )
    )
    return {
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "mean_word_len": mean_word_len,
        "punct_ratio": punct_ratio,
        "upper_ratio": upper_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": composite,
    }


def lang_scores_expr(text_col):
    """Per-language stopword-hit counts as a map expression."""
    toks = F.transform(tokens_expr(text_col), lambda t: F.lower(t))
    return F.create_map(
        *[
            x
            for lang, words in LANG_STOPWORDS.items()
            for x in (
                F.lit(lang),
                F.size(F.filter(toks, lambda t: t.isin(words))),
            )
        ],
    )


def lang_id_expr(text_col):
    """argmax language by stopword overlap; 'und' (undetermined) when no
    stopword hits at all."""
    toks = F.transform(tokens_expr(text_col), lambda t: F.lower(t))
    scores = F.array(
        *[
            F.struct(
                F.size(F.filter(toks, lambda t: t.isin(words))).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in LANG_STOPWORDS.items()
        ],
    )
    best = F.array_max(scores)
    return F.when(best["score"] <= 0, F.lit("und")).otherwise(best["lang"])


def fingerprint_expr(text_col):
    """Canonical content fingerprint: md5 of the case/whitespace
    normalized text (exact-dup key robust to formatting noise)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return F.md5(norm)


def rolling_fingerprint_expr(text_col, k: int = 8, keep: int = 4):
    """Winnowing-style robust fingerprint: the ``keep`` smallest
    xxhash64 values over the char k-gram stream, as an array (documents
    sharing most content share most of the sketch)."""
    grams = F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)), "
        f"i -> xxhash64(substring({text_col}, i, {k})))",
    )
    return F.slice(F.array_sort(F.array_distinct(grams)), 1, keep)


def build_vocabulary(
    df: DataFrame,
    text_col: str,
    min_count: int = 1,
    lowercase: bool = True,
    top_n: int = None,
) -> DataFrame:
    """Corpus vocabulary: (token, count, token_id) ordered by frequency
    (count desc, token asc — deterministic ids).  One explode + one
    groupBy; ids via a range-partitioned global row number
    (operators.rank) — no single-reducer window, so a billion-token
    vocabulary still ranks in parallel.  The classic first step of a
    tokenizer-training pipeline."""
    from woodwork_spark.operators.rank import global_row_number

    toks = tokens_expr(text_col)
    if lowercase:
        toks = F.transform(toks, lambda t: F.lower(t))
    counts = (
        df.select(F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
    )
    order = [F.desc("count"), F.asc("token")]
    if top_n:
        # bounded output: orderBy().limit() is TakeOrderedAndProject
        # (per-partition heaps, one job, no probe/persist), and the id
        # window runs over <= top_n rows — strictly cheaper than the
        # general distributed ranking for the common top-N vocabulary
        from pyspark.sql import Window as _W

        top = counts.orderBy(*order).limit(int(top_n))
        return top.withColumn(
            "token_id",
            F.row_number().over(_W.orderBy(*order)).cast("long") - 1,
        )
    return global_row_number(counts, order, out_col="token_id")


def filter_by_quality(
    df: DataFrame,
    text_col: str,
    min_score: float = 0.4,
    min_tokens: int = 5,
) -> DataFrame:
    """Corpus cleaning: drop documents below the quality-score/token
    thresholds (one filter projection, no shuffle)."""
    q = quality_score_exprs(text_col)
    return df.filter(
        (q["quality_score"] >= min_score) & (q["n_tokens"] >= min_tokens),
    )


def text_profile(df: DataFrame, text_col: str, id_col: str = None) -> DataFrame:
    """One-projection text profile: id, token counts, quality signals,
    language guess, fingerprint."""
    q = quality_score_exprs(text_col)
    cols = [F.col(id_col)] if id_col else []
    cols += [
        q["n_tokens"].alias("n_tokens"),
        q["n_chars"].alias("n_chars"),
        F.round(q["mean_word_len"], 4).alias("mean_word_len"),
        F.round(q["punct_ratio"], 4).alias("punct_ratio"),
        F.round(q["stopword_ratio"], 4).alias("stopword_ratio"),
        F.round(q["quality_score"], 4).alias("quality_score"),
        lang_id_expr(text_col).alias("lang_guess"),
        fingerprint_expr(text_col).alias("fingerprint"),
    ]
    return df.select(*cols)


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 128,
    stride: int = None,
) -> DataFrame:
    """Split documents into fixed-size token windows (the LLM-training
    chunking primitive): returns (id, chunk_id, chunk_text, n_tokens)
    with one row per window.

    ``stride`` (default = chunk_tokens, i.e. non-overlapping) < chunk
    size gives overlapping windows.  Pure array expressions: tokenize
    once, explode a sequence of window starts, slice + rejoin per window
    — the explode factor is ceil(n_tokens/stride), so output bytes are
    bounded by overlap, and no Python touches the text."""
    stride = chunk_tokens if stride is None else stride
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = tokens_expr(text_col)
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            (F.ceil((F.size(toks) - F.lit(chunk_tokens)) / F.lit(stride))).cast(
                "int",
            ),
            F.lit(0),
        ),
    )
    exploded = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.explode(starts).alias("__w"),
    )
    piece = F.slice(F.col("__toks"), F.col("__w") * stride + 1, chunk_tokens)
    return exploded.select(
        id_col,
        F.col("__w").cast("long").alias("chunk_id"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("long").alias("n_tokens"),
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lowercase: bool = True,
    extra_cols=(),
) -> DataFrame:
    """Per-document mean unigram log-probability — the classic cheap
    perplexity proxy for corpus quality scoring (low mean logprob =
    rare/garbled tokens; gibberish and boilerplate both stand out).

    Model and scorer come from the SAME corpus in one pipeline:
    explode -> token frequencies (map-side partial agg) -> join
    tokens->freq on the token key -> re-agg per document.  The join
    strategy is deliberately left to Catalyst/AQE: no broadcast hint
    (a web-scale vocabulary is itself huge — forcing broadcast would
    OOM executors at 100 TB) and no shuffle hint (at modest vocabulary
    sizes AQE's runtime stats correctly pick the broadcast).  The corpus
    token total is a single aggregate scalar (one tiny job), folded in
    as a literal so the per-token join row stays narrow.
    """
    toks = tokens_expr(text_col)
    if lowercase:
        toks = F.transform(toks, lambda t: F.lower(t))
    # persist the exploded tokens: the frequency agg, the total-collect
    # job, and the scoring join all consume them — without sharing, the
    # corpus tokenizes three times (same fix as minhash_dedup_pairs)
    tok = (
        df.select(id_col, *extra_cols, F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .persist()
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("__tf"))
    total = freq.agg(F.sum("__tf")).collect()[0][0] or 1
    out = (
        tok.join(freq, "token")
        .groupBy(id_col, *extra_cols)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(F.log(F.col("__tf") / F.lit(float(total)))).alias(
                "avg_logprob",
            ),
        )
    )
    # the cached token explode (~10x the corpus) rides on the result —
    # lifecycle.release(result) frees it once scores are materialized
    return attach_persisted(out, tok)


def tokenize_with_vocabulary(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocabulary: DataFrame = None,
    min_count: int = 1,
    top_n: int = None,
    lowercase: bool = True,
    oov_id: int = -1,
) -> DataFrame:
    """Apply a (token, token_id) vocabulary to the corpus — the second
    half of the tokenizer loop ``build_vocabulary`` starts: returns
    (id, token_ids array, n_tokens, n_oov), token order preserved,
    out-of-vocabulary tokens mapped to ``oov_id``.

    posexplode -> token-key join (strategy left to Catalyst/AQE: small
    vocabularies broadcast, web-scale ones shuffle-join co-partitioned
    with the vocabulary build) -> per-doc regroup; ordering is restored
    by array_sort over (pos, id) structs, not a window — no extra
    shuffle beyond the regroup, and no Python anywhere.
    """
    if vocabulary is None:
        vocabulary = build_vocabulary(
            df, text_col, min_count=min_count, lowercase=lowercase, top_n=top_n,
        )
    toks = tokens_expr(text_col)
    if lowercase:
        toks = F.transform(toks, lambda t: F.lower(t))
    tok = df.select(
        id_col, F.posexplode(toks).alias("pos", "token"),
    ).filter(F.col("token") != "")
    joined = tok.join(
        vocabulary.select("token", "token_id"), "token", "left",
    ).select(
        id_col,
        "pos",
        F.coalesce(F.col("token_id"), F.lit(oov_id)).alias("tid"),
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                lambda s: s["tid"],
            ).alias("token_ids"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("tid") == oov_id, 1).otherwise(0)).alias("n_oov"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lowercase: bool = True,
) -> DataFrame:
    """Per-document mean bigram conditional log-probability
    ln P(w_i | w_{i-1}) under the corpus's own MLE bigram model — a
    sharper perplexity proxy than ``unigram_logprob`` (it catches
    scrambled word ORDER, which unigram stats cannot see).

    Bigrams are built IN PLACE from the token array (``arrays_zip`` of
    the array with its shifted self) — no window function, no per-doc
    sort, no shuffle to form pairs; parallelism is per-document.  One
    persisted bigram explode feeds the bigram-count agg, the
    prefix-count agg, and the scoring join; both model aggregates are
    map-side-partial counts keyed on token hashes.  Join strategy is
    left to AQE (same web-scale-vocabulary reasoning as
    ``unigram_logprob``).  Documents with < 2 tokens score NULL.
    """
    toks = tokens_expr(text_col)
    if lowercase:
        toks = F.transform(toks, lambda t: F.lower(t))
    toks = F.filter(toks, lambda t: t != "")
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w1"),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w2"),
    )
    big = (
        df.select(id_col, F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .persist()
    )
    bcount = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__bc"))
    pcount = big.groupBy("w1").agg(F.count(F.lit(1)).alias("__pc"))
    scored = (
        big.join(bcount, ["w1", "w2"])
        .join(pcount, "w1")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg(F.log(F.col("__bc") / F.col("__pc"))).alias("avg_logprob"),
        )
    )
    out = df.select(id_col).distinct().join(scored, id_col, "left")
    return attach_persisted(out, big)


def pmi_cooccurrence(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_vocab: int = 1_000,
    min_pair_count: int = 5,
) -> DataFrame:
    """Pointwise mutual information of token pairs co-occurring in the
    same document — the corpus-analysis primitive behind collocation
    mining, topic coherence scoring, and embedding-free relatedness:
    ``pmi(a,b) = log(n_ab * N / (n_a * n_b))`` over document-level
    co-occurrence.

    Scale shape: documents collapse to DISTINCT (doc, token) pairs
    first (one map-side-combinable shuffle), the vocabulary is pruned
    to the ``top_vocab`` highest-document-frequency tokens via one
    tiny agg (broadcast semi-joined back — the pair blowup is bounded
    by the PRUNED per-doc distinct count, never raw text length), and
    the pair counts come from ONE doc-keyed self-join with ``a < b``.
    ``min_pair_count`` prunes the long singleton tail before it is
    ever materialized to the driver or sink.  N is the total document
    count of ``df`` (docs with no surviving token still count — PMI
    stays comparable across prune levels).

    Returns ``(token_a, token_b, n_pair, n_a, n_b, pmi)``.
    """
    if top_vocab < 2:
        raise ValueError("top_vocab must be >= 2")
    n_docs = df.count()
    pairs = (
        df.select(
            F.col(id_col).alias("__d"),
            F.explode(tokens_expr(text_col)).alias("__t"),
        )
        .where(F.col("__t") != "")
        .distinct()
    )
    vocab = (
        pairs.groupBy("__t")
        .agg(F.count(F.lit(1)).alias("__df"))
        .orderBy(F.col("__df").desc(), F.col("__t"))
        .limit(top_vocab)
    )
    kept = pairs.join(F.broadcast(vocab), "__t")
    left = kept.select(
        "__d", F.col("__t").alias("token_a"), F.col("__df").alias("n_a"),
    )
    right = kept.select(
        "__d", F.col("__t").alias("token_b"), F.col("__df").alias("n_b"),
    )
    co = (
        left.join(right, "__d")
        .where(F.col("token_a") < F.col("token_b"))
        .groupBy("token_a", "token_b")
        .agg(
            F.count(F.lit(1)).alias("n_pair"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
        .where(F.col("n_pair") >= min_pair_count)
    )
    return co.select(
        "token_a", "token_b", "n_pair", "n_a", "n_b",
        F.log(
            F.col("n_pair") * F.lit(n_docs)
            / (F.col("n_a") * F.col("n_b")),
        ).alias("pmi"),
    )


def zipf_fit(
    df: DataFrame,
    text_col: str,
    max_rank: int = 10_000,
    small_threshold: int = 100_000,
) -> DataFrame:
    """Zipf's-law fit of the corpus token-frequency distribution: the
    slope/intercept/R² of ``log(freq) ~ log(rank)`` over the top
    ``max_rank`` tokens — natural text sits near slope -1, and a corpus
    that drifts far from it (templated spam near 0, boilerplate floods
    below -1.5) fails the smell test before any model sees it.

    One token-count aggregation (map-side combinable), frequency ranks
    from the cardinality-aware distributed rank (no single-reducer
    window over a web-scale vocabulary), then ONE regression aggregate
    (``regr_slope``/``regr_intercept``/``regr_r2`` — JVM built-ins)
    over at most ``max_rank`` rows.

    Returns one row: ``(slope, intercept, r2, n_tokens, vocab_size)``
    where n_tokens counts all token occurrences and vocab_size the
    distinct tokens BEFORE the rank cut.
    """
    from woodwork_spark.lifecycle import attach_persisted, persisted_frames
    from woodwork_spark.operators.rank import global_row_number

    freqs = (
        df.select(F.explode(tokens_expr(text_col)).alias("__t"))
        .where(F.col("__t") != "")
        .groupBy("__t")
        .agg(F.count(F.lit(1)).alias("__f"))
    )
    ranked = global_row_number(
        freqs, [F.desc("__f"), F.asc("__t")], out_col="__r",
        small_threshold=small_threshold,
    )
    tots = ranked.agg(
        F.sum("__f").alias("__n_tok"),
        F.count(F.lit(1)).cast("long").alias("__vocab"),
    )
    top = ranked.where(F.col("__r") < max_rank)
    out = top.crossJoin(F.broadcast(tots)).agg(
        F.expr("regr_slope(log(cast(__f as double)), log(cast(__r as double) + 1.0))").alias("slope"),
        F.expr("regr_intercept(log(cast(__f as double)), log(cast(__r as double) + 1.0))").alias("intercept"),
        F.expr("regr_r2(log(cast(__f as double)), log(cast(__r as double) + 1.0))").alias("r2"),
        F.max("__n_tok").alias("n_tokens"),
        F.max("__vocab").alias("vocab_size"),
    )
    return attach_persisted(out, *persisted_frames(ranked))


def interp_logprob(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lam: float = 0.7,
    lowercase: bool = True,
) -> DataFrame:
    """Per-document mean INTERPOLATED bigram/unigram log-probability
    ``ln(lam * P(w2|w1) + (1-lam) * P(w2))`` under the corpus's own
    MLE models — the Jelinek-Mercer smoothing that keeps
    ``bigram_logprob`` from cratering on rare-but-valid continuations
    (a pure-MLE bigram model assigns unseen pairs nothing; the unigram
    floor keeps scores finite and comparable across domains).

    Shares ``bigram_logprob``'s shape: bigrams built in place with
    ``arrays_zip`` (no window, no per-doc sort), ONE persisted bigram
    explode feeding the bigram-count, prefix-count, and unigram-count
    aggregates plus the scoring join; join strategy left to AQE.
    Documents with < 2 tokens score NULL.
    """
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    toks = tokens_expr(text_col)
    if lowercase:
        toks = F.transform(toks, lambda t: F.lower(t))
    toks = F.filter(toks, lambda t: t != "")
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w1"),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w2"),
    )
    big = (
        df.select(id_col, F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .persist()
    )
    bcount = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__bc"))
    pcount = big.groupBy("w1").agg(F.count(F.lit(1)).alias("__pc"))
    # unigram model over bigram SECOND positions so both factors
    # normalize over the same event space (continuations)
    ucount = big.groupBy("w2").agg(F.count(F.lit(1)).alias("__uc"))
    tot = big.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        big.join(bcount, ["w1", "w2"])
        .join(pcount, "w1")
        .join(ucount, "w2")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg(
                F.log(
                    F.lit(float(lam)) * F.col("__bc") / F.col("__pc")
                    + F.lit(1.0 - float(lam)) * F.col("__uc") / F.col("__n"),
                ),
            ).alias("avg_logprob"),
        )
    )
    out = df.select(id_col).distinct().join(scored, id_col, "left")
    from woodwork_spark.lifecycle import attach_persisted

    return attach_persisted(out, big)


def readability_exprs(text_col):
    """Flesch-style readability signals as pure Column expressions: word
    count, sentence count (terminal punctuation runs), a syllable proxy
    (vowel groups per word — the standard dictionary-free estimate),
    and the Flesch reading-ease score
    ``206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)``.
    Everything stays in whole-stage codegen; one projection computes
    all four.
    """
    toks = tokens_expr(text_col)
    present = F.col(text_col).isNotNull()
    n_words = F.when(present, F.greatest(F.size(toks), F.lit(1)))
    n_sents = F.when(
        present,
        F.greatest(
            F.size(
                F.filter(
                    F.split(F.col(text_col), r"[.!?]+"),
                    lambda s: F.trim(s) != "",
                ),
            ),
            F.lit(1),
        ),
    )
    # vowel groups across the text, floored at one per word; NULL text
    # propagates NULL (size(NULL) is -1 and would otherwise fabricate a
    # definite score of ~121.22 for missing documents)
    n_syll = F.when(
        present,
        F.greatest(
            F.size(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"[^aeiouy]+"),
                    lambda s: s != "",
                ),
            ),
            F.greatest(F.size(toks), F.lit(1)),
        ),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words / n_sents)
        - F.lit(84.6) * (n_syll / n_words)
    )
    return {
        "n_words": n_words,
        "n_sentences": n_sents,
        "n_syllables": n_syll,
        "flesch": flesch,
    }


def ngram_novelty(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    use_words: bool = True,
) -> DataFrame:
    """Per-document n-gram novelty: of the doc's DISTINCT n-grams, the
    fraction that appear in NO other document — high novelty marks
    informative, one-of-a-kind text; low novelty marks templated /
    memorization-prone content even when no single document is a
    near-duplicate (the signal :func:`~woodwork_spark.operators.dedup.
    minhash_dedup_pairs` can't see because it needs a pairwise match).

    Shape: the same explode-and-count skeleton as vocabulary building —
    grams hash to 8-byte longs BEFORE the shuffle, one distinct-doc
    count per gram, one join back, one per-doc aggregate.  Linear in
    corpus gram count; no pairwise anything.

    Returns ``(id_col, n_grams, n_novel, novelty)`` with ``novelty =
    n_novel / n_grams``.  Docs shorter than ``n`` tokens contribute one
    truncated gram (the whole doc) per :func:`~woodwork_spark.operators.
    dedup.word_shingles_expr`; NULL/empty text yields zero grams and
    NULL novelty.
    """
    from woodwork_spark.lifecycle import attach_persisted
    from woodwork_spark.operators.dedup import shingles_expr

    grams = F.array_distinct(
        shingles_expr(text_col, n, use_words=use_words),
    )
    exploded = (
        df.filter(
            F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""),
        )
        .select(F.col(id_col), F.explode(grams).alias("__g"))
        # a NULL/empty text row would otherwise surface one NULL gram
        .filter(F.col("__g").isNotNull())
        # double 64-bit key (independent seeds), same as repeated_spans:
        # a single xxhash64 collides at corpus scale (~n^2/2^65) and a
        # collision silently marks a unique gram non-novel
        .withColumn("__k", F.xxhash64("__g"))
        .withColumn("__k2", F.xxhash64(F.lit("ww-novel-2"), "__g"))
        .drop("__g")
        .persist()
    )
    docs_per_gram = exploded.groupBy("__k", "__k2").agg(
        F.count_distinct(id_col).alias("__docs"),
    )
    per_doc = (
        exploded.join(docs_per_gram, ["__k", "__k2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("__docs") == 1).cast("long")).alias("n_novel"),
        )
        .withColumn(
            "novelty",
            F.col("n_novel").cast("double") / F.col("n_grams").cast("double"),
        )
    )
    out = (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            "novelty",
        )
    )
    return attach_persisted(out, exploded)


def hashed_term_vectors(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 256,
    lowercase: bool = True,
    l2_normalize: bool = False,
    out_col: str = "vector",
) -> DataFrame:
    """Feature-hashing (hashing-trick) term vectors: each doc becomes a
    fixed ``dim``-wide dense count vector with bucket ``md5(token) mod
    dim`` — no vocabulary pass, no id assignment, any engine computes
    the identical bucket (the md5-prefix trick, engine-portable unlike
    xxhash).  The classic featurization when you need fixed-width
    vectors for cosine search / linear probes without paying
    :func:`build_vocabulary`'s global rank.

    Shape: one explode to (doc, bucket) + one count agg + one per-doc
    map regroup; vector assembly is a pure ``transform`` over
    ``sequence(0, dim-1)`` against the bucket-count map — vocabulary
    shuffle shape, and the dense output is exactly ``dim`` doubles per
    doc regardless of text length.

    Returns ``(id_col, out_col array<double>, n_tokens)``; NULL/empty
    text yields the zero vector with ``n_tokens = 0``.
    """
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    toks = tokens_expr(text_col)
    if lowercase:
        toks = F.transform(toks, lambda t: F.lower(t))
    bucket = lambda t: F.pmod(
        F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
        F.lit(int(dim)),
    )
    counts = (
        df.select(F.col(id_col), F.explode(toks).alias("__t"))
        .filter(F.col("__t") != "")
        .groupBy(id_col, bucket(F.col("__t")).alias("__b"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    per_doc = counts.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("__b", "__c")),
        ).alias("__m"),
        F.sum("__c").alias("n_tokens"),
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(int(dim) - 1)),
        lambda b: F.coalesce(
            F.element_at(F.col("__m"), b).cast("double"), F.lit(0.0),
        ),
    )
    assembled = (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.when(F.col("__m").isNull(), F.array_repeat(F.lit(0.0), dim))
            .otherwise(vec)
            .alias(out_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        )
    )
    if l2_normalize:
        # the norm is an O(dim) aggregate — materialize it as its OWN
        # column first: inlining it in the normalize lambda would
        # re-evaluate it per element (O(dim^2) per row; CollapseProject
        # keeps non-cheap multi-referenced aliases un-inlined)
        v = F.col(out_col)
        assembled = (
            assembled.withColumn(
                "__norm",
                F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)),
            )
            .withColumn(
                out_col,
                F.transform(
                    v,
                    lambda x: F.when(
                        F.col("__norm") > 0, x / F.col("__norm"),
                    ).otherwise(F.lit(0.0)),
                ),
            )
            .drop("__norm")
        )
    return assembled


def heaps_fit(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: reading the corpus in
    ``id_col`` order, the distinct-token count grows ~ ``K * N^beta``
    with N the running token total — ``beta`` is the planning number
    for "how much NEW vocabulary will the next 10x of data bring"
    (tokenizer sizing, OOV forecasting, dedup saturation).

    Distributed construction with NO sequential scan:

    1. one token explode -> per-doc token counts AND per-token first
       document (``min(doc)`` — one grouped agg each);
    2. the running totals ``N_d`` and vocabulary ``V_d`` at every doc
       are two INCLUSIVE range-partitioned prefix sums (first-seen
       counts per doc join null-safely onto the doc list);
    3. the log-log OLS slope/intercept folds from one aggregate over
       the (doc, N_d, V_d) points — closed form, no iteration.

    Returns one row: ``(n_docs, total_tokens, vocab, beta, k)``;
    ``beta``/``k`` null with < 2 docs (no slope from one point).
    Empty-token docs still advance the doc axis.  Null ids/texts are
    excluded.
    """
    from .rank import global_prefix_sums

    base = df.filter(
        F.col(id_col).isNotNull() & F.col(text_col).isNotNull(),
    ).select(F.col(id_col).alias("__doc"), F.col(text_col).alias("__text"))
    # split('') yields [''] — drop zero-length phantoms so empty or
    # whitespace-only docs contribute N += 0 (and '' never enters the
    # vocabulary); such docs still advance the doc axis via the left join
    toks = base.select(
        "__doc", F.explode(tokens_expr("__text")).alias("__tok"),
    ).where(F.length("__tok") > 0).persist()
    per_doc = base.join(
        toks.groupBy("__doc").agg(F.count(F.lit(1)).alias("__nt")),
        "__doc", "left",
    ).select(
        "__doc", F.coalesce("__nt", F.lit(0)).alias("__nt"),
    )
    firsts = (
        toks.groupBy("__tok").agg(F.min("__doc").alias("__doc"))
        .groupBy("__doc").agg(F.count(F.lit(1)).alias("__nv"))
    )
    staged = per_doc.join(firsts, "__doc", "left").select(
        "__doc", "__nt", F.coalesce("__nv", F.lit(0)).alias("__nv"),
    )
    ranked = global_prefix_sums(
        staged, [F.asc("__doc")], ["__nt", "__nv"],
        out_cols=["__N", "__V"], inclusive=True,
    )
    pts = ranked.filter((F.col("__N") > 0) & (F.col("__V") > 0)).select(
        F.log(F.col("__N").cast("double")).alias("__x"),
        F.log(F.col("__V").cast("double")).alias("__y"),
    )
    agg = pts.agg(
        F.count(F.lit(1)).alias("__m"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
    )
    tot = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.max("__N").cast("long").alias("total_tokens"),
        F.max("__V").cast("long").alias("vocab"),
    )
    m = F.col("__m").cast("double")
    denom = F.col("__sxx") - F.col("__sx") * F.col("__sx") / m
    beta = F.when(
        (m > 1) & (denom > 0),
        (F.col("__sxy") - F.col("__sx") * F.col("__sy") / m) / denom,
    )
    out = tot.crossJoin(F.broadcast(agg)).select(
        "n_docs", "total_tokens", "vocab",
        beta.alias("beta"),
        F.exp(F.col("__sy") / m - beta * (F.col("__sx") / m)).alias("k"),
    )
    return attach_persisted(out, toks, *persisted_frames(ranked))


def vocabulary_coverage(
    df: DataFrame,
    text_col: str,
    lowercase: bool = True,
) -> DataFrame:
    """Good-Turing / Chao1 vocabulary-coverage estimate: how much of the
    corpus's type space has the crawl already seen — the "is more data
    still buying new vocabulary" readout behind Heaps-law curves.

    From the token-frequency spectrum alone: ``n1``/``n2`` (singleton /
    doubleton type counts), the Good-Turing unseen-mass estimate
    ``P(next token is a new type) = n1 / N``, its complement coverage,
    and the bias-corrected Chao1 richness floor
    ``V + n1 (n1 - 1) / (2 (n2 + 1))`` (estimated total types
    including the never-seen).

    One explode -> one token groupBy (map-side combinable; the shuffle
    carries (token, count)) -> ONE fold over the spectrum.  Returns one
    row: ``(n_tokens, n_types, n1, n2, gt_unseen_mass, coverage,
    chao1_types)``.
    """
    toks = tokens_expr(text_col)
    if lowercase:
        toks = F.transform(toks, lambda t: F.lower(t))
    counts = (
        df.select(F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    agg = counts.agg(
        F.sum("__c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum((F.col("__c") == 1).cast("long")).cast("long").alias("n1"),
        F.sum((F.col("__c") == 2).cast("long")).cast("long").alias("n2"),
    )
    n1d = F.col("n1").cast("double")
    unseen = F.when(
        F.col("n_tokens") > 0, n1d / F.col("n_tokens"),
    )
    return agg.select(
        "n_tokens", "n_types", "n1", "n2",
        unseen.alias("gt_unseen_mass"),
        (F.lit(1.0) - unseen).alias("coverage"),
        F.when(
            F.col("n_tokens") > 0,
            F.col("n_types")
            + n1d * (n1d - 1.0) / (2.0 * (F.col("n2").cast("double") + 1.0)),
        ).alias("chao1_types"),
    )


def span_corruption(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_len: int = 3,
    mask_rate: float = 0.15,
    seed: int = 0,
    mask_expr=None,
    input_col: str = "input_text",
    target_col: str = "target_text",
) -> DataFrame:
    """T5-style span-corruption data prep (Raffel et al. 2020): split
    each document into consecutive ``block_len``-token blocks, mask a
    deterministic ``mask_rate`` fraction of blocks, and emit the
    denoising pair — ``input_col`` with each masked block replaced by
    its ordinal sentinel ``<extra_id_K>`` (K counts masked blocks
    within the document, 0-based, in order), ``target_col`` as the
    concatenation ``<extra_id_K> masked tokens ...`` — the standard
    span-corruption objective layout.

    Masking is HASH-derived, not RNG-state-derived: block ``b`` of a
    document masks iff ``xxhash64(id, b, seed) % 1e6 < mask_rate *
    1e6``, so the corpus re-derives identically on retry/recompute (a
    shuffled-RNG mask would silently differ across task re-executions
    — the same reason every sampler in this repo keys on hashes).
    ``mask_expr`` overrides the decision with any ``(id_column,
    block_index_column) -> boolean Column`` (e.g. an arithmetic rule
    another engine can replay exactly).

    Scale shape: ZERO shuffles and zero Python — tokens, blocks, and
    the sentinel fold are one projection of array expressions
    (``transform`` + ``aggregate`` run inside the JVM per row; state is
    one document's tokens).  Block boundaries never span documents, so
    the operator is embarrassingly parallel.  NULL text yields NULL
    pairs; documents shorter than one block pass through unmasked when
    their single block misses the rate.
    """
    if block_len < 1:
        raise ValueError(f"block_len must be >= 1, got {block_len}")
    if not (0.0 <= mask_rate <= 1.0):
        raise ValueError(f"mask_rate must be in [0, 1], got {mask_rate}")
    if mask_expr is None:
        cut = int(round(mask_rate * 1_000_000))

        def mask_expr(idc, b):
            return F.pmod(
                F.xxhash64(idc, b, F.lit(int(seed))), F.lit(1_000_000),
            ) < F.lit(cut)

    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != "",
    )
    n = F.size(toks)
    nb = F.ceil(n / F.lit(block_len)).cast("int")

    def sentinel(k):
        return F.concat(
            F.lit("<extra_id_"), k.cast("string"), F.lit(">"),
        )

    blocks = F.when(n > 0, F.transform(
        F.sequence(F.lit(0), nb - 1),
        lambda b: F.struct(
            mask_expr(F.col(id_col), b).alias("m"),
            F.slice(toks, b * block_len + 1, block_len).alias("t"),
        ),
    )).otherwise(F.array().cast("array<struct<m:boolean,t:array<string>>>"))
    zero = F.struct(
        F.lit(0).alias("k"),
        F.array().cast("array<string>").alias("inp"),
        F.array().cast("array<string>").alias("tgt"),
    )
    folded = F.aggregate(
        blocks,
        zero,
        lambda a, blk: F.struct(
            (a["k"] + blk["m"].cast("int")).alias("k"),
            F.when(
                blk["m"],
                F.concat(a["inp"], F.array(sentinel(a["k"]))),
            ).otherwise(F.concat(a["inp"], blk["t"])).alias("inp"),
            F.when(
                blk["m"],
                F.concat(a["tgt"], F.array(sentinel(a["k"])), blk["t"]),
            ).otherwise(a["tgt"]).alias("tgt"),
        ),
    )
    return df.withColumns({
        input_col: F.when(
            F.col(text_col).isNotNull(),
            F.array_join(folded["inp"], " "),
        ),
        target_col: F.when(
            F.col(text_col).isNotNull(),
            F.array_join(folded["tgt"], " "),
        ),
    })


def token_budget_report(
    df: DataFrame,
    text_col: str,
    group_col: str = None,
) -> DataFrame:
    """Per-group (usually per-language or per-source) token budget — the
    first number a 100 TB pretraining-mix discussion needs: document
    and token mass per group, characters per token (tokenizer-fertility
    proxy: CJK and code skew low/high), tokens per document, and each
    group's share of the corpus's total tokens.

    ``ws_tokens`` is the whitespace count (engine-portable);
    ``bpe_ish_tokens`` adds the punctuation-splitting proxy
    (:func:`bpe_ish_token_count_expr` — Java-regex lookaround, NOT
    reproducible in RE2-based engines, so budget gates should key on it
    only when the whole pipeline is Spark).  NULL texts are counted in
    ``n_null`` and contribute nothing else; with ``group_col=None`` the
    report is a single corpus row (group NULL).

    Shape: ONE map-side-combinable aggregation plus a one-row broadcast
    cross join for the corpus share — shuffle scales with group
    cardinality.
    """
    g = (
        F.col(group_col) if group_col
        else F.lit(None).cast("string")
    )
    base = df.select(
        g.alias("group"),
        F.col(text_col).alias("__t"),
        token_count_expr(text_col).alias("__wt"),
        bpe_ish_token_count_expr(text_col).alias("__bt"),
    )
    per = base.groupBy("group").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("__t").isNull().cast("long")).alias("n_null"),
        F.sum(F.coalesce(F.length("__t"), F.lit(0))).cast("long")
        .alias("n_chars"),
        F.sum(F.coalesce(F.col("__wt"), F.lit(0))).cast("long")
        .alias("ws_tokens"),
        F.sum(F.coalesce(F.col("__bt"), F.lit(0))).cast("long")
        .alias("bpe_ish_tokens"),
    )
    tot = per.agg(F.sum("ws_tokens").alias("__tot"))
    return per.crossJoin(F.broadcast(tot)).select(
        "group", "n_docs", "n_null", "n_chars", "ws_tokens",
        "bpe_ish_tokens",
        F.when(
            F.col("ws_tokens") > 0,
            F.col("n_chars").cast("double") / F.col("ws_tokens"),
        ).alias("chars_per_token"),
        (
            F.col("ws_tokens").cast("double")
            / F.greatest(F.col("n_docs") - F.col("n_null"), F.lit(1))
        ).alias("tokens_per_doc"),
        F.when(
            F.col("__tot") > 0,
            F.col("ws_tokens").cast("double") / F.col("__tot"),
        ).alias("token_share"),
    )


def fim_transform(
    df: DataFrame,
    text_col: str,
    id_col: str,
    mode: str = "psm",
    seed: int = 0,
    cut_exprs=None,
    out_col: str = "fim_text",
) -> DataFrame:
    """Fill-in-the-middle transformation for code/infilling pretraining
    (Bavarian et al. 2022): split each document at two character
    positions into (prefix, middle, suffix) and emit the sentinel
    layout — PSM ``<fim_prefix>P<fim_suffix>S<fim_middle>M`` or SPM
    ``<fim_prefix><fim_suffix>S<fim_middle>P M``-style reordering
    (``mode="spm"``: suffix first, then prefix, then middle — the
    variant that trains suffix-conditioned completion).

    Cut points are HASH-derived (``xxhash64(id, k, seed)`` modulo
    length+1, ordered), so the corpus re-derives identically on
    recompute — the same determinism argument as
    :func:`span_corruption`.  ``cut_exprs`` overrides with two
    ``(id_column, length_column) -> position Column`` callables (e.g.
    plain modular arithmetic another engine replays exactly); positions
    clamp into ``[0, len]`` and order themselves.  NULL text yields
    NULL; character-level splitting is deliberate (the published FIM
    recipe splits raw text so the model learns token-boundary-free
    joins).

    One projection, zero shuffles, zero Python.
    """
    if mode not in ("psm", "spm"):
        raise ValueError(f"mode must be psm or spm, got {mode!r}")
    t = F.col(text_col)
    n = F.length(t)
    if cut_exprs is None:
        def c1(idc, ln):
            return F.pmod(F.xxhash64(idc, F.lit(1), F.lit(int(seed))),
                          ln + 1)

        def c2(idc, ln):
            return F.pmod(F.xxhash64(idc, F.lit(2), F.lit(int(seed))),
                          ln + 1)
        cut_exprs = (c1, c2)
    a = F.least(F.greatest(cut_exprs[0](F.col(id_col), n), F.lit(0)), n)
    b = F.least(F.greatest(cut_exprs[1](F.col(id_col), n), F.lit(0)), n)
    p1, p2 = F.least(a, b), F.greatest(a, b)
    prefix = F.substring(t, 1, p1)
    middle = F.substring(t, p1 + 1, p2 - p1)
    suffix = F.substring(t, p2 + 1, n - p2)
    if mode == "psm":
        fim = F.concat(
            F.lit("<fim_prefix>"), prefix,
            F.lit("<fim_suffix>"), suffix,
            F.lit("<fim_middle>"), middle,
        )
    else:
        fim = F.concat(
            F.lit("<fim_suffix>"), suffix,
            F.lit("<fim_prefix>"), prefix,
            F.lit("<fim_middle>"), middle,
        )
    return df.withColumn(
        out_col, F.when(t.isNotNull(), fim),
    )


def hashed_token_features(
    df: DataFrame,
    text_col: str,
    k: int = 16,
    prefix: str = "f",
    hash_fn: str = "md5",
    ngram: int = 1,
) -> DataFrame:
    """Feature-hashed token frequencies — the fastText featurization:
    bucket ``b(t) = hash(lower(token)) mod k``, feature ``j`` = the
    share of the document's tokens landing in bucket ``j``.  Fixed
    width regardless of vocabulary (no fit, no dictionary, no OOV),
    and pure array expressions: ONE projection computes the bucket
    array once and folds the k shares — no explode, no shuffle, no
    UDF, so at 100 TB featurization rides the scan.

    ``hash_fn='md5'`` (default) uses the portable 60-bit md5 prefix
    (:func:`~woodwork_spark.operators.dedup.simhash_expr` convention:
    ``('0x'||substr(md5(t),1,15))::BIGINT`` reproduces it in DuckDB);
    ``'xxhash64'`` is the faster JVM-only path.  Adds columns
    ``{prefix}0 .. {prefix}{k-1}``; empty tokens are filtered before
    hashing (Spark's ``split('', '\\s+')`` yields ``['']``), so
    empty / whitespace-only documents genuinely get all-zero
    features; NULL text yields NULL features (nothing to hash —
    distinct from "no tokens", and preserved rather than imputed).

    ``ngram > 1`` hashes token n-grams (space-joined windows of n
    consecutive tokens — the word-order signal unigram bags lose);
    documents with fewer than n tokens get all-zero features.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if ngram < 1:
        raise ValueError(f"ngram must be >= 1, got {ngram}")
    if hash_fn == "md5":
        tok_hash = "cast(conv(substring(md5({t}), 1, 15), 16, 10) as bigint)"
    elif hash_fn == "xxhash64":
        tok_hash = "xxhash64({t})"
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    toks = (
        f"filter(split(trim(lower({text_col})), '\\\\s+'), t -> t != '')"
    )
    if ngram == 1:
        buckets = F.expr(
            f"transform({toks}, "
            f"t -> pmod({tok_hash.format(t='t')}, {int(k)}))",
        )
    else:
        n = int(ngram)
        gram = "concat_ws(' ', slice(ts, i, {n}))".format(n=n)
        # bind the token array ONCE via the array-wrapper trick (the
        # simhash_expr convention) so the split is not re-evaluated
        # per n-gram position
        buckets = F.expr(
            f"transform(array({toks}), ts -> "
            f"IF(size(ts) >= {n}, "
            f"transform(sequence(1, size(ts) - {n} + 1), "
            f"i -> pmod({tok_hash.format(t=gram)}, {int(k)})), "
            f"cast(array() as array<bigint>)))[0]",
        )
    tmp = df.withColumn("__hb", buckets)
    n = F.size(F.col("__hb"))

    def _eq(j):
        # a plain 1-arg lambda per bucket: a 2-arg lambda would make
        # the higher-order filter pass the ARRAY INDEX as the second
        # argument, shadowing the bucket id
        return lambda b: b == F.lit(j)

    feats = [
        (
            F.size(F.filter(F.col("__hb"), _eq(j)))
            / F.greatest(n, F.lit(1))
        ).alias(f"{prefix}{j}")
        for j in range(int(k))
    ]
    return tmp.select(*df.columns, *feats)


def quality_classifier_fit(
    df: DataFrame,
    text_col: str,
    label_col: str,
    k: int = 16,
    group_cols=(),
    iters: int = None,
    ridge_lambda: float = 0.0,
    hash_fn: str = "md5",
    solver: str = "auto",
) -> DataFrame:
    """fastText-shaped linear quality classifier, trained WHOLLY
    in-plan: feature-hashed token shares (:func:`hashed_token_features`)
    feed the unrolled-Cholesky logistic IRLS of
    :func:`~woodwork_spark.operators.regression.logistic_fit` — no
    driver math, no collect, one aggregate per Newton round.  The
    trainable member of the quality-filter family next to the
    rule-based gopher/C4 heuristics (cleaning.gopher_rules_exprs).

    Covariates are buckets ``0 .. k-2`` — the shares of all k buckets
    sum to 1 on every non-empty document, so the full set is collinear
    with the intercept; dropping the last bucket is the standard
    reference-level coding.  ``ridge_lambda > 0`` keeps
    perfectly-separable labels finite.  Returns the wide fit frame
    (``coef_{prefix}{j}`` per bucket); score new text with
    :func:`quality_classifier_predict`.

    ``solver``: "exact" is the unrolled-Cholesky IRLS (full Wald
    readout, ``k - 1 <= ~32`` — the in-plan solve renders O(k^2)
    named projections); "diag" is
    :func:`~woodwork_spark.operators.regression.logistic_fit_diag`,
    diagonal-scaled IRLS with O(k) aggregate state per round — the
    path for a real fastText-shaped filter at k in the hundreds
    (coefficients + loglik, no standard errors; ``iters=None`` takes
    the solver's own default — 6 Newton rounds exact, 24 diagonal
    rounds diag — and a zero ridge is raised to 1.0 on the diag path
    because wide hashed designs are near-separable by construction).
    "auto" (default) picks exact for ``k - 1 <= 32``, else diag — so
    small-k callers keep the full inference readout unchanged.
    """
    from woodwork_spark.operators.regression import (
        logistic_fit,
        logistic_fit_diag,
    )

    if solver not in ("auto", "exact", "diag"):
        raise ValueError(f"unknown solver {solver!r}")
    if solver == "auto":
        solver = "exact" if int(k) - 1 <= 32 else "diag"
    # note: fanning the scan out before featurization was measured a
    # net LOSS here (r12: 10.4 s vs 5.7 s solo at sf0.1) — the IRLS
    # rounds over the cached feature frame dominate, and the extra
    # exchange + wider cache slowed every round's re-scan
    feats = hashed_token_features(
        df, text_col, k=k, prefix="__qf", hash_fn=hash_fn,
    )
    xcols = [f"__qf{j}" for j in range(int(k) - 1)]
    if solver == "diag":
        out = logistic_fit_diag(
            feats, label_col, xcols, group_cols,
            iters=24 if iters is None else int(iters),
            ridge_lambda=ridge_lambda if ridge_lambda > 0 else 1.0,
        )
    else:
        out = logistic_fit(
            feats, label_col, xcols, group_cols,
            iters=6 if iters is None else int(iters),
            ridge_lambda=ridge_lambda,
        )
    # the model frame names carry the internal prefix; surface them as
    # bucket names a caller can read (re-attaching the fit's persisted
    # base frame — the rename select would otherwise drop it and leak)
    from woodwork_spark.lifecycle import attach_persisted, persisted_frames

    ren = {}
    for c in out.columns:
        ren[c] = c.replace("__qf", "f")
    res = out.select(*[F.col(c).alias(n) for c, n in ren.items()])
    return attach_persisted(res, *persisted_frames(out))


def quality_classifier_predict(
    df: DataFrame,
    model: DataFrame,
    text_col: str,
    k: int = 16,
    group_cols=(),
    out_col: str = "quality_prob",
    hash_fn: str = "md5",
) -> DataFrame:
    """Score text with a :func:`quality_classifier_fit` model: hash the
    same k-bucket features and apply
    :func:`~woodwork_spark.operators.regression.glm_predict` — one
    projection + one broadcast join of the model-sized frame on top of
    the scan.  Must be called with the SAME ``k``/``hash_fn`` the fit
    used."""
    from woodwork_spark.operators.regression import glm_predict

    feats = hashed_token_features(
        df, text_col, k=k, prefix="f", hash_fn=hash_fn,
    )
    xcols = [f"f{j}" for j in range(int(k) - 1)]
    out = glm_predict(
        feats, model, xcols, group_cols=group_cols, family="logistic",
        out_col=out_col,
    )
    return out.drop(*[f"f{j}" for j in range(int(k))])
