"""Distributed BPE (byte-pair-encoding) merge learning.

The classic tokenizer-training loop — count adjacent symbol pairs over
the corpus, merge the most frequent pair, repeat — re-expressed for
Spark's execution model:

- The corpus collapses to a WEIGHTED WORD VOCABULARY first (one explode
  + groupBy): pair statistics over 100 TB of text are identical to pair
  statistics over its distinct words weighted by count, and the word
  vocabulary is orders of magnitude smaller than the corpus.
- Each word's symbol state is a single FRAMED STRING
  (``\\x1f sym \\x1f\\x1f sym \\x1f``): applying a merge is one JVM
  ``replace`` of ``␟a␟␟b␟`` with ``␟ab␟`` — left-to-right,
  non-overlapping, exactly the classic greedy merge order — instead of
  a per-row Python loop or an array fold.  Pair counting splits the
  frame back into symbols and zips adjacent pairs; everything stays in
  whole-stage codegen.
- Each iteration runs ONE small aggregation (pair counts over the
  vocabulary) and ONE map (the replace); the winning pair — count desc,
  then lexicographic — is the only thing the driver sees.  Lineage is
  truncated per round with an eager localCheckpoint (same discipline as
  the connected-components loop in operators/dedup.py), so k merges
  never build a k-deep nested plan.

``bpe_apply`` tokenizes text with the learned ranked merges via an
Arrow-batched ``mapInPandas`` (per-word memoization inside each task);
tokenization of new text is inherently per-document work, and the
Python loop touches each DISTINCT word once per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from woodwork_spark.operators.scale import local_rows_df

SEP = "\x1f"


def _framed(word_col):
    chars = F.expr(f"filter(split({word_col}, ''), x -> x != '')")
    return F.concat(
        F.lit(SEP), F.array_join(chars, SEP + SEP), F.lit(SEP),
    )


def _syms_expr(framed_col: str):
    return F.expr(
        f"split(trim(BOTH '{SEP}' FROM {framed_col}), '{SEP}{SEP}')",
    )


def bpe_learn(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    lowercase: bool = True,
    min_count: int = 2,
    token_pattern: str = None,
) -> DataFrame:
    """Learn ``num_merges`` BPE merge rules from a text column.

    Returns a small DataFrame ``(rank, left, right, pair_count)`` in
    merge order.  Stops early when no pair reaches ``min_count``.
    ``token_pattern`` (e.g. ``"^[a-z]+$"``) optionally restricts the
    word vocabulary — the standard move to keep symbol alphabets clean.
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    text = F.col(text_col)
    if lowercase:
        text = F.lower(text)
    toks = F.explode(F.split(F.trim(text), r"\s+")).alias("w")
    words = df.select(toks).where(F.col("w") != "")
    if token_pattern:
        words = words.where(F.col("w").rlike(token_pattern))
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(_framed("w").alias("s"), "cnt")
        .localCheckpoint(eager=True)
    )
    merges = []
    cur = vocab
    for rank in range(num_merges):
        pairs = (
            cur.withColumn("__syms", _syms_expr("s"))
            .select(
                F.explode(
                    F.expr(
                        "filter(zip_with(__syms, "
                        "slice(__syms, 2, greatest(size(__syms) - 1, 0)), "
                        "(x, y) -> struct(x AS a, y AS b)), "
                        "p -> p.b IS NOT NULL)",
                    ),
                ).alias("p"),
                "cnt",
            )
            .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "cnt")
            .groupBy("a", "b")
            .agg(F.sum("cnt").alias("c"))
        )
        best = (
            pairs.orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < min_count:
            break
        a, b, c = best[0]["a"], best[0]["b"], best[0]["c"]
        merges.append((rank, a, b, int(c)))
        cur = cur.select(
            F.replace(
                "s",
                F.lit(SEP + a + SEP + SEP + b + SEP),
                F.lit(SEP + a + b + SEP),
            ).alias("s"),
            "cnt",
        ).localCheckpoint(eager=True)
    spark = df.sparkSession
    return local_rows_df(spark, 
        merges, "rank long, left string, right string, pair_count long",
    )


def bpe_apply(
    df: DataFrame,
    text_col: str,
    merges: DataFrame,
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize ``text_col`` with learned ranked merges: whitespace
    pre-split, then per-word greedy merge application in rank order —
    the standard BPE encode.  Arrow-batched ``mapInPandas`` with a
    per-batch word memo (each distinct word is encoded once per batch);
    the ranked merge list (small by construction) is a broadcast-sized
    plain list."""
    ranked = [
        (r["left"], r["right"])
        for r in merges.orderBy("rank").collect()
    ]
    rank_of = {pair: i for i, pair in enumerate(ranked)}
    cols = df.columns

    def encode_word(word, memo):
        if word in memo:
            return memo[word]
        syms = list(word)
        while len(syms) > 1:
            # lowest-rank applicable pair, leftmost-first application
            cand = None
            for i in range(len(syms) - 1):
                rk = rank_of.get((syms[i], syms[i + 1]))
                if rk is not None and (cand is None or rk < cand[0]):
                    cand = (rk, i)
            if cand is None:
                break
            rk, _ = cand
            a, b = ranked[rk]
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        memo[word] = syms
        return syms

    def fn(batches):
        for pdf in batches:
            memo = {}
            toks = []
            for t in pdf[text_col].astype(object):
                if t is None:
                    toks.append(None)
                    continue
                s = t.lower() if lowercase else t
                words = s.split()
                enc = []
                for w in words:
                    enc.extend(encode_word(w, memo))
                toks.append(enc)
            pdf = pdf.copy()
            pdf[out_col] = toks
            yield pdf

    from pyspark.sql import types as T

    # build a FRESH StructType: StructType.add mutates in place, and
    # df.schema hands back the frame's cached schema object
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.StringType()))],
    )
    return df.mapInPandas(fn, schema=schema)


def unigram_viterbi_tokenize(
    df: DataFrame,
    word_col: str,
    vocab: dict,
    unk_logp: float = -20.0,
    max_piece_len: int = 8,
) -> DataFrame:
    """Unigram-LM (SentencePiece-style) Viterbi segmentation: split each
    word into the vocabulary pieces maximizing the summed log
    probability, with single-character UNK fallback at ``unk_logp`` so
    every word segments.  The BPE pair (:func:`bpe_learn` /
    :func:`bpe_apply`) covers merge-based tokenizers; this adds the
    unigram-model member the modern tokenizer stacks standardize on.

    The DP is inherently sequential per word (best[i] depends on
    best[i-L]) — the documented pandas-UDF exception class — and runs
    as ONE Arrow-batched UDF with the vocabulary captured in the
    closure (tokenizer vocabs are driver-side artifacts; Spark
    broadcasts the closure to executors once).  Ties prefer the LONGEST
    piece, so segmentations are deterministic and engine-replayable —
    the harness oracle replays the same DP with a recursive CTE
    (forward scores + backtrace), score arithmetic being sums of the
    same literal doubles.

    Appends ``piece_str`` ('|'-joined pieces) and ``logp`` to the
    input.  Null/empty words yield NULL piece_str and logp.

    Scale: embarrassingly parallel over rows; O(len * max_piece_len)
    per word with dict lookups — the classic tokenizer inner loop.
    """
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    if max_piece_len < 1:
        raise ValueError("max_piece_len must be >= 1")
    vocab = dict(vocab)
    unk = float(unk_logp)
    mpl = int(max_piece_len)

    @pandas_udf("struct<piece_str: string, logp: double>")
    def _seg(words):
        outs, outl = [], []
        for w in words:
            if w is None or len(w) == 0:
                outs.append(None)
                outl.append(None)
                continue
            n = len(w)
            best = [0.0] + [None] * n
            back = [0] * (n + 1)
            for i in range(1, n + 1):
                bs, bl = None, 0
                for ln in range(1, min(mpl, i) + 1):
                    prev = best[i - ln]
                    if prev is None:
                        continue
                    lp = vocab.get(w[i - ln:i])
                    if lp is None:
                        if ln == 1:
                            lp = unk
                        else:
                            continue
                    sc = prev + lp
                    if bs is None or sc > bs or (sc == bs and ln > bl):
                        bs, bl = sc, ln
                best[i], back[i] = bs, bl
            pieces, pos = [], n
            while pos > 0:
                ln = back[pos]
                pieces.append(w[pos - ln:pos])
                pos -= ln
            outs.append("|".join(reversed(pieces)))
            outl.append(best[n])
        return pd.DataFrame({"piece_str": outs, "logp": outl})

    # one struct column, expanded after — two bare references would risk
    # evaluating the UDF twice if common-subexpression elimination skips it
    return (
        df.withColumn("__seg", _seg(F.col(word_col)))
        .withColumn("piece_str", F.col("__seg.piece_str"))
        .withColumn("logp", F.col("__seg.logp"))
        .drop("__seg")
    )


def unigram_lm_train(
    df: DataFrame,
    word_col: str,
    count_col: str = None,
    seed_size: int = 200,
    rounds: int = 2,
    max_piece_len: int = 8,
    unk_logp: float = -20.0,
    min_count: int = 1,
    quantize: int = 6,
) -> DataFrame:
    """SentencePiece-style unigram-LM vocabulary TRAINING — the EM loop
    that completes the tokenizer stack (:func:`bpe_learn` is the
    merge-based member, :func:`unigram_viterbi_tokenize` the inference
    member this trains a vocabulary for).

    Hard (Viterbi) EM over a word-frequency frame:

    - seed: every substring of length 1..``max_piece_len`` counts once
      per word occurrence (one JVM-side explode + grouped agg); the top
      ``seed_size`` pieces by (count desc, piece asc) PLUS every single
      character form vocab 0, with ``logp = round(ln(cnt / total), q)``
      over the selected set;
    - E-step: segment every distinct word under the broadcast vocab
      with the existing Arrow-batched Viterbi DP (longest-piece ties);
    - M-step: ONE groupBy(piece) aggregation of frequency-weighted
      piece counts; multi-character pieces with ``count < min_count``
      are pruned (unused seeds die here — the lowest-logp prune),
      single characters always survive (unused ones at the
      ``unk_logp`` floor) so segmentation stays total;
    - bounded ``rounds``; per round the only driver state is the
      vocab itself (<= seed_size + alphabet rows — model-sized, the
      PQ-centroid convention), and log-probabilities QUANTIZE to
      ``quantize`` decimals so an external engine replays the exact
      trajectory (the harness oracle re-runs both DP rounds as
      recursive CTEs over the derived vocab tables).

    ``count_col``: per-row word frequency (default 1 per row).
    Returns the trained vocabulary: ``(piece, count, logp)`` where
    ``count`` is the final-round segmented frequency.

    Scale shape: the seed explode is O(total chars * max_piece_len)
    rows through one grouped agg; each round is one embarrassingly
    parallel UDF pass over DISTINCT words + one model-sized agg — at
    100 TB the distinct-word frame (not the corpus) is the working
    set, exactly how production tokenizer training preprocesses.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if seed_size < 1 or max_piece_len < 1 or min_count < 0:
        raise ValueError("bad seed_size/max_piece_len/min_count")
    spark = df.sparkSession
    w = F.col(word_col)
    weight = (
        F.col(count_col).cast("long") if count_col else F.lit(1).cast("long")
    )
    words = (
        df.filter(w.isNotNull() & (F.length(w) > 0))
        .groupBy(w.alias("__w"))
        .agg(F.sum(weight).alias("__cnt"))
        .persist()
    )
    # ---- seed: all substrings, one explode + one agg -----------------
    n = F.length("__w")
    subs = F.flatten(F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.transform(
            F.sequence(F.lit(1), F.least(F.lit(max_piece_len), n - i + 1)),
            lambda ln: F.col("__w").substr(i, ln),
        ),
    ))
    seed_counts = (
        words.select(F.explode(subs).alias("piece"), "__cnt")
        .groupBy("piece")
        .agg(F.sum("__cnt").alias("cnt"))
    )
    # top-N via orderBy().limit() = TakeOrderedAndProject (per-partition
    # heaps, never a single-partition window), singles unioned back in
    top = seed_counts.orderBy(F.desc("cnt"), F.asc("piece")).limit(
        int(seed_size),
    )
    selected = top.unionByName(
        seed_counts.filter(F.length("piece") == 1),
    ).groupBy("piece").agg(F.max("cnt").alias("cnt"))
    sel_rows = selected.collect()  # model-sized: <= seed_size + alphabet
    total = sum(r["cnt"] for r in sel_rows)
    import math as _math

    eps = 1e-7
    vocab = {
        r["piece"]: round(_math.log(r["cnt"] / total) + eps, quantize)
        for r in sel_rows
    }
    singles = {p for p in vocab if len(p) == 1}
    counts = {r["piece"]: int(r["cnt"]) for r in sel_rows}
    # ---- hard-EM rounds ----------------------------------------------
    for _ in range(int(rounds)):
        seg = unigram_viterbi_tokenize(
            words, "__w", vocab, unk_logp=unk_logp,
            max_piece_len=max_piece_len,
        )
        mrows = (
            seg.select(
                F.explode(F.split("piece_str", r"\|")).alias("piece"),
                "__cnt",
            )
            .groupBy("piece")
            .agg(F.sum("__cnt").alias("cnt"))
            .collect()  # bounded by the current vocab size
        )
        mcnt = {r["piece"]: int(r["cnt"]) for r in mrows}
        kept = {
            p: c for p, c in mcnt.items()
            if len(p) == 1 or c >= min_count
        }
        for p in singles:  # unused single chars survive at the floor
            kept.setdefault(p, 0)
        total = sum(kept.values())
        vocab = {
            p: (
                round(_math.log(c / total) + eps, quantize)
                if c > 0 else float(unk_logp)
            )
            for p, c in kept.items()
        }
        counts = kept
    words.unpersist()
    out = local_rows_df(spark, 
        sorted((p, counts[p], vocab[p]) for p in vocab),
        "piece string, count long, logp double",
    )
    return out
