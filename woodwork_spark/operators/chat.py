"""Instruction / chat training-data QA.

SFT and preference datasets carry structure plain documents don't: a
prompt/response contract (the response should be a response — not a
refusal template, not another prompt) and, for multi-turn chat, a role
protocol (user first, strict alternation, non-empty contents).  These
operators validate both shapes as pure column expressions — one
projection, no shuffle, no Python — so they run as cheaply as the text
quality signals at 100 TB.

The reference (woodwork) has no chat tooling; this extends the
LLM-pipeline surface alongside cleaning/text.  Refusal phrases default
to the widely-documented English templates; pass your own for other
languages — detection is substring-based over the response HEAD (the
templates open responses; scanning the whole body would flag quoted
refusals in otherwise-fine data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "DEFAULT_REFUSAL_PHRASES",
    "instruction_qa_exprs",
    "chat_turn_checks",
    "preference_pair_qa_exprs",
]

DEFAULT_REFUSAL_PHRASES = (
    "i can't",
    "i cannot",
    "i won't",
    "i'm sorry",
    "i am sorry",
    "as an ai",
    "as a language model",
    "i'm not able to",
    "i am not able to",
)


def instruction_qa_exprs(
    prompt_col: str,
    response_col: str,
    refusal_phrases=DEFAULT_REFUSAL_PHRASES,
    head_chars: int = 80,
) -> dict[str, Column]:
    """Per-pair instruction-data signals:

    - ``prompt_tokens`` / ``response_tokens``: whitespace counts;
    - ``resp_prompt_ratio``: response/prompt token ratio (NULL when the
      prompt is empty) — degenerate one-word answers and prompt echoes
      sit at the tails;
    - ``is_refusal``: the case-folded response HEAD (first
      ``head_chars`` chars) contains a refusal phrase;
    - ``template_leak``: 'as an ai language model' anywhere in the
      response (the canonical distillation artifact);
    - ``prompt_echo``: the full trimmed prompt reappears verbatim
      (case-folded) inside the response;
    - ``code_fences_balanced``: an even number of \\`\\`\\` fences.
    """
    if head_chars < 1:
        raise ValueError("head_chars must be >= 1")

    def toks(c):
        return F.size(
            F.filter(
                F.split(F.trim(F.col(c)), r"\s+"), lambda t: t != "",
            ),
        )

    p, r = F.trim(F.col(prompt_col)), F.trim(F.col(response_col))
    head = F.lower(F.substring(r, 1, int(head_chars)))
    refusal = F.lit(False)
    for ph in refusal_phrases:
        refusal = refusal | F.contains(head, F.lit(str(ph).lower()))
    fences = F.size(F.split(r, "```", -1)) - 1
    pt, rt = toks(prompt_col), toks(response_col)
    return {
        "prompt_tokens": pt,
        "response_tokens": rt,
        "resp_prompt_ratio": F.when(
            pt > 0, rt.cast("double") / pt,
        ),
        "is_refusal": refusal,
        "template_leak": F.contains(
            F.lower(r), F.lit("as an ai language model"),
        ),
        "prompt_echo": (F.length(p) > 0)
        & F.contains(F.lower(r), F.lower(p)),
        "code_fences_balanced": fences % 2 == 0,
    }


def chat_turn_checks(
    df: DataFrame,
    messages_col: str,
    user_role: str = "user",
    assistant_role: str = "assistant",
    system_role: str = "system",
) -> DataFrame:
    """Validate the multi-turn chat protocol over an
    ``array<struct<role, content>>`` column:

    - ``n_turns``: message count (after dropping a leading system
      message, which is protocol-legal and excluded from the checks);
    - ``starts_with_user`` / ``ends_with_assistant``;
    - ``roles_alternate``: no two consecutive messages share a role;
    - ``roles_known``: every role is user/assistant/system;
    - ``has_empty_content``: any NULL or whitespace-only content;
    - ``chat_valid``: the conjunction — the row is trainable as-is.

    Pure array expressions per row (``filter``/``forall`` over the
    struct array) — NULL message arrays yield NULL checks and
    ``chat_valid = false``."""
    msgs = F.col(messages_col)
    body = F.when(
        (F.size(msgs) > 0)
        & (F.lower(msgs[0]["role"]) == system_role),
        F.slice(msgs, 2, F.greatest(F.size(msgs) - 1, F.lit(1))),
    ).otherwise(msgs)
    n = F.size(body)
    first_role = F.lower(F.element_at(body, 1)["role"])
    last_role = F.lower(F.element_at(body, -1)["role"])
    alternate = F.when(n >= 2, F.forall(
        F.sequence(F.lit(2), F.greatest(n, F.lit(2))),
        lambda i: F.lower(F.element_at(body, i)["role"])
        != F.lower(F.element_at(body, i - 1)["role"]),
    )).otherwise(F.lit(True))
    known = F.forall(
        body,
        lambda m: F.lower(m["role"]).isin(
            user_role, assistant_role, system_role,
        ),
    )
    empty = F.exists(
        body,
        lambda m: m["content"].isNull() | (F.trim(m["content"]) == ""),
    )
    checks = {
        "n_turns": n,
        "starts_with_user": F.when(n > 0, first_role == user_role),
        "ends_with_assistant": F.when(n > 0, last_role == assistant_role),
        "roles_alternate": alternate,
        "roles_known": known,
        "has_empty_content": empty,
    }
    out = df.withColumns(checks)
    valid = (
        msgs.isNotNull() & (F.col("n_turns") >= 2)
        & F.col("starts_with_user") & F.col("ends_with_assistant")
        & F.col("roles_alternate") & F.col("roles_known")
        & ~F.col("has_empty_content")
    )
    return out.withColumn(
        "chat_valid", F.coalesce(valid, F.lit(False)),
    )


def preference_pair_qa_exprs(
    chosen_col: str,
    rejected_col: str,
    refusal_phrases=DEFAULT_REFUSAL_PHRASES,
    max_len_gap: float = 4.0,
    head_chars: int = 80,
) -> dict[str, Column]:
    """QA signals for DPO/RLHF preference pairs — the artifacts that
    quietly teach a reward model the wrong thing:

    - ``identical_pair``: chosen == rejected after trim+casefold (no
      gradient signal; a join bug upstream);
    - ``chosen_tokens`` / ``rejected_tokens`` and ``len_gap_ok``:
      longer/shorter token ratio <= ``max_len_gap`` — extreme gaps
      train a length heuristic, not a preference;
    - ``chosen_refusal`` / ``rejected_refusal``: refusal template in
      the response HEAD (a pair whose CHOSEN side is the refusal is
      usually a safety-label leak into a helpfulness dataset —
      segregate, don't mix);
    - ``one_contains_other``: either full trimmed text inside the
      other (truncation/regeneration artifacts);
    - ``pair_valid``: non-null, non-identical, both non-empty, length
      gap ok, no containment.

    One projection of pure column expressions, shares the refusal
    vocabulary with :func:`instruction_qa_exprs`.
    """
    if max_len_gap <= 1.0:
        raise ValueError("max_len_gap must be > 1")
    c, r = F.trim(F.col(chosen_col)), F.trim(F.col(rejected_col))

    def toks(x):
        return F.size(F.filter(F.split(x, r"\s+"), lambda t: t != ""))

    def refusal(x):
        head = F.lower(F.substring(x, 1, int(head_chars)))
        out = F.lit(False)
        for ph in refusal_phrases:
            out = out | F.contains(head, F.lit(str(ph).lower()))
        return out

    ct, rt = toks(c), toks(r)
    gap = F.greatest(ct, rt).cast("double") / F.greatest(
        F.least(ct, rt), F.lit(1),
    )
    identical = (F.lower(c) == F.lower(r))
    contains = (
        (F.length(c) > 0) & (F.length(r) > 0)
        & (F.contains(F.lower(c), F.lower(r))
           | F.contains(F.lower(r), F.lower(c)))
        & ~identical
    )
    len_gap_ok = gap <= F.lit(float(max_len_gap))
    valid = (
        F.col(chosen_col).isNotNull() & F.col(rejected_col).isNotNull()
        & (ct > 0) & (rt > 0) & ~identical & ~contains & len_gap_ok
    )
    return {
        "chosen_tokens": ct,
        "rejected_tokens": rt,
        "identical_pair": identical & (F.length(c) > 0),
        "len_gap_ok": len_gap_ok,
        "chosen_refusal": refusal(c),
        "rejected_refusal": refusal(r),
        "one_contains_other": contains,
        "pair_valid": F.coalesce(valid, F.lit(False)),
    }
