"""URL / domain governance for web-crawl corpora.

The reference (woodwork) has no URL tooling; this module is part of the
beyond-reference training-data surface: canonicalize crawl URLs so the
same page fetched under tracking-param / case / slash variants dedups to
one row, and aggregate per REGISTERED domain (eTLD+1) so crawl caps and
quality reports operate on the owner, not the subdomain.

Everything here is pure Column expressions (regexp + array functions,
JVM-side, whole-stage-codegen friendly): canonicalization adds zero
shuffles, and the governance reports are single map-side-combinable
aggregations keyed on the canonical form or the registered domain —
shuffle bytes scale with domain cardinality, not corpus size.  At 100 TB
the canonical key is hashed (xxhash64) before any join so shuffle rows
stay fixed-width.

Canonicalization is deliberately regex-based rather than
``F.parse_url`` so the semantics are EXACTLY reproducible in the DuckDB
oracles (and in any other engine) from the same regex definitions —
``parse_url`` delegates to java.net.URI quirks no other engine matches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = [
    "DEFAULT_TRACKING_PARAMS",
    "MULTIPART_SUFFIXES",
    "canonicalize_url_expr",
    "url_host_expr",
    "registered_domain_expr",
    "with_registered_domain",
    "canonical_url_dedup",
    "domain_governance_report",
    "cap_per_domain",
    "apply_url_policies",
    "parse_robots_rules",
    "parse_sitemap_urls",
    "html_strip_expr",
    "html_qa_exprs",
    "tracking_param_regex",
]

# Tracking / click-id query parameters that never change page content.
# ``utm_*`` is a prefix family; the rest are exact keys.
DEFAULT_TRACKING_PARAMS = (
    "utm_[A-Za-z0-9_]*",
    "gclid",
    "fbclid",
    "msclkid",
    "yclid",
    "igshid",
    "mc_eid",
    "_ga",
    "ref",
    "ref_src",
    "spm",
)

# Common multi-part public suffixes, so ``registered_domain_expr`` keeps
# three labels for shop.example.co.uk -> example.co.uk.  A deliberate
# bounded subset of the public-suffix list (the full list is a data file,
# not code — pass your own ``extra_suffixes`` to extend); documented
# heuristic, NOT a PSL replacement.
MULTIPART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.in", "net.in", "org.in",
    "co.za", "org.za", "com.mx", "org.mx",
    "com.sg", "com.tr", "com.ar", "com.co",
    "co.kr", "or.kr", "com.tw", "com.hk", "com.my",
    "co.th", "co.id", "com.vn", "com.ph",
    "co.il", "org.il", "com.ua",
)

# Shared regex vocabulary — the DuckDB oracles use these SAME patterns.
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_STRIP_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://"
_AUTHORITY_RE = r"^([^/?#]*)"
_USERINFO_RE = r"^.*@"
_PORT_RE = r":([0-9]+)$"
_HOST_RE = r"^([^:]*)"
_PATH_RE = r"^([^?#]*)"
_FRAGMENT_RE = r"#.*$"
_QUERY_RE = r"\?(.*)$"


def tracking_param_regex(params=DEFAULT_TRACKING_PARAMS) -> str:
    """Full-match regex for one ``key=value`` (or bare ``key``) query
    token naming a tracking parameter."""
    return "^(" + "|".join(params) + ")(=.*)?$"


def _parts(url_col):
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _STRIP_SCHEME_RE, "")
    authority = F.regexp_extract(rest, _AUTHORITY_RE, 1)
    hostport = F.regexp_replace(authority, _USERINFO_RE, "")
    host = F.lower(F.regexp_extract(hostport, _HOST_RE, 1))
    port = F.regexp_extract(hostport, _PORT_RE, 1)
    pathqf = F.regexp_replace(rest, r"^[^/?#]*", "")
    path = F.regexp_extract(pathqf, _PATH_RE, 1)
    # fragment dropped BEFORE query extraction: for a URL with a
    # fragment but no query (…/p#sec?tab=2) the '?' lives inside the
    # fragment and must not survive as a query string
    query = F.regexp_extract(
        F.regexp_replace(pathqf, _FRAGMENT_RE, ""), _QUERY_RE, 1,
    )
    return u, scheme, host, port, path, query


def url_host_expr(url_col) -> Column:
    """Lower-cased host of an absolute URL (userinfo and port stripped);
    NULL when the value has no ``scheme://``."""
    u, scheme, host, _, _, _ = _parts(url_col)
    return F.when(scheme != "", host)


def canonicalize_url_expr(
    url_col,
    tracking_params=DEFAULT_TRACKING_PARAMS,
    strip_www: bool = True,
    extra_suffixes=(),
) -> Column:
    """Canonical form of an absolute URL, as one column expression:

    - scheme and host lower-cased, userinfo dropped, leading ``www.``
      dropped (``strip_www``) — but ONLY when stripping cannot change
      the registered domain (never for two-label hosts like ``www.com``
      or when the remainder is itself a public suffix like
      ``www.co.uk``; found by the idempotence/domain-stability property
      test), default ports (http:80 / https:443)
      dropped, other ports kept;
    - path: duplicate slashes collapsed, trailing slashes stripped,
      empty path -> ``/``;
    - query: tracking params (``tracking_params`` full-match families)
      and empty tokens removed, remaining ``key=value`` tokens sorted
      bytewise, rejoined; dropped entirely when nothing survives;
    - fragment always dropped.

    Relative / schemeless values canonicalize to NULL (a crawl URL
    without a scheme is not fetchable).  Pure string expressions —
    no UDF, no shuffle.
    """
    u, scheme, host, port, path, query = _parts(url_col)
    if strip_www:
        suffixes = list(MULTIPART_SUFFIXES) + list(extra_suffixes)
        labels = F.split(host, r"\.")
        n = F.size(labels)
        last2 = F.concat_ws(
            ".", F.try_element_at(labels, F.lit(-2)),
            F.try_element_at(labels, F.lit(-1)),
        )
        can_strip = (
            host.startswith("www.")
            & (n >= 3)
            & ~((n == 3) & last2.isin(suffixes))
        )
        host = F.when(
            can_strip, F.regexp_replace(host, r"^www\.", ""),
        ).otherwise(host)
    path_c = F.regexp_replace(path, r"/{2,}", "/")
    path_c = F.regexp_replace(path_c, r"/+$", "")
    path_c = F.when(path_c == "", F.lit("/")).otherwise(path_c)
    track = tracking_param_regex(tracking_params)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda x: (x != "") & ~x.rlike(track),
        ),
    )
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(F.lit(""))
    portpart = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    return F.when(
        (scheme != "") & (host != ""),
        F.concat(scheme, F.lit("://"), host, portpart, path_c, qpart),
    )


def registered_domain_expr(
    url_col,
    extra_suffixes=(),
    from_host: bool = False,
) -> Column:
    """Registered domain (approximate eTLD+1) of a URL (or of a host
    column when ``from_host``): the last two host labels, or three when
    the last two form a known multi-part public suffix
    (``MULTIPART_SUFFIXES`` + ``extra_suffixes``).  ``www.`` never
    matters — it falls out of the label slicing.  Hosts with one label
    (``localhost``) and IPv4 literals pass through unchanged."""
    if from_host:
        host = F.lower(
            F.col(url_col) if isinstance(url_col, str) else url_col,
        )
    else:
        host = url_host_expr(url_col)
    suffixes = list(MULTIPART_SUFFIXES) + list(extra_suffixes)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    ipv4 = host.rlike(r"^[0-9]+(\.[0-9]+){3}$")
    last2 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-2)),
        F.try_element_at(labels, F.lit(-1)),
    )
    last3 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-3)),
        F.try_element_at(labels, F.lit(-2)),
        F.try_element_at(labels, F.lit(-1)),
    )
    return F.when(host.isNull(), F.lit(None)).when(
        (n <= 2) | ipv4, host,
    ).when(last2.isin(suffixes), last3).otherwise(last2)


def canonical_url_dedup(
    df: DataFrame,
    url_col: str,
    order,
    canonical_col: str = "canonical_url",
) -> DataFrame:
    """Keep ONE row per canonical URL — the first by ``order`` (a list
    of columns forming a deterministic total order, e.g. ``[crawl_ts,
    doc_id]``); rows whose URL does not canonicalize (no scheme) are
    kept as-is, each its own group.

    Scale shape: the canonical string is folded to a 128-bit composite
    hash key (two independent xxhash64s) before the aggregation, so the
    min-of-struct groupBy and the winner semi-join shuffle fixed-width
    rows, never URL text.  Same shape as exact document dedup
    (``dedup.dedup_exact``).
    """
    order = [order] if isinstance(order, str) else list(order)
    canon = canonicalize_url_expr(url_col)
    with_c = df.withColumn(canonical_col, canon)
    keyed = with_c.withColumn(
        "__k1", F.xxhash64(canonical_col),
    ).withColumn("__k2", F.xxhash64(canonical_col, F.lit(1)))
    winners = (
        keyed.filter(F.col(canonical_col).isNotNull())
        .groupBy("__k1", "__k2")
        .agg(F.min(F.struct(*order)).alias("__w"))
        .select(
            "__k1", "__k2",
            *[F.col(f"__w.{c}").alias(f"__w_{c}") for c in order],
        )
    )
    # eqNullSafe: a NULL order column must still identify its winner
    # row (plain = would yield NULL, the filter would drop the whole
    # canonical group silently)
    is_winner = F.lit(True)
    for c in order:
        is_winner = is_winner & F.col(c).eqNullSafe(F.col(f"__w_{c}"))
    kept = keyed.join(winners, ["__k1", "__k2"], "left").filter(
        F.col(canonical_col).isNull() | is_winner,
    )
    return kept.drop("__k1", "__k2", *[f"__w_{c}" for c in order])


def domain_governance_report(
    df: DataFrame,
    url_col: str,
    extra_suffixes=(),
) -> DataFrame:
    """Per-registered-domain crawl governance numbers: raw URL count,
    distinct canonical pages, duplicate count and rate (how much of the
    domain's crawl volume is tracking-param/case/slash noise).  Rows
    whose URL doesn't parse land in a NULL-domain row so volume is
    never silently dropped.

    ONE aggregation: map-side partial counts + count_distinct on the
    canonical hash per domain; shuffle scales with domain cardinality.
    Feed the output to ``curation.source_quality_report`` /
    ``packing.cap_per_group`` for enforcement.
    """
    canon = canonicalize_url_expr(url_col)
    base = df.select(
        registered_domain_expr(url_col, extra_suffixes).alias("domain"),
        F.xxhash64(canon).alias("__ck"),
        F.xxhash64(canon, F.lit(1)).alias("__ck2"),
        canon.isNotNull().alias("__ok"),
    )
    # distinct over the 128-bit two-hash composite (same collision
    # bound as canonical_url_dedup); COUNT(DISTINCT a, b) skips rows
    # where either is NULL, so unparsed rows fall out via the __ok gate
    return base.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.count_distinct(
            F.when(F.col("__ok"), F.col("__ck")),
            F.when(F.col("__ok"), F.col("__ck2")),
        ).alias("n_canonical"),
        F.sum((~F.col("__ok")).cast("long")).alias("n_unparsed"),
    ).select(
        "domain", "n_urls", "n_canonical", "n_unparsed",
        (F.col("n_urls") - F.col("n_unparsed") - F.col("n_canonical"))
        .alias("n_dup"),
        (
            (F.col("n_urls") - F.col("n_unparsed") - F.col("n_canonical"))
            / F.greatest(F.col("n_urls") - F.col("n_unparsed"), F.lit(1))
        ).alias("dup_rate"),
    )


def cap_per_domain(
    df: DataFrame,
    url_col: str,
    k: int,
    order,
    extra_suffixes=(),
    domain_col: str = "domain",
) -> DataFrame:
    """Keep at most ``k`` rows per registered domain, chosen
    deterministically by ``order`` — the standard anti-monoculture cap
    for crawl corpora, keyed on the OWNER (eTLD+1) so a thousand
    subdomains can't evade it.  Composes ``registered_domain_expr``
    with ``packing.cap_per_group`` (one partitioned window)."""
    from .packing import cap_per_group

    with_d = df.withColumn(
        domain_col, registered_domain_expr(url_col, extra_suffixes),
    )
    return cap_per_group(with_d, domain_col, k, order)


def apply_url_policies(
    df: DataFrame,
    url_col: str,
    id_col: str,
    rules: DataFrame,
    default_allow: bool = True,
    extra_suffixes=(),
) -> DataFrame:
    """Robots-style crawl-policy evaluation: decide allow/deny per URL
    from per-registered-domain path-prefix rules, with the standard
    longest-match-wins resolution (and allow winning exact-length ties,
    the Google robots convention).  URLs whose registered domain has no
    matching rule get ``default_allow``; unparseable URLs are DENIED
    (an unfetchable URL must not pass a crawl gate).

    ``rules`` is a frame ``(domain string, path_prefix string, allow
    boolean)``.  Scale shape: the corpus projects to (id, domain,
    path) — pure column expressions; the rules frame is policy-sized
    (thousands of rows, not corpus-sized) and joins BROADCAST on
    domain, so no corpus shuffle happens at all until the per-id
    winner aggregation, which groups on the corpus's own id key.
    Returns the input plus ``crawl_allowed`` (boolean) and
    ``matched_prefix``.
    """
    u, scheme, host, port, path, query = _parts(url_col)
    parsed = df.select(
        F.col(id_col),
        registered_domain_expr(url_col, extra_suffixes).alias("__dom"),
        F.when(scheme != "", F.when(path == "", "/").otherwise(path))
        .alias("__path"),
    )
    r = rules.select(
        F.col("domain").alias("__dom"),
        F.col("path_prefix").alias("__pfx"),
        F.col("allow").cast("boolean").alias("__allow"),
    )
    cand = parsed.join(F.broadcast(r), "__dom", "left").withColumn(
        "__hit",
        F.col("__pfx").isNotNull()
        & F.col("__path").isNotNull()
        & F.col("__path").startswith(F.col("__pfx")),
    )
    # longest matching prefix wins; allow beats deny at equal length
    winner = cand.groupBy(id_col).agg(
        F.max(
            F.when(
                F.col("__hit"),
                F.struct(
                    F.length("__pfx").alias("l"),
                    F.col("__allow").cast("int").alias("a"),
                    F.col("__pfx").alias("p"),
                ),
            ),
        ).alias("__w"),
        F.max(F.col("__path").isNotNull().cast("int")).alias("__parsed"),
    )
    decided = winner.select(
        id_col,
        F.when(F.col("__parsed") == 0, F.lit(False))
        .when(F.col("__w").isNotNull(), F.col("__w.a") == 1)
        .otherwise(F.lit(bool(default_allow))).alias("crawl_allowed"),
        F.col("__w.p").alias("matched_prefix"),
    )
    return df.join(decided, id_col)


def with_registered_domain(
    df: DataFrame,
    url_col: str,
    suffixes: DataFrame = None,
    out_col: str = "domain",
    suffix_col: str = "suffix",
    from_host: bool = False,
    max_suffix_labels: int = 4,
) -> DataFrame:
    """Add the registered domain (eTLD+1), resolving public suffixes
    FROM DATA when ``suffixes`` is given: the full public-suffix list
    is a data file, not code, so a real crawl passes it as a one-column
    frame (``suffix_col``, lower-case label sequences like ``co.uk``,
    ``github.io``) and gets exact eTLD+1; with ``suffixes=None`` this
    is exactly ``registered_domain_expr`` (the bounded built-in
    heuristic) as a column.

    Matching is the PSL prevailing rule: the LONGEST listed suffix
    matching the host's trailing labels wins, and the registered domain
    is that suffix plus one label (a host with no listed suffix falls
    back to the implicit ``*`` rule — last label is the suffix).  A
    host that IS a listed suffix, a single label, or an IPv4 literal
    passes through unchanged (same conventions as the expression path).
    Wildcard (``*.ck``) and exception (``!www.ck``) PSL rows are NOT
    interpreted — expand them to plain rows upstream.

    Scale shape: one broadcast left join per candidate suffix length
    (``2..max_suffix_labels``; length 1 needs no join — it resolves to
    the same last-2-label answer as the implicit rule) — the corpus
    never shuffles, the suffix frame is list-sized (~10k rows) and is
    deduplicated before broadcast.  Candidate keys are pure split/slice
    column expressions.
    """
    if max_suffix_labels < 2:
        raise ValueError("max_suffix_labels must be >= 2")
    if suffixes is None:
        return df.withColumn(
            out_col, registered_domain_expr(url_col, from_host=from_host),
        )
    if from_host:
        host = F.lower(F.col(url_col))
    else:
        host = url_host_expr(url_col)
    tmp = "__rd_host"
    out = df.withColumn(tmp, host)
    labels = F.split(F.col(tmp), r"\.")
    n = F.size(labels)
    lens = list(range(2, int(max_suffix_labels) + 1))
    for L in lens:
        cand = F.when(
            n >= L, F.concat_ws(".", F.slice(labels, -L, L)),
        )
        sfx = (
            suffixes.select(F.lower(F.col(suffix_col)).alias(f"__sfx{L}"))
            .filter(F.length(f"__sfx{L}") - F.length(
                F.regexp_replace(f"__sfx{L}", r"\.", ""),
            ) == L - 1)
            .distinct()
        )
        out = out.join(
            F.broadcast(sfx),
            cand.eqNullSafe(F.col(f"__sfx{L}")),
            "left",
        )
    matched = F.greatest(
        F.lit(1),
        *[
            F.when(F.col(f"__sfx{L}").isNotNull(), F.lit(L)).otherwise(1)
            for L in lens
        ],
    )
    reg_len = F.least(matched + 1, n)
    ipv4 = F.col(tmp).rlike(r"^[0-9]+(\.[0-9]+){3}$")
    reg = (
        F.when(F.col(tmp).isNull(), F.lit(None))
        .when((n <= 1) | ipv4, F.col(tmp))
        .otherwise(F.concat_ws(".", F.slice(labels, -reg_len, reg_len)))
    )
    return out.withColumn(out_col, reg).drop(
        tmp, *[f"__sfx{L}" for L in lens],
    )


def parse_robots_rules(
    df: DataFrame,
    domain_col: str,
    text_col: str,
    agent: str,
) -> DataFrame:
    """Parse fetched robots.txt payloads into the ``(domain,
    path_prefix, allow)`` rules frame :func:`apply_url_policies`
    consumes.  Implements the group semantics of the robots exclusion
    protocol (RFC 9309 / the Google convention, which the reference has
    no analog of):

    - lines split on newline, ``#`` comments stripped, whitespace
      trimmed; directives matched case-insensitively;
    - a run of consecutive ``User-agent`` lines opens a group; the
      following ``Allow``/``Disallow`` lines belong to it; rule lines
      before any ``User-agent`` line are ignored, as are unknown
      directives (``Crawl-delay``, ``Sitemap``);
    - group selection per domain: the MOST SPECIFIC matching agent
      token wins — a token that is a case-insensitive prefix of
      ``agent`` scores its length, ``*`` scores 0, anything else
      doesn't match; ALL groups containing a winning token contribute
      (the spec's merge rule for repeated groups);
    - ``Disallow:`` / ``Allow:`` with an empty value carry no rule;
    - rule paths are emitted verbatim as prefixes — ``*`` / ``$``
      wildcard patterns are NOT interpreted (expand upstream if you
      need them; :func:`apply_url_policies` is longest-prefix-match).

    Scale shape: one posexplode over the robots corpus (which is
    domain-cardinality-sized — thousandsfold smaller than the crawl),
    two windows partitioned by domain (group numbering, winning-score),
    one semi join back.  Nothing here ever touches crawl-corpus rows;
    the output is exactly the broadcast-sized frame the policy gate
    wants.

    One row per domain: a duplicate ``domain_col`` value would
    interleave the two payloads' line positions inside one window
    partition — dedup to the latest fetch upstream."""
    if not agent:
        raise ValueError("agent is required (use '*' for the default)")
    target = F.lit(str(agent).lower())
    lines = df.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "raw"),
    ).select(
        "domain", "pos",
        F.trim(F.regexp_replace(F.regexp_replace("raw", "#.*$", ""),
                                "\r", "")).alias("line"),
    )
    key = F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1))
    val = F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:(.*)$", 1))
    typed = lines.select(
        "domain", "pos",
        (key == "user-agent").alias("is_ua"),
        F.when(key.isin("allow", "disallow"), key).alias("rule_kind"),
        val.alias("val"),
    )
    w = W.partitionBy("domain").orderBy("pos")
    grouped = typed.withColumn(
        "gid",
        F.sum(
            (
                F.col("is_ua")
                & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False))
            ).cast("int"),
        ).over(w),
    )
    ua = grouped.filter("is_ua").select(
        "domain", "gid",
        F.when(F.lower("val") == "*", F.lit(0))
        .when(
            target.startswith(F.lower(F.col("val")))
            & (F.col("val") != ""),
            F.length("val"),
        ).alias("score"),
    )
    wd = W.partitionBy("domain")
    winners = (
        ua.withColumn("best", F.max("score").over(wd))
        .filter(
            F.col("score").isNotNull()
            & (F.col("score") == F.col("best")),
        )
        .select("domain", "gid")
        .distinct()
    )
    rules = grouped.filter(
        F.col("rule_kind").isNotNull() & (F.col("gid") > 0)
        & (F.col("val") != ""),
    )
    return (
        rules.join(winners, ["domain", "gid"], "left_semi")
        .select(
            "domain",
            F.col("val").alias("path_prefix"),
            (F.col("rule_kind") == "allow").alias("allow"),
        )
        .distinct()
    )


def parse_sitemap_urls(
    df: DataFrame,
    domain_col: str,
    xml_col: str,
    tag: str = "url",
) -> DataFrame:
    """Parse sitemap.xml payloads into a crawl-seed frame ``(domain,
    url, lastmod)`` — the discovery-side companion of
    :func:`parse_robots_rules` (robots says what MAY be fetched,
    sitemaps say what EXISTS).  ``tag="sitemap"`` parses a sitemap
    INDEX instead (the child-sitemap URLs, for the fetch frontier).

    Parsing is regex-based over the standard sitemap vocabulary —
    ``<url>``/``<sitemap>`` blocks, ``<loc>``, ``<lastmod>`` — with
    the five predefined XML entities unescaped in ``loc`` (sitemap
    locs are XML-escaped URLs).  Deliberately NOT a full XML parser:
    namespaces/CDATA are out of scope (documented), and the regex
    semantics reproduce exactly in any RE2/Java engine, same rationale
    as the URL canonicalizer.  Blocks without a ``<loc>`` are dropped;
    ``lastmod`` is passed through verbatim (W3C datetime, parse
    downstream with ``try_cast``).

    Scale shape: one regexp_extract_all + posexplode over the sitemap
    corpus (domain-cardinality-sized, like the robots corpus), then
    pure column extraction — no windows, no joins.
    """
    if tag not in ("url", "sitemap"):
        raise ValueError(f"tag must be 'url' or 'sitemap', got {tag!r}")
    blocks = F.regexp_extract_all(
        F.col(xml_col), F.lit(rf"(?s)<{tag}>(.*?)</{tag}>"), 1,
    )
    out = df.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(blocks).alias("pos", "__blk"),
    )
    loc = F.regexp_extract("__blk", r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
    for ent, ch in (
        ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&apos;", "'"),
    ):
        loc = F.replace(loc, F.lit(ent), F.lit(ch))
    lastmod = F.regexp_extract(
        "__blk", r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", 1,
    )
    return out.select(
        "domain", "pos",
        loc.alias("url"),
        F.when(lastmod != "", lastmod).alias("lastmod"),
    ).filter(F.col("url") != "")


def html_strip_expr(html_col) -> Column:
    """Visible text of an HTML payload as one column expression: drops
    ``<script>``/``<style>`` blocks (their CONTENT is code, not text),
    comments, then all remaining tags; unescapes the five predefined
    XML entities plus ``&nbsp;`` and numeric ``&#NN;`` for the common
    ASCII range is NOT attempted (document: entity coverage is the
    predefined set — full entity tables are data, not code); collapses
    whitespace runs and trims.

    Regex-based by the module's engine-portability contract (RE2-safe:
    no lookaround, non-greedy + (?s) only) — a real DOM parser is a
    different tradeoff (correct on pathological markup, 100x the cost,
    and engine-specific).  Good enough for crawl-scale text extraction
    where the next stages (quality, dedup) tolerate extraction noise.
    """
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    t = F.regexp_replace(c, r"(?si)<script\b[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?si)<style\b[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, ch in (
        ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"),
        ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def html_qa_exprs(html_col) -> dict[str, Column]:
    """Markup-quality signals for crawled HTML, one projection:

    - ``visible_chars`` / ``raw_chars`` and ``text_ratio`` (visible /
      raw) — chrome-heavy or script-only pages sit near 0;
    - ``n_tags``, ``n_links``, ``link_density`` (links per 100 visible
      chars — boilerplate nav pages are link-dense);
    - ``has_script`` / ``has_style``;
    - ``n_paragraphs``: ``<p`` opening tags, the cheapest
      content-structure proxy.

    Composable with :func:`html_strip_expr` (shares its extraction)
    and the text-quality signals downstream.
    """
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    visible = html_strip_expr(c)
    raw_len = F.length(c)
    # structural counts run on the DE-SCRIPTED markup: a '<p>' inside
    # a script string literal is code, not structure
    body = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, r"(?si)<script\b[^>]*>.*?</script>", " "),
            r"(?si)<style\b[^>]*>.*?</style>", " ",
        ),
        r"(?s)<!--.*?-->", " ",
    )
    n_tags = F.size(F.regexp_extract_all(body, F.lit(r"(?s)<[^>]*>"), 0))
    n_links = F.size(
        F.regexp_extract_all(F.lower(body), F.lit(r"<a[\s>]"), 0),
    )
    vis_len = F.length(visible)
    return {
        "raw_chars": raw_len,
        "visible_chars": vis_len,
        "text_ratio": F.when(
            raw_len > 0, vis_len.cast("double") / raw_len,
        ),
        "n_tags": n_tags,
        "n_links": n_links,
        "link_density": F.when(
            vis_len > 0, n_links * F.lit(100.0) / vis_len,
        ),
        "has_script": F.lower(c).rlike(r"<script\b"),
        "has_style": F.lower(c).rlike(r"<style\b"),
        "n_paragraphs": F.size(
            F.regexp_extract_all(F.lower(body), F.lit(r"<p[\s>]"), 0),
        ),
    }
