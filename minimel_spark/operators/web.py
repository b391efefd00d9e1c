"""Web-snapshot curation operators (SURVEY §4 LLM-pipeline family, round 5):
URL canonicalization, latest-snapshot-per-URL dedup, per-domain quotas, and
snapshot diffing over Common-Crawl-style page tables
``(url, warc_ts, html, text, lang)`` — the exact input shape the north rule
names. The reference (bennokr/minimEL) consumes pre-extracted Wikipedia dumps
and has no crawl-curation layer; these operators supply the upstream stages a
100-TB Common-Crawl corpus needs before the ER pipeline (minimel/prepare.py's
dump-selection role, re-expressed for crawl snapshots).

Scale design (all JVM-side expressions; no UDF, no driver state):

- ``canonical_url`` is a pure column expression (regexp + array ops inside
  whole-stage codegen), so canonicalization adds zero shuffles and pushes
  through any downstream partitioning.
- ``latest_snapshots`` is ONE hash aggregation on the canonical key
  (map-side partial ``max_by`` then final) — the standard newest-version-wins
  crawl dedup, no window, no sort.
- ``domain_quota`` ranks within domains by a content hash (md5-derived, so
  the kept set is partition- and parallelism-invariant) — one shuffle on the
  domain key; skewed mega-domains are bounded by the quota itself (the rank
  filter drops the tail as soon as the per-key heap passes ``max_per_domain``
  under AQE; for pathological single-domain corpora, pre-aggregate with
  ``F.min_by`` top-k semantics or salt the rank as in blocking.cap_blocks).
- ``snapshot_diff`` is ONE full-outer join on the canonical key, the
  added/removed/changed classifier evaluated as codegen'd expressions.

Every operator is DuckDB-oracle-checked bit-for-bit in ``__spark_entry__``
(the canonicalization regex/array chain is recomputed independently in ANSI
SQL), so the URL normalization semantics are pinned, not just exercised.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from .util import md5_long60

# Tracking parameters dropped during canonicalization (the common
# analytics/click-id families). Matched as a whole parameter name.
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=|$)"


def canonical_url(url: Column) -> Column:
    """Canonical form of an http(s) URL, entirely as codegen'd expressions.

    Normalization (each step mirrors what crawl dedup pipelines key on):
    fragment dropped; scheme dropped (http/https unified); host lowercased,
    leading ``www.`` and default ports ``:80``/``:443`` stripped; trailing
    slashes on the path stripped; tracking query parameters
    (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``, ``ref``) removed and the
    surviving parameters sorted bytewise so parameter order never splits a
    page into two keys.

    The result is ``host + path [+ '?' + sorted_kept_query]``. Pure column
    expression: usable in any select/filter/groupBy without a shuffle.
    """
    nofrag = F.regexp_replace(url, r"#.*", "")
    rest = F.regexp_replace(nofrag, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://", "")
    host = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    return F.concat(
        host, path, F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit(""))
    )


def url_domain(canonical: Column) -> Column:
    """Registered host of an already-canonical URL (everything before the
    first '/' or '?')."""
    return F.regexp_extract(canonical, r"^([^/?]*)", 1)


def latest_snapshots(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Newest-version-wins crawl dedup: one row per canonical URL carrying the
    payload of the latest snapshot (ties broken by the raw URL string so the
    winner is total-ordered, hence parallelism-invariant).

    Output: every input column (the latest snapshot's values) plus
    ``canonical_url`` and ``n_snapshots``. Single hash aggregation —
    ``max_by`` runs map-side partial then final, so at 10^12 rows this is one
    shuffle of one (struct) value per canonical key, not a window sort.
    """
    payload = F.struct(
        F.col(ts_col).alias("_ts"), F.col(url_col).alias("_u"), F.struct(*pages.columns).alias("_row")
    )
    agg = pages.groupBy(canonical_url(F.col(url_col)).alias("canonical_url")).agg(
        F.max(payload).alias("_best"),
        F.count(F.lit(1)).alias("n_snapshots"),
    )
    return agg.select(
        "canonical_url",
        F.col("_best._row.*"),
        "n_snapshots",
    )


def domain_quota(
    pages: DataFrame,
    max_per_domain: int,
    url_col: str = "canonical_url",
) -> DataFrame:
    """Per-domain document quota: keep at most ``max_per_domain`` pages per
    registered host, chosen by md5-derived content-hash rank (URL tie-break)
    so the kept set is deterministic at any parallelism — the per-domain cap
    every crawl-curation pipeline applies so one mega-site cannot dominate
    the training mix.

    Adds ``domain`` and ``domain_rank`` (1-based) to the kept rows. One
    shuffle on the domain key; the rank window partitions by domain, so no
    single-partition sort exists at any scale.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("domain").orderBy(
        md5_long60(F.col(url_col)), F.col(url_col)
    )
    return (
        pages.withColumn("domain", url_domain(F.col(url_col)))
        .withColumn("domain_rank", F.row_number().over(w).cast("long"))
        .where(F.col("domain_rank") <= max_per_domain)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "canonical_url",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Crawl-to-crawl diff: classify every canonical URL present in either
    snapshot as ``added`` (new only), ``removed`` (old only), ``changed``
    (both, fingerprints differ) or ``unchanged``. ONE full-outer join on the
    canonical key (the J7 gold⋈pred alignment shape, minimel/evaluate.py:60,
    applied to crawl snapshots); the classifier is a codegen'd CASE.

    Inputs must be one-row-per-canonical-URL (e.g. ``latest_snapshots``
    output, or per-snapshot slices of it)."""
    o = old.select(F.col(url_col), F.col(fp_col).alias("_fp_old"))
    n = new.select(F.col(url_col), F.col(fp_col).alias("_fp_new"))
    return o.join(n, url_col, "full_outer").select(
        url_col,
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def strip_boilerplate_lines(
    pages: DataFrame,
    min_docs: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    persisted_out: list | None = None,
) -> DataFrame:
    """Corpus-level line deduplication — the CCNet-style boilerplate
    remover (Wenzek et al., "CCNet", LREC 2020 strip repeated paragraphs
    by corpus hash count): a line whose normalized form (trimmed,
    lowercased) appears in >= ``min_docs`` DISTINCT documents is
    boilerplate (nav bars, cookie banners, copyright footers) and is
    dropped from every document; all other lines are kept VERBATIM in
    their original order. Whitespace-only lines are kept and never
    counted (they would otherwise all collapse to one degenerate
    "boilerplate" key). Returns one row per input page:

        (id_col, text (cleaned), n_lines, n_removed)

    — documents whose every line was boilerplate come back with
    ``text = ''``, not dropped (downstream length/quality filters decide
    their fate, not this operator).

    Scale design: the line stream shuffles on a 60-bit md5 of the
    normalized line, never the line text (a viral line's full bytes
    would otherwise ride every shuffle row); the doc-frequency count is
    a grouped COUNT(DISTINCT doc) per hash; membership is a LEFT ANTI
    join against the (typically tiny, but unbounded — so never
    broadcast-hinted; AQE may choose it from runtime stats) boilerplate
    hash set; reassembly is one groupBy with an array_sort over (pos,
    line) structs — per-document, so bounded by page size, no windows.
    ``persisted_out`` receives the exploded line table (three consumers:
    frequency count, anti join, per-doc totals).
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    norm = F.lower(F.trim(F.col("_line")))
    lines = pages.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    ).withColumn(
        "_key",
        F.when(norm == "", F.lit(None).cast("long")).otherwise(md5_long60(norm)),
    )
    if persisted_out is not None:
        lines = lines.persist()
        persisted_out.append(lines)
    boiler = (
        lines.where(F.col("_key").isNotNull())
        .groupBy("_key")
        .agg(F.countDistinct("_id").alias("_df"))
        .where(F.col("_df") >= min_docs)
        .select("_key")
    )
    kept = lines.join(boiler, "_key", "left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_pos"), F.col("_line")))
                ),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    totals = lines.groupBy("_id").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        pages.select(F.col(id_col).alias("_id"))
        .join(totals, "_id")
        .join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("_text", F.lit("")).alias("text"),
            "n_lines",
            (F.col("n_lines") - F.coalesce("_n_kept", F.lit(0))).alias(
                "n_removed"
            ),
        )
    )


def crawl_frontier(
    urls: DataFrame,
    score_col: str = "score",
    url_col: str = "url",
    domain_col: str = "domain",
    delay_col: str | None = None,
    max_per_domain: int | None = None,
) -> DataFrame:
    """Politeness-aware crawl-frontier scheduling (the Mercator frontier
    design, Heydon & Najork 2001): a crawler may hit each host at most
    once per politeness interval, so the frontier is consumed in per-
    domain WAVES — wave 0 holds every domain's best URL, wave 1 the
    second-best, and so on. This operator assigns each candidate URL its
    ``wave`` (per-domain priority rank, 0-based, score descending with
    URL tie-break) and its earliest ``fetch_at`` slot
    (``wave × crawl_delay``), leaving the dequeue order to the sink —
    consumers sort or range-partition on ``fetch_at``, so no global
    ordering is ever computed here.

    ``delay_col`` optionally carries a per-domain crawl delay (robots.txt
    ``Crawl-delay`` / adaptive politeness) — slots then spread out more
    for slow hosts; default is one slot per wave. ``max_per_domain``
    truncates each domain's queue (the same budget idea as
    :func:`domain_quota`, which caps a CORPUS by content rank; this caps
    the SCHEDULE by priority).

    Scale: one shuffle on the domain key; the rank window partitions by
    domain so no single-partition sort exists. A mega-domain still ranks
    inside one task — real frontiers shard such hosts by path prefix
    before scheduling; apply the same split upstream if one host carries
    a material fraction of the frontier. Deterministic at any
    parallelism: (score, url) is a total order within a domain.

    Output: the input columns plus ``wave`` and ``fetch_at`` (both long).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(domain_col).orderBy(
        F.desc(score_col), F.asc(url_col)
    )
    out = urls.withColumn("wave", (F.row_number().over(w) - 1).cast("long"))
    if max_per_domain is not None:
        if max_per_domain < 1:
            raise ValueError(f"max_per_domain must be >= 1, got {max_per_domain}")
        out = out.where(F.col("wave") < max_per_domain)
    delay = F.col(delay_col) if delay_col is not None else F.lit(1)
    return out.withColumn("fetch_at", (F.col("wave") * delay).cast("long"))


def robots_filter(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    rule_domain_col: str = "domain",
    rule_path_col: str = "rule_path",
    allow_col: str = "allow",
) -> DataFrame:
    """Robots-exclusion filtering with Google's documented precedence
    (RFC 9309 §2.2.2): among the crawl rules whose path prefix matches
    the URL's path, the LONGEST prefix wins, and on a length tie the
    Allow rule beats the Disallow; a URL matching no rule is allowed.
    This is the compliance gate between frontier scheduling
    (:func:`crawl_frontier`) and the fetch stage — applied set-wise over
    the whole frontier rather than per-request, which is what a batch
    recrawl needs.

    ``rules``: one row per (domain, path prefix, allow flag) — the
    pre-parsed form of each host's robots.txt (parsing the raw file is a
    per-host driver-side chore, not a data-plane operator). The rule
    table is host-grain (small); the join broadcasts under AQE. The
    only window is per-URL top-1 over that URL's matched rules — bounded
    by the host's rule count.

    Output: the input rows plus ``allowed`` (boolean), ``rule_path``
    (the winning prefix, NULL when no rule matched).
    """
    from pyspark.sql import Window

    path = F.regexp_replace(F.col(url_col), r"^[a-z]+://[^/]+", "")
    p = pages.withColumn("_path", path)
    r = rules.select(
        F.col(rule_domain_col).alias("_rd"),
        F.col(rule_path_col).alias("_rp"),
        F.col(allow_col).cast("boolean").alias("_ra"),
    )
    joined = p.join(
        r,
        (F.col(domain_col) == F.col("_rd"))
        & F.col("_path").startswith(F.col("_rp")),
        "left",
    )
    w = Window.partitionBy(url_col).orderBy(
        F.desc(F.length("_rp")), F.desc("_ra")
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            *[F.col(c) for c in pages.columns],
            F.coalesce(F.col("_ra"), F.lit(True)).alias("allowed"),
            F.col("_rp").alias("rule_path"),
        )
    )


def outlink_host_graph(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html_text",
) -> DataFrame:
    """Host-level outlink graph from raw page markup — the WAT-extraction
    step of a Common-Crawl-style pipeline: pull every absolute
    ``href="http(s)://..."`` target out of the HTML, reduce both endpoints
    to lowercase hosts, and aggregate to one edge per (src_host,
    dst_host) with link and page counts. This is the input
    :func:`minimel_spark.operators.graph.pagerank` and the spam-farm /
    mirror-ring analyses expect; self-loops (intra-host navigation) are
    kept — callers drop them when the analysis wants them gone.

    Extraction is a single JVM-side ``regexp_extract_all`` + explode (no
    UDF, no reparse); hosts come from one anchored regexp. Relative links
    are out of scope by design (resolving them needs the base URL's
    directory semantics — run :func:`canonical_url` upstream if you need
    that); the absolute-only contract is what host-graph studies use.

    Scale: narrow extract, then one map-side-combinable groupBy on the
    (src_host, dst_host) pair. Zipf-headed hubs are absorbed by partial
    aggregation — no row ever carries more than one link.

    Output: ``(src_host, dst_host, n_links, n_pages)``.
    """
    src_host = F.lower(
        F.regexp_extract(F.col(url_col), r"^https?://([^/]+)", 1)
    )
    links = F.expr(
        f"""regexp_extract_all({html_col}, 'href="(https?://[^"]+)"', 1)"""
    )
    return (
        pages.select(
            F.col(url_col).alias("_u"),
            src_host.alias("src_host"),
            F.explode(links).alias("_link"),
        )
        .select(
            "_u",
            "src_host",
            F.lower(F.regexp_extract("_link", r"^https?://([^/]+)", 1)).alias(
                "dst_host"
            ),
        )
        .where(F.col("dst_host") != "")
        .groupBy("src_host", "dst_host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_links"),
            F.countDistinct("_u").cast("long").alias("n_pages"),
        )
    )


def resolve_redirects(
    redirects: DataFrame,
    max_doublings: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Resolve HTTP redirect chains to their final targets by POINTER
    DOUBLING: round t composes the current mapping with itself
    (src → f(f(src))), so a chain of length L collapses in ⌈log₂ L⌉
    rounds rather than L sequential joins — with 4 doublings, chains up
    to 2⁴ = 16 hops resolve, which covers anything a real crawler
    follows (browsers give up at ~20). This is the canonicalization step
    between fetch and dedup: a cluster of urls 301-ing into one landing
    page is ONE document.

    Input: one row per redirect edge (each src redirects to exactly ONE
    dst — HTTP semantics; duplicate srcs are an upstream extraction bug
    and are rejected). A src whose chain ends at a non-redirecting URL
    maps to that URL with ``resolved`` true; a src still pointing at a
    redirecting URL after the budget (longer chain, or a redirect LOOP —
    loops never resolve at any budget) reports ``resolved`` false.

    Scale: each doubling is ONE self-join of the mapping (size = number
    of redirecting urls, never the full corpus) plus a localCheckpoint;
    log-round convergence is the same trick as the large-star/small-star
    components loop.

    Output: ``(src, final, hops_bounded, resolved)`` — one row per input
    src; ``hops_bounded`` is the hop count actually taken, capped by the
    doubling schedule (it equals the true chain length whenever
    resolution succeeded).
    """
    if max_doublings < 0:
        raise ValueError(f"max_doublings must be >= 0, got {max_doublings}")
    e = redirects.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    dup = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_n")).where(F.col("_n") > 1)
    # fail fast on a broken extraction rather than silently picking a branch
    if dup.limit(1).count() > 0:
        raise ValueError("duplicate src in redirects: each src must have one dst")
    m = e.select("_s", F.col("_d").alias("_f"), F.lit(1).alias("_h"))
    for _ in range(max_doublings):
        nxt = m.select(F.col("_s").alias("_f"), F.col("_f").alias("_f2"),
                       F.col("_h").alias("_h2"))
        m = (
            m.join(nxt, "_f", "left")
            .select(
                "_s",
                F.coalesce("_f2", "_f").alias("_f"),
                (F.col("_h") + F.coalesce("_h2", F.lit(0))).alias("_h"),
            )
            .localCheckpoint(eager=True)
        )
    still = e.select(F.col("_s").alias("_f"), F.lit(True).alias("_redirects"))
    return (
        m.join(still, "_f", "left")
        .select(
            F.col("_s").alias("src"),
            F.col("_f").alias("final"),
            F.col("_h").cast("long").alias("hops_bounded"),
            F.coalesce(~F.col("_redirects"), F.lit(True)).alias("resolved"),
        )
    )


def url_templates(
    pages: DataFrame, url_col: str = "url", min_urls: int = 1
) -> DataFrame:
    """URL template mining — the crawl-trap / infinite-space detector: a
    host serving millions of URLs that collapse onto ONE template
    (``/cal?d=N``, ``/s/H/p/N``) is generating pages, not publishing
    them, and a frontier should quota the TEMPLATE, not the URL
    (complements :func:`domain_quota`, which only sees host totals).
    Templates abstract the variable parts of the path+query:

    1. hex runs of >= 8 chars -> ``H`` (session ids, content hashes) —
       applied FIRST so long digit runs prefer ``H`` over ``N``;
    2. remaining digit runs  -> ``N`` (ids, dates, page numbers).

    Output, per (host, template) with at least ``min_urls`` members:
    ``(host, template, n_urls, example_url)`` — example_url = min(url),
    deterministic. One narrow projection + one groupBy; never a pair
    space, and the template table is hosts×templates-sized (tiny next to
    the frontier) so downstream joins against it broadcast.
    """
    if min_urls < 1:
        raise ValueError(f"min_urls must be >= 1, got {min_urls}")
    u = F.col(url_col)
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$", 1)
    tmpl = F.regexp_replace(
        F.regexp_replace(rest, "[0-9a-fA-F]{8,}", "H"), "[0-9]+", "N"
    )
    return (
        pages.select(host.alias("host"), tmpl.alias("template"), u.alias("_u"))
        .where(F.col("host") != "")
        .groupBy("host", "template")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.min("_u").alias("example_url"),
        )
        .where(F.col("n_urls") >= min_urls)
    )


def recrawl_priority(
    snaps: DataFrame,
    url_col: str = "url",
    snapshot_col: str = "snapshot",
    fp_col: str = "fingerprint",
    hot_threshold: float = 0.5,
) -> DataFrame:
    """Per-URL change-rate estimation from crawl history — the freshness
    scheduler's input (Cho & Garcia-Molina's recrawl-frequency problem):
    given (url, snapshot, content fingerprint) observations, count the
    consecutive-snapshot fingerprint changes and estimate

        change_rate = n_changes / (n_snapshots - 1)

    the MLE of the per-interval Bernoulli change probability. URLs with
    ``change_rate >= hot_threshold`` flag ``hot`` — recrawl every cycle;
    near-zero URLs can be demoted to slow cycles, which at crawl scale is
    most of the frontier and most of the savings.

    One per-URL lag window (bounded by history length) + one groupBy —
    all exact integers and one exact division; single-snapshot URLs get
    rate 0 (no interval observed), not NULL.

    Output: ``(url, n_snaps, n_changes, change_rate, hot)``.
    """
    rows = snaps.select(
        F.col(url_col).alias("url"),
        F.col(snapshot_col).alias("_s"),
        F.col(fp_col).alias("_fp"),
    ).withColumn(
        "_chg",
        (F.lag("_fp").over(
            Window.partitionBy("url").orderBy("_s")
        ).isNotNull()
         & (F.lag("_fp").over(Window.partitionBy("url").orderBy("_s")) != F.col("_fp"))
        ).cast("long"),
    )
    return (
        rows.groupBy("url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_snaps"),
            F.sum("_chg").cast("long").alias("n_changes"),
        )
        .withColumn(
            "change_rate",
            F.col("n_changes") / F.greatest(F.col("n_snaps") - 1, F.lit(1)),
        )
        .withColumn("hot", F.col("change_rate") >= hot_threshold)
    )
