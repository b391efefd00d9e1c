"""Web-snapshot curation tests: URL canonicalization semantics, newest-
version-wins dedup, per-domain quotas, snapshot diff, and the determinism /
plan-shape contracts the 100-TB path relies on."""

import pyspark.sql.functions as F
import pytest

from minimel_spark.operators.web import (
    canonical_url,
    domain_quota,
    latest_snapshots,
    snapshot_diff,
    url_domain,
)
from minimel_spark.sources.synth import snapshot_pages


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]


CANON_CASES = [
    # fragment dropped
    ("https://a.org/p#sec2", "a.org/p"),
    # scheme unified (http == https), host lowercased
    ("HTTP://A.ORG/p", "a.org/p"),
    # www. and default ports stripped
    ("https://www.a.org:443/p", "a.org/p"),
    ("http://a.org:80/p", "a.org/p"),
    # NON-default port kept
    ("http://a.org:8080/p", "a.org:8080/p"),
    # trailing slashes stripped (also multiple)
    ("https://a.org/p/", "a.org/p"),
    ("https://a.org/p///", "a.org/p"),
    # bare host: empty path stays empty
    ("https://a.org/", "a.org"),
    ("https://a.org", "a.org"),
    # tracking params dropped, survivors sorted, order-insensitive
    ("https://a.org/p?b=2&a=1", "a.org/p?a=1&b=2"),
    ("https://a.org/p?a=1&utm_source=x&b=2", "a.org/p?a=1&b=2"),
    ("https://a.org/p?utm_campaign=x&ref=rss&id=7", "a.org/p?id=7"),
    ("https://a.org/p?fbclid=abc&gclid=1&msclkid=2", "a.org/p"),
    # 'ref' dropped only as a whole param name ('refresh' survives)
    ("https://a.org/p?refresh=1&ref=x", "a.org/p?refresh=1"),
    # empty query / dangling '?'
    ("https://a.org/p?", "a.org/p"),
    # query on bare host
    ("https://www.a.org?id=1&utm_x=2", "a.org?id=1"),
]


def test_canonical_url_cases(spark):
    got = _canon(spark, [u for u, _ in CANON_CASES])
    for (u, want), g in zip(CANON_CASES, got):
        assert g == want, f"{u!r}: got {g!r}, want {want!r}"


def test_canonical_url_param_order_insensitive(spark):
    a, b = _canon(
        spark,
        [
            "https://www.a.org/p/?z=9&id=1&utm_source=feed#frag",
            "http://a.org:80/p?id=1&z=9",
        ],
    )
    assert a == b == "a.org/p?id=1&z=9"


def test_url_domain(spark):
    df = spark.createDataFrame(
        [("a.org/p?x=1",), ("b.example.org",), ("c.org:8080/q",)], "c string"
    )
    got = [r["d"] for r in df.select(url_domain(F.col("c")).alias("d")).collect()]
    assert got == ["a.org", "b.example.org", "c.org:8080"]


@pytest.fixture(scope="module")
def snap(spark, documents):
    # filter, not limit: deterministic slice, and no GlobalLimit
    # SinglePartition exchange polluting the plan-shape test below
    return snapshot_pages(documents.where(F.col("doc_id") < 300)).persist()


def test_snapshot_pages_canonical_collapses(spark, snap):
    """All snapshots of a doc share one canonical URL, distinct across docs."""
    c = snap.select(
        "doc_id", canonical_url(F.col("url")).alias("c")
    )
    per_doc = c.groupBy("doc_id").agg(F.countDistinct("c").alias("n")).collect()
    assert all(r["n"] == 1 for r in per_doc)
    n_docs = c.select("doc_id").distinct().count()
    assert c.select("c").distinct().count() == n_docs


def test_latest_snapshots_picks_newest(spark, snap):
    out = latest_snapshots(snap)
    # one row per canonical key
    assert out.count() == out.select("canonical_url").distinct().count()
    # the winner is the max warc_ts of its group: verify against a plain agg
    expect = (
        snap.select(canonical_url(F.col("url")).alias("canonical_url"), "warc_ts")
        .groupBy("canonical_url")
        .agg(F.max("warc_ts").alias("want_ts"), F.count(F.lit(1)).alias("want_n"))
    )
    j = out.join(expect, "canonical_url")
    assert j.where(
        (F.col("warc_ts") != F.col("want_ts"))
        | (F.col("n_snapshots") != F.col("want_n"))
    ).count() == 0


def test_latest_snapshots_tie_breaks_by_url(spark):
    rows = [
        ("http://a.org/p?x=1", "2024-01-01 00:00:00", "t1"),
        ("https://a.org/p/?x=1", "2024-01-01 00:00:00", "t2"),  # same ts, larger url
    ]
    df = spark.createDataFrame(rows, "url string, ts string, text string").select(
        "url", F.to_timestamp("ts").alias("warc_ts"), "text"
    )
    out = latest_snapshots(df).collect()
    assert len(out) == 1
    assert out[0]["url"] == "https://a.org/p/?x=1"  # max url wins the ts tie
    assert out[0]["n_snapshots"] == 2


def test_domain_quota_cap_and_determinism(spark, snap):
    latest = latest_snapshots(snap)
    out = domain_quota(latest, max_per_domain=3)
    per = out.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()
    assert per and all(r["n"] <= 3 for r in per)
    # parallelism-invariant kept set: recompute on a repartitioned input
    out2 = domain_quota(latest.repartition(17), max_per_domain=3)
    a = {(r["domain"], r["canonical_url"]) for r in out.collect()}
    b = {(r["domain"], r["canonical_url"]) for r in out2.collect()}
    assert a == b


def test_snapshot_diff_statuses(spark):
    mk = lambda rows: spark.createDataFrame(rows, "canonical_url string, fingerprint string")
    old = mk([("u1", "f1"), ("u2", "f2"), ("u3", "f3")])
    new = mk([("u2", "f2x"), ("u3", "f3"), ("u4", "f4")])
    got = {r["canonical_url"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {
        "u1": "removed",
        "u2": "changed",
        "u3": "unchanged",
        "u4": "added",
    }


def test_snapshot_diff_covers_all_statuses_on_fixture(spark, snap):
    pages = snap.select(
        "snapshot",
        canonical_url(F.col("url")).alias("canonical_url"),
        F.md5(F.col("text")).alias("fingerprint"),
    )
    d = snapshot_diff(
        pages.where(F.col("snapshot") == 0), pages.where(F.col("snapshot") == 1)
    )
    counts = {r["status"]: r["n"] for r in d.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"added", "removed", "changed", "unchanged"}


def test_no_single_partition_exchange(spark, snap):
    """The web family must stay scale-safe: no SinglePartition exchange in
    latest_snapshots or domain_quota plans (the rank window partitions by
    domain; the dedup is a hash agg)."""
    latest = latest_snapshots(snap)
    plan = domain_quota(latest, max_per_domain=5)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_strip_boilerplate_lines_hand_example(spark):
    import pytest

    from minimel_spark.operators.web import strip_boilerplate_lines

    pages = spark.createDataFrame(
        [
            (1, "NAV BAR\nunique body one\n\nmore text\n(c) site"),
            (2, "NAV BAR\nunique body two\n(c) site"),
            (3, "nav bar \nanother body"),  # case/trim-folds into NAV BAR
            (4, "NAV BAR\n(c) site"),  # all boilerplate
        ],
        "doc_id long, text string",
    )
    caches: list = []
    rows = {
        r["doc_id"]: r
        for r in strip_boilerplate_lines(
            pages, min_docs=2, persisted_out=caches
        ).collect()
    }
    for c in caches:
        c.unpersist()
    # shared lines removed in every doc; blank + unique lines kept verbatim
    assert rows[1]["text"] == "unique body one\n\nmore text"
    assert (rows[1]["n_lines"], rows[1]["n_removed"]) == (5, 2)
    assert rows[2]["text"] == "unique body two"
    assert rows[3]["text"] == "another body"
    # all-boilerplate doc survives with empty text, not dropped
    assert rows[4]["text"] == ""
    assert (rows[4]["n_lines"], rows[4]["n_removed"]) == (2, 2)
    with pytest.raises(ValueError, match="min_docs"):
        strip_boilerplate_lines(pages, min_docs=1)


def test_lined_pages_shape(spark, documents):
    from minimel_spark.sources.synth import lined_pages

    out = lined_pages(documents.limit(30))
    rows = out.collect()
    assert len(rows) == 30
    for r in rows:
        ls = r["text"].split("\n")
        assert ls[0] == "Home | About | Contact"
        assert ls[1] == f"Site news — domain {r['domain']}"
        assert ls[-1].startswith(f"(c) 2024 example{r['domain']}.org")
        assert len(ls) >= 4  # at least one body line
        # body lines re-wrap the words 8 per line
        assert all(len(b.split(" ")) <= 8 for b in ls[2:-1])


def test_crawl_frontier_waves_and_politeness(spark):
    from minimel_spark.operators.web import crawl_frontier

    urls = spark.createDataFrame(
        [
            ("u/a1", "a", 0.9, 2),
            ("u/a2", "a", 0.5, 2),
            ("u/a3", "a", 0.7, 2),
            ("u/b1", "b", 0.1, 1),
        ],
        "url string, domain string, score double, delay int",
    )
    out = {
        r["url"]: (r["wave"], r["fetch_at"])
        for r in crawl_frontier(urls, delay_col="delay").collect()
    }
    # domain a ranked by score desc: a1 (wave 0), a3 (1), a2 (2); delay 2
    assert out["u/a1"] == (0, 0)
    assert out["u/a3"] == (1, 2)
    assert out["u/a2"] == (2, 4)
    # domain b independent: its best is wave 0 regardless of score
    assert out["u/b1"] == (0, 0)
    # at most one URL per (domain, wave) — the politeness invariant
    waves = [(r["domain"], r["wave"]) for r in crawl_frontier(urls).collect()]
    assert len(waves) == len(set(waves))


def test_crawl_frontier_cap_and_ties(spark):
    import pytest

    from minimel_spark.operators.web import crawl_frontier

    urls = spark.createDataFrame(
        [("u/2", "a", 0.5), ("u/1", "a", 0.5), ("u/3", "a", 0.4)],
        "url string, domain string, score double",
    )
    out = crawl_frontier(urls, max_per_domain=2).collect()
    # cap truncates the queue; score ties break by url ascending
    kept = {r["url"]: r["wave"] for r in out}
    assert kept == {"u/1": 0, "u/2": 1}
    # default delay = 1 slot per wave
    assert {r["fetch_at"] for r in out} == {0, 1}
    with pytest.raises(ValueError):
        crawl_frontier(urls, max_per_domain=0)


def test_robots_filter_longest_match_and_tie_break(spark):
    from minimel_spark.operators.web import robots_filter

    pages = spark.createDataFrame(
        [
            ("https://a.example/private/x", "a"),   # disallowed by /private
            ("https://a.example/private/pub/x", "a"),  # longer Allow wins
            ("https://a.example/open/x", "a"),      # no rule -> allowed
            ("https://a.example/tie/x", "a"),       # equal-length rules -> Allow
            ("https://b.example/private/x", "b"),   # other domain: no rules
        ],
        "url string, domain string",
    )
    rules = spark.createDataFrame(
        [
            ("a", "/private", False),
            ("a", "/private/pub", True),
            ("a", "/tie/", True),
            ("a", "/tie/", False),
        ],
        "domain string, rule_path string, allow boolean",
    )
    out = {r["url"]: (r["allowed"], r["rule_path"]) for r in robots_filter(pages, rules).collect()}
    assert out["https://a.example/private/x"] == (False, "/private")
    assert out["https://a.example/private/pub/x"] == (True, "/private/pub")
    assert out["https://a.example/open/x"] == (True, None)
    assert out["https://a.example/tie/x"] == (True, "/tie/")
    assert out["https://b.example/private/x"] == (True, None)
    # one verdict per URL
    assert len(out) == 5


def test_outlink_host_graph_extraction(spark):
    from minimel_spark.operators.web import outlink_host_graph

    pages = spark.createDataFrame(
        [
            ("https://a.example/1",
             '<a href="https://b.example/x">b</a> <a href="/relative">r</a> '
             '<a href="https://b.example/y">b2</a>'),
            ("https://a.example/2", '<a href="http://c.example/z">c</a>'),
            ("https://a.example/3", "<p>nothing here</p>"),
            ("https://b.example/1", '<a href="https://a.example/">back</a>'),
        ],
        "url string, html_text string",
    )
    out = {
        (r["src_host"], r["dst_host"]): (r["n_links"], r["n_pages"])
        for r in outlink_host_graph(pages).collect()
    }
    # two links from one page to b.example: n_links=2, n_pages=1
    assert out[("a.example", "b.example")] == (2, 1)
    # http (not just https) links count; relative links never appear
    assert out[("a.example", "c.example")] == (1, 1)
    assert out[("b.example", "a.example")] == (1, 1)
    assert len(out) == 3


def test_resolve_redirects_chain_loop_and_budget(spark):
    import pytest

    from minimel_spark.operators.web import resolve_redirects

    edges = spark.createDataFrame(
        # a->b->c->d (3 hops), e->f (1 hop), loop g->h->g
        [("a", "b"), ("b", "c"), ("c", "d"), ("e", "f"), ("g", "h"), ("h", "g")],
        "src string, dst string",
    )
    out = {r["src"]: r for r in resolve_redirects(edges, max_doublings=3).collect()}
    assert out["a"]["final"] == "d" and out["a"]["hops_bounded"] == 3
    assert out["a"]["resolved"]
    assert out["b"]["final"] == "d" and out["b"]["hops_bounded"] == 2
    assert out["e"]["final"] == "f" and out["e"]["hops_bounded"] == 1
    # the loop never lands on a non-redirecting url
    assert not out["g"]["resolved"] and not out["h"]["resolved"]
    # 2^0 doublings resolve only 1-hop chains
    z = {r["src"]: r for r in resolve_redirects(edges, max_doublings=0).collect()}
    assert z["e"]["resolved"] and not z["a"]["resolved"]
    with pytest.raises(ValueError):
        resolve_redirects(edges, max_doublings=-1)


def test_resolve_redirects_rejects_duplicate_src(spark):
    import pytest

    from minimel_spark.operators.web import resolve_redirects

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "src string, dst string"
    )
    with pytest.raises(ValueError, match="duplicate src"):
        resolve_redirects(edges)


def test_url_templates_abstraction_rules(spark):
    from minimel_spark.operators.web import url_templates

    urls = [
        "https://a.example/article/123",
        "https://a.example/article/99999",
        "https://a.example/s/deadbeefcafe1234/p/3",   # hex run -> H
        "https://a.example/d/12345678/x",             # 8+ digits: hex too -> H
        "https://a.example/d/1234567/x",              # 7 digits -> N
        "HTTPS://A.EXAMPLE/article/7",                # host lowercased
        "not a url",                                   # no host -> dropped
        "https://b.example/cal?d=20260101",
    ]
    docs = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        (r["host"], r["template"]): (r["n_urls"], r["example_url"])
        for r in url_templates(docs).collect()
    }
    assert got[("a.example", "/article/N")] == (3, "HTTPS://A.EXAMPLE/article/7")
    assert got[("a.example", "/s/H/p/N")][0] == 1
    assert got[("a.example", "/d/H/x")][0] == 1
    assert got[("a.example", "/d/N/x")][0] == 1
    assert got[("b.example", "/cal?d=H")][0] == 1   # 8-digit date is hex-run
    assert sum(n for n, _ in got.values()) == 7      # "not a url" dropped


def test_url_templates_min_urls_and_invariance(spark):
    import pytest as _pytest

    from minimel_spark.operators.web import url_templates

    docs = spark.createDataFrame(
        [(f"https://h.example/p/{i}",) for i in range(20)]
        + [("https://h.example/about",)],
        "url string",
    )
    a = sorted(map(tuple, url_templates(docs.coalesce(1)).collect()))
    b = sorted(map(tuple, url_templates(docs.repartition(8)).collect()))
    assert a == b and len(a) == 2
    big = url_templates(docs, min_urls=2).collect()
    assert len(big) == 1 and big[0]["template"] == "/p/N"
    with _pytest.raises(ValueError):
        url_templates(docs, min_urls=0)


def test_recrawl_priority_hand_history(spark):
    from minimel_spark.operators.web import recrawl_priority

    hist = [
        # url A: changes every interval (5 snaps, 4 changes) -> hot
        *[("A", s, f"vA{s}") for s in range(5)],
        # url B: one change across 5 snaps -> rate 0.25
        ("B", 0, "b0"), ("B", 1, "b0"), ("B", 2, "b1"), ("B", 3, "b1"), ("B", 4, "b1"),
        # url C: never changes
        *[("C", s, "same") for s in range(4)],
        # url D: single observation -> rate 0, not hot
        ("D", 0, "d0"),
    ]
    snaps = spark.createDataFrame(hist, "url string, snapshot long, fingerprint string")
    got = {r["url"]: r for r in recrawl_priority(snaps).collect()}
    assert got["A"]["n_changes"] == 4 and got["A"]["change_rate"] == 1.0 and got["A"]["hot"]
    assert got["B"]["n_changes"] == 1 and got["B"]["change_rate"] == 0.25 and not got["B"]["hot"]
    assert got["C"]["n_changes"] == 0 and got["C"]["change_rate"] == 0.0
    assert got["D"]["n_snaps"] == 1 and got["D"]["change_rate"] == 0.0 and not got["D"]["hot"]


def test_recrawl_priority_partition_invariant(spark):
    from minimel_spark.operators.web import recrawl_priority

    snaps = spark.createDataFrame(
        [(f"u{i % 10}", s, f"f{(i * s) % 3}") for i in range(40) for s in range(4)],
        "url string, snapshot long, fingerprint string",
    )
    # collapse duplicate (url, snapshot) rows to one deterministic fp first
    import pyspark.sql.functions as F

    one = snaps.groupBy("url", "snapshot").agg(F.min("fingerprint").alias("fingerprint"))
    a = sorted(map(tuple, recrawl_priority(one.coalesce(1)).collect()))
    b = sorted(map(tuple, recrawl_priority(one.repartition(16)).collect()))
    assert a == b and len(a) == 10
