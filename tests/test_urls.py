"""URL curation operators (round 13): canonicalization grid
properties (idempotence, cross-engine equality, invariants), dedup
keeper rule, and the domain cap."""

import itertools

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from myodish_peak_analysis_spark.llm.urls import (
    canonical_url,
    canonical_url_sql,
    domain_caps,
    synth_urls,
    url_dedup,
    with_canonical_url,
)

SF001 = "/root/testdata/sf0.001"


def _grid() -> list:
    schemes = ["http", "HTTP", "https", "HTTPS", "ftp"]
    hosts = ["Example.COM", "sub.example.org"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/a", "/A/", "/a//", "/a/b"]
    queries = [
        "",
        "?utm_source=x",
        "?id=1",
        "?id=1&utm_medium=m&b=2",
        "?UTM_SOURCE=x&keep=1",
        "?utm_",
        "?a&&b",
        "?x=1?y=2",
    ]
    frags = ["", "#f", "#f?x=1"]
    urls = [
        f"{s}://{h}{po}{pa}{q}{fr}"
        for s, h, po, pa, q, fr in itertools.product(
            schemes, hosts, ports, paths, queries, frags
        )
    ]
    # scheme-less and whitespace inputs pass through trimmed
    urls += ["example.com/a", "  plain-text  ", ""]
    return urls


@pytest.fixture(scope="module")
def grid_canon(spark):
    urls = _grid()
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    out = df.select(
        "i",
        "url",
        canonical_url("url").alias("c1"),
    ).withColumn("c2", canonical_url("c1"))
    rows = {r.i: r for r in out.collect()}
    return urls, rows


def test_canonicalize_idempotent_on_grid(spark, grid_canon):
    urls, rows = grid_canon
    for i in range(len(urls)):
        assert rows[i].c2 == rows[i].c1, (urls[i], rows[i].c1, rows[i].c2)


def test_canonicalize_matches_duckdb_on_grid(spark, grid_canon):
    """The Spark Column implementation and the DuckDB oracle
    expression are the SAME function on the full grid — the
    cross-engine contract every oracle-checked query relies on."""
    urls, rows = grid_canon
    con = duckdb.connect()
    con.register("u", pd.DataFrame({"i": range(len(urls)), "url": urls}))
    duck = dict(
        con.sql(
            f"SELECT i, {canonical_url_sql('url')} AS c FROM u"
        ).fetchall()
    )
    for i in range(len(urls)):
        assert duck[i] == rows[i].c1, (urls[i], duck[i], rows[i].c1)


def test_canonicalize_invariants_on_grid(grid_canon):
    urls, rows = grid_canon
    for i, u in enumerate(urls):
        c = rows[i].c1
        if "://" not in u:
            assert c == u.strip()
            continue
        assert "#" not in c
        scheme, rest = c.split("://", 1)
        assert scheme == scheme.lower()
        hostport = rest.split("/", 1)[0].split("?", 1)[0]
        host = hostport.split(":", 1)[0]
        assert host == host.lower()
        assert not (scheme == "http" and hostport.endswith(":80"))
        assert not (scheme == "https" and hostport.endswith(":443"))
        # tracking params never survive
        if "?" in c:
            q = c.split("?", 1)[1]
            for p in q.split("&"):
                assert not p.lower().startswith(
                    ("utm_", "fbclid", "gclid", "msclkid")
                ), c
        # path never ends with a slash except the bare root
        tail = rest[len(hostport):].split("?", 1)[0]
        assert tail == "/" or not tail.endswith("/"), c


def test_canonical_specifics():
    """Spot pins for each rule (checked via the DuckDB expression —
    same function as Spark per the grid test, no JVM needed)."""
    con = duckdb.connect()

    def c(u):
        return con.sql(
            f"SELECT {canonical_url_sql('u')} FROM (SELECT '{u}' AS u)"
        ).fetchone()[0]

    assert c("HTTPS://Ex.COM:443/a/") == "https://ex.com/a"
    assert c("http://ex.com:80") == "http://ex.com/"
    assert c("http://ex.com:8080/a") == "http://ex.com:8080/a"
    assert c("https://ex.com/a?utm_source=x&id=1#f") == "https://ex.com/a?id=1"
    assert c("https://ex.com/a?utm_source=x") == "https://ex.com/a"
    assert c("ftp://Ex.Com:80/f/") == "ftp://ex.com:80/f"
    assert c("https://ex.com/a//") == "https://ex.com/a"


def test_url_dedup_collision_groups(spark):
    """Variants 0-2 of a doc_id%200 class canonicalize identically:
    the keeper is the lowest doc_id of the class and n_copies counts
    the class's colliding variants."""
    from myodish_peak_analysis_spark.schema import read_table

    docs = read_table(spark, SF001, "documents")
    out = {
        r.canonical_url: (r.keeper_doc_id, r.n_copies)
        for r in url_dedup(synth_urls(docs)).collect()
    }
    # doc_ids 0,1,2 (variants 0,1,2 of class 0..2): classes differ,
    # but 200%4==0 means doc 200 shares class 0 AND variant 0 — compute
    # the expectation directly from the synth contract instead:
    n_docs = docs.count()
    expect: dict = {}
    for d in range(n_docs):
        v, base = d % 4, d % 200
        if v == 3:
            key = f"http://blog.example.org:8080/post/{d}?id={base}"
        else:
            key = f"https://news.example.com/articles/{base}"
        lo, n = expect.get(key, (d, 0))
        expect[key] = (min(lo, d), n + 1)
    assert out == expect


def test_domain_caps_binds_per_domain(spark):
    """The cap binds on the big host and not on the small one; ranks
    are dense and survivors are each domain's best-quality docs."""
    from myodish_peak_analysis_spark.schema import read_table

    docs = read_table(spark, SF001, "documents")
    joined = synth_urls(docs).join(docs.select("doc_id", "text"), "doc_id")
    out = domain_caps(joined, max_per_domain=30).collect()
    by_dom: dict = {}
    for r in out:
        by_dom.setdefault(r.domain, []).append(r)
    assert set(by_dom) == {"news.example.com", "blog.example.org"}
    assert len(by_dom["news.example.com"]) == 30  # ~750 candidates, capped
    # blog host has n_docs/4 candidates; cap binds only if > 30
    for dom, rows in by_dom.items():
        ranks = sorted(r.domain_rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        assert all(r.domain_rank <= 30 for r in rows)
