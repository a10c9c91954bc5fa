"""Redirect-chain resolution: engine == pure kernel == DuckDB
recursive-CTE oracle, on fixed shapes and hypothesis-random graphs."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nipper_spark.crawl.redirects import (redirect_oracle_sql,
                                          resolve_chain,
                                          resolve_redirects,
                                          resolve_redirects_py)
from nipper_spark.session import build_session


@pytest.fixture(scope="module")
def spark():
    return build_session("redirect-tests", master="local[4]",
                         shuffle_partitions=4)


def _engine_rows(spark, edges, max_hops):
    df = spark.createDataFrame(edges, "url string, redirect_to string")
    out = resolve_redirects(df, max_hops=max_hops)
    return sorted((r.url, r.final_url, r.hops, r.resolved)
                  for r in out.collect())


def _oracle_rows(edges, max_hops):
    con = duckdb.connect()
    vals = " UNION ALL ".join(
        f"SELECT '{u}' AS url, '{t}' AS redirect_to" for u, t in edges)
    rows = con.execute(redirect_oracle_sql(vals, max_hops)).fetchall()
    return sorted(rows)


CASES = [
    # plain chain a->b->c->T
    ([("a", "b"), ("b", "c"), ("c", "T")], 16,
     [("a", "T", 3, True), ("b", "T", 2, True), ("c", "T", 1, True)]),
    # self-loop never resolves
    ([("s", "s")], 16, [("s", None, None, False)]),
    # 2-cycle with a tail: tail and cycle members all unresolved
    ([("t", "x"), ("x", "y"), ("y", "x")], 16,
     [("t", None, None, False), ("x", None, None, False),
      ("y", None, None, False)]),
    # cap boundary: length == max_hops resolves, length+1 does not
    ([("a", "b"), ("b", "c"), ("c", "d"), ("d", "T")], 4,
     [("a", "T", 4, True), ("b", "T", 3, True), ("c", "T", 2, True),
      ("d", "T", 1, True)]),
    ([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "T")], 4,
     [("a", None, None, False), ("b", "T", 4, True), ("c", "T", 3, True),
      ("d", "T", 2, True), ("e", "T", 1, True)]),
    # duplicate fetch rows: deterministic min-target dedup
    ([("a", "z"), ("a", "b"), ("b", "T")], 16,
     [("a", "T", 2, True), ("b", "T", 1, True)]),
    # max_hops=1: only direct-to-terminal resolves
    ([("a", "b"), ("b", "T")], 1,
     [("a", None, None, False), ("b", "T", 1, True)]),
]


@pytest.mark.parametrize("edges,max_hops,want", CASES)
def test_fixed_shapes(spark, edges, max_hops, want):
    assert _engine_rows(spark, edges, max_hops) == want
    assert resolve_redirects_py(edges, max_hops) == want
    assert _oracle_rows(edges, max_hops) == want


def test_kernel_chain_semantics():
    m = {"a": "b", "b": "c", "c": "T"}
    assert resolve_chain(m, "a", 16) == ("T", 3, True)
    assert resolve_chain(m, "a", 2) == (None, None, False)
    assert resolve_chain(m, "a", 3) == ("T", 3, True)


@settings(max_examples=12, deadline=None)
@given(st.dictionaries(
    st.integers(0, 14).map(lambda i: f"u{i}"),
    st.integers(0, 19).map(lambda i: f"u{i}"),
    min_size=1, max_size=12),
    st.sampled_from([1, 2, 3, 5, 16]))
def test_engine_matches_kernel_random(spark, mapping, max_hops):
    """Random functional graphs (chains, trees into cycles, self-loops,
    dangling targets): distributed pointer jumping == pure kernel."""
    edges = sorted(mapping.items())
    assert _engine_rows(spark, edges, max_hops) == \
        resolve_redirects_py(edges, max_hops)


def test_alias_seen_rows(spark):
    from nipper_spark.crawl.politeness import CrawlPolicy
    from nipper_spark.crawl.redirects import redirect_alias_seen_rows
    df = spark.createDataFrame(
        [("http://a.test/1", "http://a.test/2"),
         ("http://a.test/2", "http://b.test/x")],
        "url string, redirect_to string")
    res = resolve_redirects(df, max_hops=8)
    seen = redirect_alias_seen_rows(res, CrawlPolicy(n_buckets=4),
                                    round_no=3)
    rows = {r.url: r for r in seen.collect()}
    assert set(rows) == {"http://a.test/1", "http://a.test/2"}
    assert all(r["round"] == 3 for r in rows.values())
    assert all(r.url_hash is not None and r.host_bucket is not None
               for r in rows.values())
