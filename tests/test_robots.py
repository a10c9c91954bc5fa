"""robots.txt parsing + policy folding + engine/oracle agreement when
rules come from the corpus itself."""

import datetime

import pytest

from nipper_spark.crawl.politeness import CrawlPolicy
from nipper_spark.crawl.robots import (
    harvest_robots, parse_robots_txt)

ROBOTS = """
# comment
User-agent: *
Disallow: /private/
Disallow: /tmp
Allow: /private/ok/
Crawl-delay: 10

User-agent: evilbot
Disallow: /
"""


class TestParse:
    def test_groups_and_rules(self):
        r = parse_robots_txt(ROBOTS)
        assert r.disallow == ["/private/", "/tmp"]
        assert r.allow == ["/private/ok/"]
        assert r.crawl_delay == 10.0

    def test_agent_specific(self):
        r = parse_robots_txt(ROBOTS, agent="evilbot")
        assert r.disallow == ["/"]

    def test_allowed_longest_prefix(self):
        r = parse_robots_txt(ROBOTS)
        assert r.allowed("/public/x")
        assert not r.allowed("/private/x")
        assert r.allowed("/private/ok/x")
        assert not r.allowed("/tmp/y")

    def test_stacked_agents_share_group(self):
        r = parse_robots_txt(
            "User-agent: a\nUser-agent: *\nDisallow: /x\n")
        assert r.disallow == ["/x"]

    def test_bytes_and_garbage(self):
        assert parse_robots_txt(b"\xff\xfegarbage").disallow == []
        assert parse_robots_txt("Disallow: /orphan\n").disallow == []


class TestHarvest:
    def test_fold_into_policy(self):
        policy = CrawlPolicy(default_tokens=20)
        harvest_robots(
            [("http://a.test/robots.txt", ROBOTS),
             ("http://b.test/robots.txt",
              "User-agent: *\nCrawl-delay: 2\n")],
            policy, round_seconds=60.0)
        assert policy.robots_disallow["a.test"] == ["/private/", "/tmp"]
        # delay 10 → 6 tokens; delay 2 → capped at default 20 → 30→20
        assert policy.host_tokens["a.test"] == 6
        assert policy.host_tokens["b.test"] == 20

    def test_engine_oracle_agree_with_harvested_robots(self, tmp_path):
        from nipper_spark.crawl.frontier import FrontierEngine
        from nipper_spark.crawl.oracle import crawl_oracle
        from nipper_spark.crawl.robots import harvest_robots_from_pages
        from nipper_spark.crawl.state import SCHEDULE_SCHEMA, CrawlState
        from nipper_spark.session import build_session
        from nipper_spark.sources.synthetic import (
            PAGES_SCHEMA, synth_pages_rows)

        spark = build_session("robots-tests", master="local[4]",
                              shuffle_partitions=4)
        rows = synth_pages_rows(n_pages=30, links_per_page=4, n_hosts=6,
                                seed=11)
        # one host publishes robots.txt disallowing a page prefix and a
        # crawl delay that throttles it
        host = rows[0][0].split("/page/")[0]  # http://hostNN.test
        robots_row = (f"{host}/robots.txt",
                      datetime.datetime(2024, 1, 1),
                      b"User-agent: *\nDisallow: /page/1\nCrawl-delay: 30\n",
                      None, "en")
        all_rows = rows + [robots_row]
        pages = spark.createDataFrame(all_rows, PAGES_SCHEMA)

        policy = CrawlPolicy(default_tokens=5, n_buckets=4)
        policy = harvest_robots_from_pages(pages, policy,
                                           round_seconds=60.0)
        hostname = host.split("//")[1]
        assert policy.robots_disallow[hostname] == ["/page/1"]
        assert policy.host_tokens[hostname] == 2  # 60/30

        seeds = [(rows[0][0], 1.0), (rows[1][0], 0.9)]
        oracle = crawl_oracle({u: h for (u, _, h, _, _) in all_rows},
                              seeds, policy, max_rounds=6)
        d = str(tmp_path / "state")
        eng = FrontierEngine(spark, pages, d, policy)
        eng.bootstrap(seeds)
        for r in range(6):
            eng.run_round(r)
        st = CrawlState(spark, d)
        sched = st.read_all_rounds("schedule", 5, SCHEDULE_SCHEMA) \
            .orderBy("round", "seq").collect()
        got = {}
        for x in sched:
            got.setdefault(x["round"], []).append(
                (x["url"], x["host"], x["depth"], x["score"]))
        for r, wave in enumerate(oracle.schedules[:6]):
            assert got.get(r, []) == wave, f"round {r}"
        # robots honored: the disallowed prefix never scheduled
        for waves in got.values():
            for url, h, _, _ in waves:
                assert policy.allowed(h, url)

    def test_harvest_tables_edge_cases(self):
        """Duplicate robots rows per host merge (distinct prefixes, min
        tokens); delay-only and garbage bodies don't emit rule rows."""
        import datetime

        from nipper_spark.crawl.robots import harvest_robots_tables
        from nipper_spark.session import build_session
        from nipper_spark.sources.synthetic import PAGES_SCHEMA

        spark = build_session("robots-tests", master="local[4]",
                              shuffle_partitions=4)
        ts = datetime.datetime(2024, 1, 1)
        rows = [
            ("http://a.test/robots.txt", ts,
             b"User-agent: *\nDisallow: /x\nCrawl-delay: 30\n", None, "en"),
            # second row for the same host: overlapping prefix + a
            # LOOSER delay — prefixes union, tokens take the min
            ("http://a.test/robots.txt", ts,
             b"User-agent: *\nDisallow: /x\nDisallow: /y\n"
             b"Crawl-delay: 10\n", None, "en"),
            ("http://delay-only.test/robots.txt", ts,
             b"User-agent: *\nCrawl-delay: 600\n", None, "en"),
            ("http://garbage.test/robots.txt", ts,
             b"\xff\xfe\x00not robots at all", None, "en"),
        ]
        pages = spark.createDataFrame(rows, PAGES_SCHEMA)
        rules, budgets = harvest_robots_tables(pages, round_seconds=60.0,
                                               default_tokens=8)
        got_rules = sorted((r["host"], r["prefix"])
                           for r in rules.collect())
        assert got_rules == [("a.test", "/x"), ("a.test", "/y")]
        got_budget = {r["host"]: r["tokens"] for r in budgets.collect()}
        # 60/30=2 and 60/10=6 → min 2; delay 600 → floor(0.1) → min 1
        assert got_budget == {"a.test": 2, "delay-only.test": 1}

    def test_engine_oracle_agree_with_rules_tables_10k_hosts(self,
                                                             tmp_path):
        """The scale path: robots/budget state as per-host TABLES
        (harvest_robots_tables) joined by the engine — never driver
        dicts compiled into Catalyst literals. 10,000 distinct hosts
        with rules prove the analyzer survives (a literal expression
        would be a 10k-term boolean tree) while the crawl itself stays
        oracle-exact; the oracle twin reads the SAME tables via
        policy_from_tables."""
        from nipper_spark.crawl.frontier import FrontierEngine
        from nipper_spark.crawl.oracle import crawl_oracle
        from nipper_spark.crawl.robots import (
            harvest_robots_tables, policy_from_tables)
        from nipper_spark.crawl.state import SCHEDULE_SCHEMA, CrawlState
        from nipper_spark.session import build_session
        from nipper_spark.sources.synthetic import (
            PAGES_SCHEMA, synth_pages_rows)

        spark = build_session("robots-tests", master="local[4]",
                              shuffle_partitions=4)
        rows = synth_pages_rows(n_pages=40, links_per_page=4, n_hosts=6,
                                seed=23)
        content_hosts = sorted({r[0].split("//")[1].split("/")[0]
                                for r in rows})
        ts = datetime.datetime(2024, 1, 1)
        robots_rows = []
        # two content hosts get real rules + a crawl delay; 10k
        # unrelated hosts get rules too (the dim the join must survive)
        for h in content_hosts[:2]:
            robots_rows.append(
                (f"http://{h}/robots.txt", ts,
                 b"User-agent: *\nDisallow: /page/1\nCrawl-delay: 20\n",
                 None, "en"))
        for i in range(10_000):
            robots_rows.append(
                (f"http://rules{i:05d}.test/robots.txt", ts,
                 f"User-agent: *\nDisallow: /x{i}\nCrawl-delay: 5\n"
                 .encode(), None, "en"))
        pages = spark.createDataFrame(rows + robots_rows, PAGES_SCHEMA)

        rules_df, budgets_df = harvest_robots_tables(
            pages, round_seconds=60.0, default_tokens=5)
        assert rules_df.count() == 10_002
        assert budgets_df.count() == 10_002

        # oracle reads the same tables (test-scale collect)
        opolicy = policy_from_tables(
            CrawlPolicy(default_tokens=5, n_buckets=4),
            rules_df, budgets_df)
        assert opolicy.robots_disallow[content_hosts[0]] == ["/page/1"]
        assert opolicy.host_tokens[content_hosts[0]] == 3  # 60/20

        seeds = [(rows[0][0], 1.0), (rows[1][0], 0.9)]
        oracle = crawl_oracle({u: h for (u, _, h, _, _) in rows},
                              seeds, opolicy, max_rounds=4)

        # engine gets ONLY the tables — its policy holds no rule dicts
        epolicy = CrawlPolicy(default_tokens=5, n_buckets=4)
        d = str(tmp_path / "state10k")
        eng = FrontierEngine(spark, pages, d, epolicy,
                             rules=rules_df, budgets=budgets_df)
        eng.bootstrap(seeds)
        for r in range(4):
            eng.run_round(r)
        st = CrawlState(spark, d)
        sched = st.read_all_rounds("schedule", 3, SCHEDULE_SCHEMA) \
            .orderBy("round", "seq").collect()
        got = {}
        for x in sched:
            got.setdefault(x["round"], []).append(
                (x["url"], x["host"], x["depth"], x["score"]))
        for r, wave in enumerate(oracle.schedules[:4]):
            assert got.get(r, []) == wave, f"round {r}"
        for waves in got.values():
            for url, h, _, _ in waves:
                assert opolicy.allowed(h, url)


class TestPolicyCollectGuard:
    def test_policy_from_tables_raises_above_bound(self, tmp_path):
        """The oracle-twin collect is structurally bounded: an
        engine-path caller handing it a corpus-scale table fails fast
        instead of OOMing the driver."""
        from nipper_spark.crawl.politeness import CrawlPolicy
        from nipper_spark.crawl.robots import policy_from_tables
        from nipper_spark.session import build_session
        spark = build_session("robots-guard", master="local[4]",
                              shuffle_partitions=4)
        from pyspark.sql import functions as F
        rules = spark.range(50).select(
            F.concat(F.lit("h"), F.col("id").cast("string"),
                     F.lit(".test")).alias("host"),
            F.lit("/private").alias("prefix"))
        budgets = spark.createDataFrame([], "host string, tokens int")
        with pytest.raises(ValueError, match="exceeds 10 rows"):
            policy_from_tables(CrawlPolicy(), rules, budgets, max_rows=10)
        # within the bound: folds normally
        pol = policy_from_tables(CrawlPolicy(), rules.limit(5), budgets,
                                 max_rows=10)
        assert len(pol.robots_disallow) == 5


class TestRfc9309:
    """RFC 9309 matching: * / trailing-$ wildcards, longest-match
    precedence with Allow winning ties — pure kernel, dict policy,
    and the distributed rules-table filter must all agree."""

    def test_rule_matches_wildcards(self):
        from nipper_spark.crawl.robots import rule_matches
        assert rule_matches("/fish*", "/fishheads/yummy.html")
        assert rule_matches("/*.php", "/folder/filename.php?x=1")
        assert rule_matches("/*.php$", "/filename.php")
        assert not rule_matches("/*.php$", "/filename.php5")
        assert not rule_matches("/fish", "/catfish")  # anchored at start
        assert rule_matches("/fish", "/fish.html")
        # % and _ are literals in rules (LIKE translation must escape)
        assert rule_matches("/p_1", "/p_1/x")
        assert not rule_matches("/p_1", "/pX1/x")

    def test_decision_precedence(self):
        from nipper_spark.crawl.robots import robots_decision
        # Disallow: /  +  Allow: /public — the common pattern the old
        # prefix-collapse model lost
        assert robots_decision(["/"], ["/public"], "/public/a")
        assert not robots_decision(["/"], ["/public"], "/private/a")
        # longer disallow beats shorter allow
        assert not robots_decision(["/private/x"], ["/priv"],
                                   "/private/x/y")
        # equal length: allow wins
        assert robots_decision(["/page"], ["/page"], "/page/1")
        # wildcard lengths count as written
        assert not robots_decision(["/*.pdf$"], [], "/a/b.pdf")

    def test_policy_allowed_uses_rfc_semantics(self):
        pol = CrawlPolicy(
            robots_disallow={"h.test": ["/"]},
            robots_allow={"h.test": ["/public"]})
        assert pol.allowed("h.test", "http://h.test/public/x")
        assert not pol.allowed("h.test", "http://h.test/secret")
        assert pol.allowed("other.test", "http://other.test/secret")

    def test_distributed_filter_matches_kernel(self):
        """robots_filter over a candidates×rules cross-section equals
        the pure robots_decision for every URL — wildcards, anchors,
        LIKE-escaping (_ %), allow precedence, rule-free hosts."""
        from pyspark.sql import functions as F

        from nipper_spark.crawl.politeness import robots_filter
        from nipper_spark.crawl.robots import robots_decision
        from nipper_spark.session import build_session
        spark = build_session("rfc-robots", master="local[4]",
                              shuffle_partitions=4)
        rules = [
            ("a.test", "/", False), ("a.test", "/public", True),
            ("a.test", "/*.pdf$", False),
            ("b.test", "/fish*", False), ("b.test", "/fish*/bowl", True),
            ("c.test", "/p_1", False), ("c.test", "/x%y", False),
        ]
        paths = ["/", "/public", "/public/a.pdf", "/doc.pdf",
                 "/doc.pdfx", "/fishheads", "/fishheads/bowl/x",
                 "/fry", "/p_1/z", "/pQ1/z", "/x%y/q", "/xAy/q"]
        cand_rows = [(f"http://{h}/{p.lstrip('/')}" if p != "/" else
                      f"http://{h}/", h)
                     for h in ("a.test", "b.test", "c.test", "d.test")
                     for p in paths]
        cand = spark.createDataFrame(cand_rows, "url string, host string")
        rules_df = spark.createDataFrame(
            rules, "host string, prefix string, allow boolean")
        got = {r["url"] for r in robots_filter(
            cand, CrawlPolicy(), rules=rules_df,
            rules_rows=len(rules)).collect()}
        by_host: dict[str, tuple[list, list]] = {}
        for h, r, allow in rules:
            dis, alw = by_host.setdefault(h, ([], []))
            (alw if allow else dis).append(r)
        for url, h in cand_rows:
            i = url.find("/", url.find("://") + 3)
            path = url[i:] if i != -1 else "/"
            dis, alw = by_host.get(h, ((), ()))
            expect = robots_decision(dis, alw, path)
            assert (url in got) == expect, (url, expect)

    def test_engine_oracle_agree_with_wildcard_allow_rules(
            self, tmp_path):
        """A crawl whose robots.txt uses wildcards + Allow stays
        engine==oracle exact (harvested tables drive the engine; the
        folded dict policy drives the oracle — same kernels)."""
        from nipper_spark.crawl.frontier import FrontierEngine
        from nipper_spark.crawl.oracle import crawl_oracle
        from nipper_spark.crawl.robots import (
            harvest_robots_tables, policy_from_tables)
        from nipper_spark.crawl.state import (
            SCHEDULE_SCHEMA, SEEN_SCHEMA, CrawlState)
        from nipper_spark.session import build_session
        from nipper_spark.sources.synthetic import (
            PAGES_SCHEMA, synth_pages_rows)
        spark = build_session("rfc-crawl", master="local[4]",
                              shuffle_partitions=4)
        rows = synth_pages_rows(n_pages=40, links_per_page=4, n_hosts=6,
                                seed=13)
        host = rows[0][0].split("/page/")[0]
        robots_row = (f"{host}/robots.txt",
                      datetime.datetime(2024, 1, 1),
                      b"User-agent: *\n"
                      b"Disallow: /\n"
                      b"Allow: /page/1*\n"
                      b"Allow: /page/2\n",
                      None, "en")
        all_rows = rows + [robots_row]
        pages = spark.createDataFrame(all_rows, PAGES_SCHEMA)
        rules_df, budgets_df = harvest_robots_tables(pages)
        policy = CrawlPolicy(default_tokens=5, n_buckets=4)
        oracle_policy = policy_from_tables(
            CrawlPolicy(default_tokens=5, n_buckets=4),
            rules_df, budgets_df)
        hostname = host.split("//")[1]
        assert oracle_policy.robots_allow[hostname] == [
            "/page/1*", "/page/2"]
        seeds = [(rows[1][0], 1.0), (rows[2][0], 0.9)]
        oracle = crawl_oracle({u: h for (u, _, h, _, _) in all_rows},
                              seeds, oracle_policy, max_rounds=8)
        # the rules really bite both ways on this host
        assert any(u.startswith(f"{host}/page/1") or
                   u.startswith(f"{host}/page/2")
                   for u in oracle.seen), "allow rules never fired"
        d = str(tmp_path / "state")
        eng = FrontierEngine(spark, pages, d, policy,
                             rules=rules_df, budgets=budgets_df)
        eng.bootstrap(seeds)
        for r in range(8):
            eng.run_round(r)
        st = CrawlState(spark, d)
        sched = st.read_all_rounds("schedule", 7, SCHEDULE_SCHEMA) \
            .orderBy("round", "seq").collect()
        got = {}
        for x in sched:
            got.setdefault(x["round"], []).append(
                (x["url"], x["host"], x["depth"], x["score"]))
        for r, wave in enumerate(oracle.schedules[:8]):
            assert got.get(r, []) == wave, f"round {r}"
        seen = {r["url"] for r in st.read_all_rounds(
            "seen", 8, SEEN_SCHEMA).collect()}
        assert seen == oracle.seen


class TestEmptyRuleParity:
    def test_empty_rule_matches_nothing_in_both_paths(self):
        """An empty-string rule is skipped by robots_decision; the SQL
        LIKE translation must not turn it into match-everything."""
        from pyspark.sql import functions as F  # noqa: F401

        from nipper_spark.crawl.politeness import robots_filter
        from nipper_spark.crawl.robots import robots_decision
        from nipper_spark.session import build_session
        assert robots_decision([""], [], "/anything")
        spark = build_session("empty-rule", master="local[4]",
                              shuffle_partitions=4)
        cand = spark.createDataFrame(
            [("http://h.test/a", "h.test")], "url string, host string")
        rules = spark.createDataFrame(
            [("h.test", "", False)],
            "host string, prefix string, allow boolean")
        out = robots_filter(cand, CrawlPolicy(), rules=rules, rules_rows=1)
        assert out.count() == 1  # candidate survives, matching the kernel


def test_seed_filter_table_is_sole_authority(tmp_path):
    """When a rules TABLE is passed, it is the only robots authority —
    for seeds exactly as for round candidates. Previously bootstrap
    ANDed the config-dict decision with the table decision, so a table
    Allow could never override a dict Disallow for seeds while it
    could mid-crawl (round filtering ignores dicts when a table is
    given)."""
    import datetime

    from nipper_spark.crawl.frontier import FrontierEngine
    from nipper_spark.crawl.politeness import CrawlPolicy
    from nipper_spark.crawl.state import FRONTIER_SCHEMA, CrawlState
    from nipper_spark.session import build_session
    from nipper_spark.sources.synthetic import PAGES_SCHEMA

    spark = build_session("robots-tests", master="local[4]",
                          shuffle_partitions=4)
    ts = datetime.datetime(2026, 1, 1)
    pages = spark.createDataFrame(
        [("http://h.test/x/a", ts, b"<p>x</p>", None, "en")], PAGES_SCHEMA)
    # dict says Disallow /x; table says Disallow /x BUT Allow /x/a
    policy = CrawlPolicy(robots_disallow={"h.test": ["/x"]}, n_buckets=2)
    rules = spark.createDataFrame(
        [("h.test", "/x", False), ("h.test", "/x/a", True)],
        "host string, prefix string, allow boolean")
    d = str(tmp_path / "seedauth")
    eng = FrontierEngine(spark, pages, d, policy, rules=rules)
    eng.bootstrap([("http://h.test/x/a", 1.0), ("http://h.test/x/b", 0.5)])
    got = sorted(r["url"] for r in CrawlState(spark, d)
                 .read("frontier", 0, FRONTIER_SCHEMA).collect())
    assert got == ["http://h.test/x/a"]  # Allow overrode the dict rule


def test_rule_to_like_equals_rule_matches_property():
    """The SQL LIKE translation and the regex kernel are the same
    function: for random rules (wildcards, anchors, LIKE
    metacharacters, escapes) and random paths, DuckDB's
    `path LIKE rule_to_like(rule) ESCAPE '\\'` must equal
    rule_matches(rule, path). This is the invariant that keeps the
    distributed decision join and the oracle identical."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from nipper_spark.crawl.robots import rule_matches, rule_to_like

    con = duckdb.connect()
    # \n included deliberately: LIKE '%' matches newlines, so the
    # kernel must too (re.DOTALL + \Z, not default-mode .* and $)
    chars = list("/ab1.*$%_\\-~\n")

    @settings(max_examples=400, deadline=None)
    @given(st.text(alphabet=st.sampled_from(chars), min_size=1,
                   max_size=10),
           st.text(alphabet=st.sampled_from(chars), max_size=14))
    def prop(rule, path):
        like = con.execute(
            "SELECT ? LIKE ? ESCAPE '\\'",
            [path, rule_to_like(rule)]).fetchone()[0]
        assert bool(like) == rule_matches(rule, path), (rule, path)

    prop()


class TestSitemapDirective:
    def test_parse_sitemap_records_are_global(self):
        from nipper_spark.crawl.robots import parse_robots_txt
        body = ("Sitemap: http://h.test/pre-group.xml\n"
                "User-agent: a\nDisallow: /x\n"
                "Sitemap: http://h.test/mid.xml\n"
                "User-agent: b\nDisallow: /y\n"
                "Sitemap: http://h.test/post.xml\n")
        for agent in ("a", "b", "zzz"):
            r = parse_robots_txt(body, agent)
            assert r.sitemaps == ["http://h.test/pre-group.xml",
                                  "http://h.test/mid.xml",
                                  "http://h.test/post.xml"], agent
        # the URL value itself contains ':' — partition must keep it
        assert parse_robots_txt("Sitemap: https://h.test:8443/s.xml") \
            .sitemaps == ["https://h.test:8443/s.xml"]
        # a sitemap line between user-agent lines ends the agent run
        # (Google's parser behavior): 'b' starts a NEW group
        r = parse_robots_txt(
            "User-agent: a\nSitemap: http://h.test/s.xml\n"
            "User-agent: b\nDisallow: /z\n", "a")
        assert r.disallow == []

    def test_harvest_same_host_canonicalized_dedup(self):
        from nipper_spark.crawl.robots import (
            robots_sitemap_seeds, synth_robots_sitemap_rows)
        from nipper_spark.session import build_session
        from nipper_spark.sources.synthetic import PAGES_SCHEMA
        spark = build_session("robots-tests", master="local[4]",
                              shuffle_partitions=4)
        pages = spark.createDataFrame(synth_robots_sitemap_rows(3),
                                      PAGES_SCHEMA)
        got = {(r["host"], r["url"])
               for r in robots_sitemap_seeds(pages).collect()}
        want = set()
        for h in range(3):
            host = f"rsm{h:02d}.test"
            # cross-host spam dropped; uppercase/:80 canonicalized;
            # duplicate collapsed
            want.add((host, f"http://{host}/sitemap-main.xml"))
            want.add((host, f"http://{host}/sitemap-news.xml"))
        assert got == want


class TestAgentMatching:
    def test_most_specific_prefix_group_wins(self):
        from nipper_spark.crawl.robots import parse_robots_txt
        body = ("User-agent: *\nDisallow: /all\n"
                "User-agent: googlebot\nDisallow: /gb\n"
                "User-agent: googlebot-news\nDisallow: /news\n")
        # exact beats shorter prefix beats *
        assert parse_robots_txt(body, "googlebot-news").disallow == \
            ["/news"]
        assert parse_robots_txt(body, "googlebot-image").disallow == \
            ["/gb"]   # prefix at a token boundary
        assert parse_robots_txt(body, "GoogleBot").disallow == ["/gb"]
        assert parse_robots_txt(body, "otherbot").disallow == ["/all"]
        # prefix must end at a token boundary: 'googlebotx' is NOT
        # matched by the 'googlebot' group
        assert parse_robots_txt(body, "googlebotx").disallow == ["/all"]

    def test_no_star_group_no_match_allows_all(self):
        from nipper_spark.crawl.robots import parse_robots_txt
        r = parse_robots_txt("User-agent: foo\nDisallow: /\n", "bar")
        assert r.disallow == [] and r.allowed("/anything")


def test_bom_stripped_before_first_directive():
    """Real robots.txt files often begin with a UTF-8 BOM; it must not
    poison the first line's key (previously the whole first group was
    silently ignored)."""
    from nipper_spark.crawl.robots import parse_robots_txt
    r = parse_robots_txt(b"\xef\xbb\xbfUser-agent: *\nDisallow: /x\n")
    assert r.disallow == ["/x"]
    assert parse_robots_txt("﻿Sitemap: http://h.test/s.xml") \
        .sitemaps == ["http://h.test/s.xml"]
