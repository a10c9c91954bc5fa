"""Cuckoo filter unit tests + frontier integration in filter_kind
='cuckoo' mode (must reproduce the oracle exactly — the prefilter
never changes semantics, only anti-join volume)."""

import pytest

from nipper_spark.crawl.cuckoo import (
    CuckooFilter, cuckoo_add, cuckoo_build, cuckoo_might_contain)


class TestCuckooFilter:
    def test_add_contains_delete(self):
        f = CuckooFilter(n_items=1000)
        urls = [f"http://h.test/{i}" for i in range(800)]
        assert all(f.add(u) for u in urls)
        assert f.contains_vec(urls).all()
        # delete half, they disappear; the rest stay
        for u in urls[:400]:
            assert f.delete(u)
        assert not f.contains_vec(urls[:400]).any() or True  # fp possible
        hits_deleted = f.contains_vec(urls[:400]).mean()
        assert hits_deleted < 0.1  # only fingerprint collisions remain
        assert f.contains_vec(urls[400:]).all()

    def test_false_positive_rate(self):
        urls = [f"http://h.test/{i}" for i in range(2000)]
        payload = cuckoo_build(urls)
        other = [f"http://x.test/{i}" for i in range(2000)]
        fp = cuckoo_might_contain(payload, other).mean()
        assert fp < 0.05

    def test_serialization_roundtrip(self):
        urls = [f"http://h.test/{i}" for i in range(500)]
        payload = cuckoo_build(urls)
        f = CuckooFilter(payload=payload)
        assert f.contains_vec(urls).all()
        p2 = cuckoo_add(payload, [f"http://y.test/{i}" for i in range(100)])
        assert cuckoo_might_contain(
            p2, urls + [f"http://y.test/{i}" for i in range(100)]).all()

    def test_saturation_never_false_negative(self):
        """Overfill a tiny filter: it must saturate (answer True for
        everything), never drop a key."""
        f = CuckooFilter(n_items=16)
        urls = [f"http://h.test/{i}" for i in range(400)]
        for u in urls:
            f.add(u)
        assert f.contains_vec(urls).all()  # saturated ⇒ all True
        # roundtrip keeps the saturation flag
        f2 = CuckooFilter(payload=f.to_bytes())
        assert f2.contains_vec(urls).all()


class TestCuckooFrontier:
    def test_engine_matches_oracle_with_cuckoo(self, tmp_path):
        from nipper_spark.crawl.frontier import FrontierEngine
        from nipper_spark.crawl.oracle import crawl_oracle
        from nipper_spark.crawl.politeness import CrawlPolicy
        from nipper_spark.crawl.state import (
            SCHEDULE_SCHEMA, SEEN_SCHEMA, CrawlState)
        from nipper_spark.session import build_session
        from nipper_spark.sources.synthetic import (
            PAGES_SCHEMA, synth_pages_rows)

        spark = build_session("cuckoo-crawl", master="local[4]",
                              shuffle_partitions=4)
        rows = synth_pages_rows(n_pages=30, links_per_page=4, n_hosts=6,
                                seed=7)
        pages = spark.createDataFrame(rows, PAGES_SCHEMA)
        seeds = [(rows[0][0], 1.0), (rows[1][0], 0.9)]
        policy = CrawlPolicy(default_tokens=5, n_buckets=4,
                             filter_kind="cuckoo")
        oracle = crawl_oracle({u: h for (u, _, h, _, _) in rows}, seeds,
                              policy, max_rounds=4)
        state_dir = str(tmp_path / "state")
        eng = FrontierEngine(spark, pages, state_dir, policy)
        eng.bootstrap(seeds)
        for r in range(4):
            eng.run_round(r)
        st = CrawlState(spark, state_dir)
        sched = st.read_all_rounds("schedule", 3, SCHEDULE_SCHEMA) \
            .orderBy("round", "seq").collect()
        got = {}
        for x in sched:
            got.setdefault(x["round"], []).append(
                (x["url"], x["host"], x["depth"], x["score"]))
        for r, wave in enumerate(oracle.schedules[:4]):
            assert got.get(r, []) == wave, f"round {r}"
        seen = {x["url"] for x in st.read_all_rounds(
            "seen", 5, SEEN_SCHEMA).collect()}
        oracle_first4 = oracle.seen if oracle.rounds <= 4 else None
        if oracle_first4 is not None:
            assert seen == oracle.seen


class TestVectorizedEqualsScalar:
    """The batch probe paths were vectorized (numpy gathers, uint64
    wraparound index math shared by build and probe). The scalar
    methods stay the oracle twins: property-test agreement, and pin
    the one invariant that matters — NEVER a false negative."""

    def test_cuckoo_vec_equals_scalar(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=50, deadline=None)
        @given(st.lists(st.text(min_size=1, max_size=40), min_size=1,
                        max_size=60),
               st.lists(st.text(min_size=1, max_size=40), max_size=60))
        def prop(members, probes):
            f = CuckooFilter(n_items=max(len(members), 16))
            for u in members:
                f.add(u)
            batch = list(f.contains_vec(probes + members))
            scalar = [f.contains(u) for u in probes + members]
            assert batch == scalar
            # members must all hit (no false negatives, saturated or not)
            assert all(batch[len(probes):])

        prop()

    def test_bloom_build_probe_no_false_negative(self):
        from hypothesis import given, settings, strategies as st

        from nipper_spark.crawl import bloom as B

        @settings(max_examples=50, deadline=None)
        @given(st.lists(st.text(min_size=1, max_size=40), min_size=1,
                        max_size=80),
               st.integers(min_value=0, max_value=3))
        def prop(members, split):
            m = B.bloom_sizing(len(members))
            base, extra = members[split:], members[:split]
            payload = B.bloom_build(base, m)
            payload = B.bloom_add(payload, extra, m)
            assert B.bloom_might_contain(payload, members).all()

        prop()
