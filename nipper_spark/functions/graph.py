"""Host-graph metrics over crawl outlink edges — PageRank first.

Why integer-quantized: ranks live in fixed-point units of
``2^-scale_bits``, every division is floor division, and every reduce
is a sum of LONGS — exact and order-independent, so the distributed
result is bit-identical to the single-threaded twin
(`pagerank_oracle`) regardless of partitioning, AQE re-plans, or
scheduling order. A float formulation drifts with the aggregation
tree shape: at 1000 executors two runs of the same job would disagree
in the low bits, and no hash-exact oracle (or reproducible pipeline)
could be built on it.

Semantics (both implementations, lockstep):
- nodes: distinct(src) ∪ distinct(dst); edges deduplicated.
- r₀(v) = S where S = 2^scale_bits (total mass N·S).
- per iteration, with d = num/den (default 85/100):
    contrib(u)   = Σ_{v→u} floor(r(v) / outdeg(v))
    dangling     = Σ_{outdeg(v)=0} r(v);  dshare = floor(dangling / N)
    r'(u)        = floor(S·(den−num)/den)
                   + floor(num·(contrib(u) + dshare) / den)
- overflow bound: worst case one hub receives ALL mass, so
  num·N·S must stay < 2^63 — with the defaults (num=85, S=2^30)
  that holds to N ≈ 10⁸ hosts; drop ``scale_bits`` to go wider.

Scale shape: per iteration ONE shuffle join ranks⋈edges on src (both
sides hash-partitioned by host) + ONE groupBy(dst) with map-side
partial sums of longs; the dangling total is a 1-row aggregate
broadcast back (never a driver collect inside the loop).
``localCheckpoint`` per iteration bounds Catalyst re-analysis of the
growing lineage — the same discipline as
`dedup.connected_components`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING_NUM = 85
DAMPING_DEN = 100
SCALE_BITS = 30


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iters: int = 10, damping_num: int = DAMPING_NUM,
             damping_den: int = DAMPING_DEN,
             scale_bits: int = SCALE_BITS,
             checkpoint: bool = True) -> DataFrame:
    """edges(src, dst) → (node, outdeg, rank_q).

    ``rank_q`` is the fixed-point rank (units of 2^-scale_bits, total
    mass ≈ N·2^scale_bits); divide by ``N << scale_bits`` for the
    conventional sums-to-1 value.

    ``checkpoint=False`` keeps the per-round lineage (plan inspection
    only — production runs must checkpoint or the Catalyst tree grows
    with every iteration)."""
    s_unit = 1 << scale_bits
    teleport = s_unit * (damping_den - damping_num) // damping_den

    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .distinct())
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node"))).distinct())
    outdeg = e.groupBy(F.col("src").alias("node")) \
              .agg(F.count("*").alias("outdeg"))
    nt = (nodes.join(outdeg, "node", "left")
          .select("node", F.coalesce("outdeg", F.lit(0)).cast("long")
                  .alias("outdeg"))
          .localCheckpoint())
    # one setup aggregate: node count AND dangling-node count (ranks
    # start uniform at S, so iteration 1's dangling mass is exactly
    # n_dangling·S — no separate aggregation job needed)
    n_nodes, n_dangling = nt.agg(
        F.count("*"),
        F.sum((F.col("outdeg") == 0).cast("long"))).collect()[0]
    n_nodes, n_dangling = int(n_nodes), int(n_dangling or 0)

    ranks = nt.select("node", "outdeg",
                      F.lit(s_unit).cast("long").alias("rank_q"))
    dangling = n_dangling * s_unit
    from pyspark.sql import Observation
    for _ in range(iters):
        contribs = (ranks.filter(F.col("outdeg") > 0)
                    .join(e, ranks["node"] == e["src"])
                    .select(F.col("dst").alias("node"),
                            F.expr("rank_q div outdeg").alias("c"))
                    .groupBy("node").agg(F.sum("c").alias("contrib")))
        # the dangling mass enters as a LITERAL: it is an exact long
        # carried between iterations by an Observation riding the
        # checkpoint we materialize anyway (the frontier's free-counter
        # pattern) — the old scalar-subquery crossJoin cost one extra
        # broadcast job per iteration for the same number
        new_ranks = (nt.join(contribs, "node", "left")
                     .select(
                         "node", "outdeg",
                         (F.lit(teleport) + F.expr(
                             f"({damping_num} * (coalesce(contrib, 0) "
                             f"+ {dangling}L div {n_nodes}L)) "
                             f"div {damping_den}"))
                         .cast("long").alias("rank_q")))
        if checkpoint:
            obs = Observation()
            ranks = (new_ranks.observe(
                obs, F.sum(F.when(F.col("outdeg") == 0,
                                  F.col("rank_q"))).alias("dng"))
                .localCheckpoint(eager=True))
            try:
                v = obs.get["dng"]
            except Exception:  # noqa: BLE001 — AQE pruned the metrics
                v = None
            dangling = int(v) if v is not None else int(
                ranks.filter(F.col("outdeg") == 0)
                .agg(F.coalesce(F.sum("rank_q"), F.lit(0)))
                .collect()[0][0])
        else:
            # plan-inspection mode: no per-iteration action resolves an
            # observation, so the dangling total stays a broadcast
            # scalar subquery in the plan (identical arithmetic)
            dng = (ranks.filter(F.col("outdeg") == 0)
                   .agg(F.coalesce(F.sum("rank_q"), F.lit(0))
                        .alias("_dng")))
            ranks = (nt.join(contribs, "node", "left")
                     .crossJoin(F.broadcast(dng))
                     .select(
                         "node", "outdeg",
                         (F.lit(teleport) + F.expr(
                             f"({damping_num} * (coalesce(contrib, 0) "
                             f"+ _dng div {n_nodes})) "
                             f"div {damping_den}"))
                         .cast("long").alias("rank_q")))
    return ranks.select("node", "outdeg", "rank_q")


def rank_seed_scores(extracted: DataFrame, iters: int = 10,
                     url_col: str = "url",
                     outlinks_col: str = "outlinks") -> DataFrame:
    """Candidate outlink URLs scored by their TARGET host's PageRank —
    the graph-aware frontier seeding composition: crawl authority
    flows to URLs on authoritative hosts. Returns
    (url, host, rank_q); `FrontierEngine.bootstrap_from_df` accepts it
    directly with ``rank_q`` cast as the seed score (exact: rank_q <
    2^53 for any corpus the overflow bound admits).

    Scale shape: candidates are (url, host) strings; the rank join is
    per-HOST (small side — hosts ≪ urls; broadcastable), so the URL
    table shuffles only for its own distinct."""
    from nipper_spark.functions.url import HOST_RE_SQL
    ranks = pagerank(host_edges(extracted, url_col, outlinks_col),
                     iters=iters)
    cand = (extracted
            .select(F.explode(outlinks_col).alias("url"))
            .select("url", F.regexp_extract("url", HOST_RE_SQL, 1)
                    .alias("host"))
            .filter(F.col("host") != "")
            .distinct())
    return cand.join(ranks.select(F.col("node").alias("host"), "rank_q"),
                     "host").select("url", "host", "rank_q")


def pagerank_oracle(edges: list, iters: int = 10,
                    damping_num: int = DAMPING_NUM,
                    damping_den: int = DAMPING_DEN,
                    scale_bits: int = SCALE_BITS) -> dict:
    """Single-threaded twin — identical integer math, Python dicts.
    Returns {node: (outdeg, rank_q)}."""
    s_unit = 1 << scale_bits
    teleport = s_unit * (damping_den - damping_num) // damping_den
    e = sorted(set(edges))
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    n = len(nodes)
    outdeg = {v: 0 for v in nodes}
    for a, _ in e:
        outdeg[a] += 1
    rank = {v: s_unit for v in nodes}
    for _ in range(iters):
        contrib = {v: 0 for v in nodes}
        for a, b in e:
            contrib[b] += rank[a] // outdeg[a]
        dangling = sum(r for v, r in rank.items() if outdeg[v] == 0)
        dshare = dangling // n
        rank = {v: teleport
                + damping_num * (contrib[v] + dshare) // damping_den
                for v in nodes}
    return {v: (outdeg[v], rank[v]) for v in nodes}


def host_edges(extracted: DataFrame, url_col: str = "url",
               outlinks_col: str = "outlinks",
               drop_self_loops: bool = True) -> DataFrame:
    """extracted(url, outlinks[]) → distinct host-level edges
    (src, dst). Uses the engine's `HOST_RE_SQL` twin of
    `url.host_of` so the politeness key and the graph key are the
    same definition. Self-loops (intra-host links — the vast majority
    on the web) are dropped by default: they dominate edge counts but
    carry no cross-host authority."""
    from nipper_spark.functions.url import HOST_RE_SQL
    e = (extracted
         .select(F.regexp_extract(F.col(url_col), HOST_RE_SQL, 1)
                 .alias("src"),
                 F.explode(outlinks_col).alias("_dst"))
         .select("src", F.regexp_extract("_dst", HOST_RE_SQL, 1)
                 .alias("dst"))
         .filter((F.col("src") != "") & (F.col("dst") != "")))
    if drop_self_loops:
        e = e.filter(F.col("src") != F.col("dst"))
    return e.distinct()
