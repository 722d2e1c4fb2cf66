"""Graph/analytics operators — SURVEY.md §2.J, the reference's raison d'être.

J1  per-city witness subgraph: ONE declarative DAG (join + filter + distance
    column) grouped by city_key — not the reference's per-city AQL loop
    (arango_queries.py:145-156).  Fully oracle-checkable.
J2/J3  betweenness centrality + weighted PageRank per city graph via
    Arrow-batched ``applyInPandas`` running native numpy implementations of
    the exact networkx algorithms the reference calls
    (arango_queries.py:161-167).  Rows-only check + invariant unit tests.
J4  normalization ÷ city mean with nan→0 (arango_queries.py:169-175) —
    done inside the same pandas group (metrics and means share the group).
J6  MIN_CITY_SIZE threshold on raw edge count (arango_queries.py:159).

Testdata mapping: hotspots→supplier, witnesses→customer (distinct node
namespaces 'S<k>' / 'C<k>'), witness edges→lineitem⋈orders, city→supplier's
nation, is_valid→(l_returnflag = 'N'), coords→deterministic synthetics.

Scale: the edge build is a fact-fact shuffle join on orderkey then a shuffle
on city_key for the grouped metrics — two shuffles total, both on keys with
bounded skew (cities are bounded by geography; a mega-city is handled by
AQE skew split for the join, and the per-group pandas work is O(city), not
O(world)).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from ..functions.graphalgs import betweenness_centrality, hits, pagerank
from ..functions.scalars import haversine_m, synthetic_lat, synthetic_lon
from ..io import read_table

MIN_CITY_SIZE = 5  # reference: etl.py:106-108 MIN_CITY_SIZE env, threshold on edge rows


def witness_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw witness edge set with per-edge haversine distance (J1 before the
    validity filter).  src = challengee hotspot ('S<suppkey>'), dst = witness
    ('C<custkey>'), city = challengee's nation."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag", "l_shipdate"
    )
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    sup = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = read_table(spark, sf_dir, "region")

    # city_key is a function of the (tiny) nation×region dim: hash it ONCE
    # per city before the broadcast, not once per edge row after the join —
    # the classic compute-on-the-dim rewrite Catalyst can't do for you
    # (it cannot know md5 commutes with the join)
    city_dim = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "n_nationkey",
            F.md5(F.concat_ws("|", "n_name", "r_name")).alias("city_key"),
        )
    )

    dist = haversine_m(
        synthetic_lat(F.col("l_suppkey")),
        synthetic_lon(F.col("l_suppkey")),
        synthetic_lat(F.col("o_custkey")),
        synthetic_lon(F.col("o_custkey")),
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(city_dim), sup.s_nationkey == city_dim.n_nationkey)
        .select(
            "city_key",
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("dst"),
            (F.col("l_returnflag") == "N").alias("is_valid"),
            F.round(dist, 3).alias("distance_m"),
            F.col("l_shipdate").alias("edge_ts"),
        )
    )


def witness_subgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: valid-only witness edges per city with distance — the AQL
    1-hop traversal (arango_queries.py:147-156) as one join DAG."""
    return witness_edges(spark, sf_dir).filter(F.col("is_valid")).drop("is_valid")


_METRICS_SCHEMA = StructType(
    [
        StructField("city_key", StringType()),
        StructField("address", StringType()),
        StructField("betweenness_centrality", DoubleType()),
        StructField("betweenness_centrality_n", DoubleType()),
        StructField("pagerank", DoubleType()),
        StructField("pagerank_n", DoubleType()),
    ]
)


def _dedup_edges(pdf: pd.DataFrame) -> pd.DataFrame | None:
    """Keep-latest dedup per (src,dst) INSIDE the pandas group (E1): sorting
    ascending by (src, dst, edge_ts, distance_m) and letting the last row
    win per arc is exactly the window row_number()==1 on desc ordering — but
    done group-locally it saves the whole extra shuffle+sort stage a window
    over (city,src,dst) would cost before the city_key shuffle.  Returns
    None when the deduped edge count is under MIN_CITY_SIZE (J6 — the
    reference thresholds on the witness collection's deduped edges)."""
    deduped = pdf.sort_values(["src", "dst", "edge_ts", "distance_m"]).drop_duplicates(
        ["src", "dst"], keep="last"
    )
    if len(deduped) < MIN_CITY_SIZE:
        return None
    return deduped


def _city_metrics(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-city group: DiGraph metrics exactly as arango_queries.py:159-175.

    Sort for float determinism; weights = distance_m.
    """
    deduped = _dedup_edges(pdf)
    if deduped is None:
        return pd.DataFrame(columns=[f.name for f in _METRICS_SCHEMA.fields])
    city = pdf["city_key"].iloc[0]
    edges = list(
        deduped[["src", "dst", "distance_m"]].itertuples(index=False, name=None)
    )
    bc = betweenness_centrality(edges)
    pg = pagerank(edges)
    bc_mean = sum(bc.values()) / len(bc) if bc else 0.0
    pg_mean = sum(pg.values()) / len(pg) if pg else 0.0

    def nan0(x: float) -> float:
        return 0.0 if x != x else x

    rows = [
        (
            city,
            node,
            nan0(bc[node]),
            nan0(bc[node] / bc_mean) if bc_mean else 0.0,
            nan0(pg[node]),
            nan0(pg[node] / pg_mean) if pg_mean else 0.0,
        )
        for node in sorted(pg)
    ]
    return pd.DataFrame(rows, columns=[f.name for f in _METRICS_SCHEMA.fields])


def city_graph_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/J3/J4: per-city betweenness + PageRank, normalized by city mean.

    Plan: witness subgraph -> ONE shuffle on city_key -> Arrow-batched
    pandas per group, where keep-latest dedup per (src,dst) (E1, the
    semantic the reference gets from onDuplicate='ignore' insert order)
    happens group-locally before the graph build.  Replaces the reference's
    fork-per-city-chunk orchestration (arango_queries.py:184-208) — and
    fixes its chunk-indexing bug by construction (K2).
    """
    edges = witness_subgraph(spark, sf_dir).select(
        "city_key", "src", "dst", "distance_m", "edge_ts"
    )
    return edges.groupBy("city_key").applyInPandas(_city_metrics, schema=_METRICS_SCHEMA)


_HITS_SCHEMA = StructType(
    [
        StructField("city_key", StringType()),
        StructField("address", StringType()),
        StructField("hub_score", DoubleType()),
        StructField("authority_score", DoubleType()),
    ]
)


def _city_hits(pdf: pd.DataFrame) -> pd.DataFrame:
    deduped = _dedup_edges(pdf)
    if deduped is None:
        return pd.DataFrame(columns=[f.name for f in _HITS_SCHEMA.fields])
    city = pdf["city_key"].iloc[0]
    edges = list(
        deduped[["src", "dst", "distance_m"]].itertuples(index=False, name=None)
    )
    hubs, auths = hits(edges)
    rows = [(city, node, hubs[node], auths[node]) for node in sorted(hubs)]
    return pd.DataFrame(rows, columns=[f.name for f in _HITS_SCHEMA.fields])


def city_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: HITS hub/authority per city graph — the metric the reference
    reserves schema columns for but leaves commented out
    (arango_queries.py:168, arango_schema.py:59-60).  Same single-shuffle
    group-local-dedup applyInPandas harness as city_graph_metrics."""
    edges = witness_subgraph(spark, sf_dir).select(
        "city_key", "src", "dst", "distance_m", "edge_ts"
    )
    return edges.groupBy("city_key").applyInPandas(_city_hits, schema=_HITS_SCHEMA)


def hotspot_metrics_writeback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 writeback shape: metrics merged back onto the hotspot snapshot
    (importBulk onDuplicate='update', arango_queries.py:176-177).
    Only challengee nodes ('S…') land on hotspots; witness-only nodes are
    metric-carrying but have no hotspot doc, exactly like the reference
    (importBulk creates them — here we inner-join, keeping snapshot keys)."""
    from .relational import hotspot_snapshot

    snap = hotspot_snapshot(spark, sf_dir).drop(
        "betweenness_centrality", "pagerank", "rewards_5d", "hub_score", "authority_score"
    )
    metrics = city_graph_metrics(spark, sf_dir).filter(F.col("address").startswith("S"))
    keyed = metrics.withColumn("address", F.expr("substring(address, 2)").cast("bigint"))
    return snap.join(keyed.drop("city_key"), on="address", how="left")
