"""Focused min-of-N bench for a subset of headline queries.

Usage: python tools/microbench.py [-nN] <query> [query ...]

Same methodology as bench.py (noop sink, shared-cache resets, warmup
pass then min of N measured passes) but only for the named queries —
the fast inner loop for before/after numbers on a single optimization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from helium_arango_etl_spark.operators import dedup as D  # noqa: E402
from helium_arango_etl_spark.operators import graph as G  # noqa: E402
from helium_arango_etl_spark.operators import similarity as S  # noqa: E402
from helium_arango_etl_spark.operators import textops as T  # noqa: E402
from helium_arango_etl_spark.registry import QUERIES  # noqa: E402
from helium_arango_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if args and args[0].startswith("-n"):
        n = int(args[0][2:])
        args = args[1:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="microbench")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        if name == "city_graph_metrics":
            for df in G._METRICS_CACHE.pop(spark, {}).values():
                df.unpersist(blocking=True)
        if name == "witness_subgraph":
            G.clear_edge_cache(spark)
        if name == "emb_prepare":
            S.clear_emb_cache(spark)
            t0 = time.perf_counter()
            S.embedding_table(spark, sf_dir).write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0
        if name == "tok_prepare":
            T.clear_tok_cache(spark)
            t0 = time.perf_counter()
            T.tokenized_corpus(spark, sf_dir).write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0
        if name == "lsh_candidate_pairs":
            D.clear_sig_cache(spark)
        spark.sparkContext.setJobDescription(f"microbench:{name}")
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    # whole-list passes (warmup + n measured), per-query min over the
    # measured passes — the bench.py methodology, preserving the shared
    # cache clear/rebuild attribution between coupled queries
    for name in names:
        run(name)  # warmup pass
    timings: dict[str, float] = {name: float("inf") for name in names}
    for _ in range(n):
        for name in names:
            timings[name] = min(timings[name], run(name))
    timings = {k: round(v, 3) for k, v in timings.items()}
    print(json.dumps({"queries": timings, "n": n, "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
