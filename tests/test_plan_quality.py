"""Physical-plan quality gates — the 100 TB story, pinned as tests.

Correct results with a bad plan fail at scale: an un-broadcast dim join
shuffles the fact table, an un-pushed filter reads the whole scan, an
un-pruned schema drags every column through the pipeline.  These tests
assert the plan properties the engine is designed around, so a refactor
that silently regresses them fails CI rather than a cluster run.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest

from helium_arango_etl_spark.registry import QUERIES


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def scan_widths(plan: str) -> list[int]:
    return [len(s.split(",")) for s in re.findall(r"ReadSchema: struct<([^>]*)", plan)]


@pytest.mark.parametrize(
    "name",
    ["rewards_5d", "hotspot_snapshot", "witness_subgraph", "rewards_by_type", "groupwise_max_join"],
)
def test_dim_joins_broadcast_not_shuffle(spark, sf_dir, name):
    """Every dim-table join must be broadcast: a SortMergeJoin against a
    small dimension means shuffling the fact side for nothing."""
    plan = plan_of(QUERIES[name](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


@pytest.mark.parametrize(
    ("name", "max_widths"),
    [
        ("rewards_5d", 3),      # lineitem: suppkey, price, shipdate — never all 16
        ("token_explode", 1),   # documents: text only
        ("exact_dedup", 2),     # documents: doc_id, text
        ("last_balance_per_day", 3),
    ],
)
def test_column_pruning_reaches_scan(spark, sf_dir, name, max_widths):
    plan = plan_of(QUERIES[name](spark, sf_dir))
    widths = scan_widths(plan)
    assert widths and max(widths) <= max_widths, (widths, plan)


@pytest.mark.parametrize("name", ["rewards_5d", "rewards_by_type", "payments_from_events"])
def test_range_filters_pushed_to_parquet(spark, sf_dir, name):
    """Time/type predicates must reach the parquet scan (PushedFilters), so
    row groups outside the window are skipped at the source."""
    plan = plan_of(QUERIES[name](spark, sf_dir))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any(p.strip() for p in pushed), plan


def test_scalar_work_is_codegened(spark, sf_dir):
    """The scalar battery must run inside whole-stage codegen, not
    interpreted row-at-a-time evaluation."""
    plan = plan_of(QUERIES["scalar_battery"](spark, sf_dir))
    assert "codegen id" in plan, plan


def test_city_metrics_single_shuffle(spark, sf_dir):
    """city_graph_metrics must shuffle exactly once (on city_key): the
    keep-latest dedup happens inside the pandas group, so a second
    window-style exchange is a regression."""
    plan = plan_of(QUERIES["city_graph_metrics"](spark, sf_dir))
    # formatted mode: shuffle nodes print as "(N) Exchange"; broadcasts as
    # "(N) BroadcastExchange" — count only the former
    shuffles = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert shuffles == 1, plan


def test_single_scan_lsh_pipeline(spark, sf_dir):
    """lsh_candidate_pairs must scan `documents` exactly once — the
    bucketed-self-join formulation evaluated the whole signature pipeline
    twice and this pins the single-pass shape."""
    plan = plan_of(QUERIES["lsh_candidate_pairs"](spark, sf_dir))
    assert plan.count("documents.parquet") == 1, plan
