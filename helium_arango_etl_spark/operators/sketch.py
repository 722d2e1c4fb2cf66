"""Engine-portable HyperLogLog: cardinality estimation whose ESTIMATE is
bit-reproducible across engines, so the sketch itself is oracle-checkable
(``approx_count_distinct`` and friends are engine-specific and can only be
tested against tolerance bands).

Construction (Flajolet et al. 2007, m = 64 registers):

- register  = first 8 bits of md5(value)  mod 64
- rank      = 1-based position of the first set bit in the next 24 bits
              (25 when all zero), via ``lpad(bin(x), 24, '0')`` — both
              Spark and DuckDB print identical binary strings
- register aggregation is MAX(rank): order-insensitive, shuffle is 64
  tiny rows after map-side partial aggregation — the whole point of a
  sketch at 100 TB scale
- estimate  = alpha_64 * m^2 / (sum(2^-rank) + zero_registers), with the
  standard linear-counting correction below 2.5m when empty registers
  remain.

Float determinism: every 2^-rank term is a dyadic rational with
denominator <= 2^25 and there are <= 64 of them, so every partial sum is
exactly representable in float64 — the register sum is EXACT regardless
of aggregation order, and the final multiply/divide are single IEEE ops
both engines round identically.  Only the linear-counting branch uses a
transcendental (ln); results are rounded to 4 decimals on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table, spread

HLL_M = 64  # registers
HLL_ALPHA = 0.709  # alpha_64 (Flajolet et al. 2007, table for m = 64)

CMS_D = 4  # count-min hash rows
CMS_W = 64  # count-min columns per row

# md5 hex -> (register, 24-bit tail) -> rank of first set bit
_REG = f"cast(conv(substring(h, 1, 2), 16, 10) as bigint) % {HLL_M}"
_TAIL = "cast(conv(substring(h, 3, 6), 16, 10) as bigint)"
_RANK = "IF(instr(lpad(bin(x), 24, '0'), '1') = 0, 25, instr(lpad(bin(x), 24, '0'), '1'))"


def cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream (Cormode &
    Muthukrishnan 2005), engine-portable like :func:`hll_distinct`: cell
    assignment is md5('<d>|<token>') so both engines build the identical
    CMS_D x CMS_W counter table, and the per-token estimate
    (min over rows of the hashed cell) is exactly reproducible.

    Output: per distinct token, the exact count next to the sketch
    estimate and its overcount (always >= 0: CMS never undercounts).
    At scale only the 4x64 counter table is kept — it merges across
    partitions/days by cell-wise addition; the exact counts here exist to
    verify the estimate surface."""
    from .textops import TOKS

    toks = (
        spread(read_table(spark, sf_dir, "documents"))
        .select(F.explode(F.expr(TOKS)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    d = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("d")
    cell = f"cast(conv(substring(md5(concat(d, '|', token)), 1, 7), 16, 10) as bigint) % {CMS_W}"
    hashed = toks.select("token", "n_exact", d).withColumn("cell", F.expr(cell))
    # the 4x64 counter table: counts of EVERY token land in their cells
    counters = hashed.groupBy("d", "cell").agg(F.sum("n_exact").alias("cnt"))
    est = (
        hashed.join(F.broadcast(counters), ["d", "cell"])
        .groupBy("token", "n_exact")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    return est.select(
        "token",
        "n_exact",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("n_exact")).alias("overcount"),
    )


def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL cardinality estimate of distinct event_id, next to the exact
    count — one row: (n_exact, hll_estimate, rel_error, n_registers).

    The exact count is the verification surface; a production pipeline
    keeps only the sketch (64 registers per key — mergeable across
    partitions, days, and reruns by element-wise MAX)."""
    ev = read_table(spark, sf_dir, "events").select("event_id")
    regs = (
        ev.select(F.md5(F.col("event_id").cast("string")).alias("h"))
        .select(F.expr(_REG).alias("reg"), F.expr(_TAIL).alias("x"))
        .select("reg", F.expr(_RANK).alias("rank"))
        .groupBy("reg")
        .agg(F.max("rank").alias("mr"))
    )
    m = HLL_M
    sketch = regs.agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.expr("power(2.0, -mr)")).alias("sp"),
    ).select(
        F.expr(
            f"{HLL_ALPHA}d * {m} * {m} / (sp + ({m} - n_present))"
        ).alias("raw"),
        (F.lit(m) - F.col("n_present")).alias("zeros"),
    )
    est = F.expr(
        f"IF(raw <= 2.5 * {m} AND zeros > 0, {m} * ln(cast({m} as double) / zeros), raw)"
    )
    exact = ev.agg(F.countDistinct("event_id").alias("n_exact"))
    return (
        sketch.crossJoin(F.broadcast(exact))
        .select(
            "n_exact",
            F.round(est, 4).alias("hll_estimate"),
            F.round((est - F.col("n_exact")) / F.col("n_exact"), 4).alias("rel_error"),
            F.lit(m).cast("int").alias("n_registers"),
        )
    )
