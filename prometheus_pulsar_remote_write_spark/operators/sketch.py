"""Cross-engine deterministic HyperLogLog distinct-count sketch.

The reference has no approximate aggregates (SURVEY.md §2.E), but a
100 TB engine needs cardinality sketches: exact count-distinct shuffles
every distinct value, while an HLL register table is m rows per group,
mergeable map-side (max per bucket is associative), and constant-size
no matter how many samples a tenant sends (north_star scale mandate).

Spark's own approx_count_distinct is HLL++ with engine-private hashing,
so it can never hash-match a DuckDB oracle. This implementation is
engine-portable by construction -- every step is integer or
exact-dyadic-float arithmetic that both engines evaluate bit-identically:

- hash: first 15 hex chars of md5(value) parsed as a 60-bit integer
  (md5 is bytewise-identical everywhere; 15 hex chars fit a BIGINT);
- bucket: low 8 bits (m=256 registers); rho: position of the lowest set
  bit of the remaining 52 bits, capped at 40 so every 2^-rho register
  term is a multiple of 2^-40 -- the register sum then stays inside 48
  mantissa bits and is EXACT (order-independent) in IEEE double;
- small-range (linear-counting) correction: m*ln(m/V) is pre-computed in
  Python into a 256-entry integer table embedded verbatim in BOTH the
  Spark plan and the oracle SQL, so no engine evaluates ln() at all.

Sketch quality: standard HLL, ~1.04/sqrt(256) = 6.5% relative error.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M = 256  # registers
RHO_CAP = 40  # keeps the register sum exact in double precision
ALPHA_M2 = (0.7213 / (1 + 1.079 / M)) * M * M  # one Python double, shared
LC_THRESHOLD = 2.5 * M
#: linear-counting estimates round(m * ln(m / V_empty)) for V_empty 1..256
LC_TABLE = [round(M * math.log(M / v)) for v in range(1, M + 1)]


def _hash60(value: Column) -> Column:
    """60-bit integer from the md5 hex prefix -- identical in any engine."""
    return F.conv(F.substring(F.md5(value.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Per-group HLL register table: (group_cols..., bucket, m_j).

    One hash-aggregation keyed by (group, bucket): partial max runs
    map-side, the shuffle carries at most m=256 rows per group whatever
    the input size -- this is the whole point of the sketch at scale.
    """
    h = _hash60(F.col(value_col))
    rows = df.select(
        *group_cols,
        (h % M).alias("bucket"),
        F.shiftright(h, 8).alias("suffix"),
    ).withColumn(
        # lowest-set-bit position via the (x & -x) isolate + bit_count
        # trick: pure integer codegen. The sequence(1,40)+filter lambda
        # formulation computes the same thing but runs interpreted
        # per-element (~8x slower at 1M rows, measured).
        "rho",
        F.expr(
            f"case when suffix = 0 then {RHO_CAP} else"
            f" least(bit_count((suffix & -suffix) - 1) + 1, {RHO_CAP}) end"
        ),
    )
    return rows.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("m_j"))


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold a register table into one estimate row per group."""
    lc = F.element_at(
        F.array([F.lit(v) for v in LC_TABLE]), F.col("v_empty").cast("int")
    )
    folded = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(0.5), F.col("m_j"))).alias("z_set"),
        F.count("*").alias("nset"),
    )
    raw = F.lit(ALPHA_M2) / (F.col("z_set") + (F.lit(M) - F.col("nset")))
    return (
        folded.withColumn("v_empty", F.lit(M) - F.col("nset"))
        .withColumn("raw", raw)
        .select(
            *group_cols,
            F.when(
                (F.col("raw") <= F.lit(LC_THRESHOLD)) & (F.col("v_empty") >= 1),
                lc,
            )
            .otherwise(F.round(F.col("raw"), 0))
            .cast("bigint")
            .alias("est_distinct"),
            F.col("nset").alias("buckets_set"),
        )
    )


def hll_distinct(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Approximate count-distinct of value_col per group (HLL, m=256)."""
    return hll_estimate(hll_registers(df, group_cols, value_col), group_cols)


def hll_oracle_sql(
    table: str, group_col: str, value_col: str
) -> str:
    """DuckDB replay of hll_distinct: the same hash, register, and
    lookup-table arithmetic, so the result hash-matches bit-for-bit."""
    lc_list = ", ".join(str(v) for v in LC_TABLE)
    return f"""
WITH hashed AS (
  SELECT {group_col},
         list_reduce(list_prepend(0::BIGINT,
           list_transform(string_split_regex(substr(md5({value_col}::VARCHAR),1,15), ''),
                          c -> (strpos('0123456789abcdef', c) - 1)::BIGINT)),
           (a, b) -> a * 16 + b) AS h
  FROM {table}
), rows_ AS (
  SELECT {group_col}, h % {M} AS bucket,
         CASE WHEN (h >> 8) = 0 THEN {RHO_CAP}
              ELSE least(bit_count(((h >> 8) & -(h >> 8)) - 1) + 1, {RHO_CAP})
         END AS rho
  FROM hashed
), regs AS (
  SELECT {group_col}, bucket, max(rho) AS m_j FROM rows_ GROUP BY 1, 2
), folded AS (
  SELECT {group_col},
         sum(pow(0.5, m_j)) AS z_set,
         count(*) AS nset,
         {M} - count(*) AS v_empty,
         {ALPHA_M2!r}::DOUBLE / (sum(pow(0.5, m_j)) + ({M} - count(*))) AS raw
  FROM regs GROUP BY 1
)
SELECT {group_col},
       (CASE WHEN raw <= {LC_THRESHOLD!r} AND v_empty >= 1
             THEN list_extract([{lc_list}], v_empty::INT)
             ELSE round(raw, 0) END)::BIGINT AS est_distinct,
       nset::BIGINT AS buckets_set
FROM folded
"""


# --- Count-min sketch --------------------------------------------------------

CMS_W = 1024  # counters per row
CMS_D = 4  # hash rows
#: pairwise-independent row hashes reuse the MinHash-style affine family
CMS_A = [948193861, 1239576389, 1847483629, 733594781]
CMS_B = [402211, 990377, 1594723, 83777]
CMS_P = 2147483647


def _cms_bucket(i: int, h: Column) -> Column:
    return ((h * CMS_A[i] + CMS_B[i]) % CMS_P) % CMS_W


def cms_table(df: DataFrame, value_col: str) -> DataFrame:
    """Count-min sketch of value_col: (depth, bucket, n) counter rows.

    The sketch is CMS_D x CMS_W integer counters -- constant size
    regardless of input, counters merge by plain addition (partial
    aggregation does most of the work map-side), and every arithmetic
    step is integer so any engine reproduces it exactly. The depth
    explode multiplies rows by CMS_D=4 BEFORE the map-side combine, so
    the shuffle still carries at most D*W = 4096 rows per partition.
    """
    h = _hash60(F.col(value_col)) % (1 << 28)
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("depth"),
                        _cms_bucket(i, h).alias("bucket"),
                    )
                    for i in range(CMS_D)
                ]
            )
        ).alias("e")
    ).select("e.depth", "e.bucket")
    return rows.groupBy("depth", "bucket").agg(F.count("*").alias("n"))


def cms_estimate(table: DataFrame, probes: DataFrame, value_col: str) -> DataFrame:
    """Point-estimate counts for each probe value: min over the CMS_D
    counters the value hashes into. The classic guarantee holds by
    construction: estimate >= true count, overshoot bounded by sketch
    width. The probe side is tiny (heavy-hitter candidates), so every
    join broadcasts."""
    h = _hash60(F.col(value_col)) % (1 << 28)
    probed = probes.select(
        "*",
        *[_cms_bucket(i, h).alias(f"b{i}") for i in range(CMS_D)],
    )
    out = probed
    for i in range(CMS_D):
        t = table.filter(F.col("depth") == i).select(
            F.col("bucket").alias(f"b{i}"), F.col("n").alias(f"n{i}")
        )
        # left join: a probe value never sketched hashes into buckets with
        # no counter row -- the point-query contract still owes it an
        # estimate (0), not silence
        out = out.join(F.broadcast(t), f"b{i}", "left")
    return out.select(
        *probes.columns,
        F.least(
            *[F.coalesce(F.col(f"n{i}"), F.lit(0)) for i in range(CMS_D)]
        ).alias("est_n"),
    )


def cms_oracle_sql(source_sql: str, value_col: str) -> str:
    """DuckDB replay of cms_table over ``source_sql`` rows."""
    hex_parse = (
        f"list_reduce(list_prepend(0::BIGINT,"
        f" list_transform(string_split_regex(substr(md5({value_col}::VARCHAR),1,15), ''),"
        f" c -> (strpos('0123456789abcdef', c) - 1)::BIGINT)),"
        f" (a, b) -> a * 16 + b) % {1 << 28}"
    )
    rows = " UNION ALL ".join(
        f"SELECT {i} AS depth, ((h * {CMS_A[i]} + {CMS_B[i]}) % {CMS_P}) % {CMS_W} AS bucket FROM hashed"
        for i in range(CMS_D)
    )
    return f"""
WITH hashed AS (
  SELECT {hex_parse} AS h FROM ({source_sql})
), rows_ AS ({rows})
SELECT depth, bucket, count(*) AS n FROM rows_ GROUP BY 1, 2
"""
