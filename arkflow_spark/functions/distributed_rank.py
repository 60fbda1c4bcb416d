"""Distributed global order statistics — exact rank / ntile / prefix sum
without a single-partition sort.

Spark evaluates an unpartitioned window (``Window.orderBy(...)`` with no
``partitionBy``) by shuffling EVERY row to one task (``Exchange
SinglePartition``): correct, but a serial bottleneck the moment the input
scales with the corpus. The classic distributed construction replaces it:

1. ``repartitionByRange`` on the (unique) sort key — each partition holds
   a contiguous key range, partition ids ascend with the ordering;
2. rank / prefix-sum WITHIN each range partition (a partitioned window —
   parallel, no global sort);
3. per-partition row counts / sums aggregate to a partition-count-bounded
   table whose running totals are the offsets each partition adds.

The only unpartitioned window left runs over that per-partition aggregate
(#rows = number of range partitions, never corpus-scaled), which is the
same O(cluster) shape as Spark's own non-grouped aggregation. The
range-partitioned input is materialized once (localCheckpoint) and BOTH
branches — per-partition ranks and per-partition counts — read that one
layout, so the whole construction costs one shuffle plus one
materialization of the (already reduced) input. The materialization is
load-bearing for correctness, not just speed: RangePartitioner samples
its boundaries with a seed derived from the RDD id, so letting each
branch re-execute the exchange can place rows in different partitions
per branch, and local-rank + offset stops being a permutation (caught
by tests/test_plans.py::test_distributed_rank_is_permutation).

Exactness contract: callers must pass a TOTAL ordering (include a unique
tie-break column) so ranks are well-defined, and must keep prefix-summed
values in DECIMAL if they later compare the cumulative sums against
thresholds — decimal addition is associative, so the split local-sum +
offset-sum reproduces a sequential running sum bit-for-bit; double
addition is not.

Used by the corpus-scaled ranking queries (RFM ntiles, ABC cumulative
shares, curriculum ordering); gated by tests/test_plans.py which asserts
their plans contain no corpus-scaled unpartitioned WindowExec.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: output column names added by with_global_order
RN = "__rn"  # exact global row_number under the given ordering (1-based)
N = "__n"  # total row count


def with_global_order(
    df: DataFrame,
    order_cols: Sequence[Column],
    sums: dict[str, Column] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``df`` with exact global order statistics, computed
    scale-safely (see module docstring):

    - ``__rn``: global row_number under ``order_cols`` (must be a total
      ordering — include a unique tie-break);
    - ``__n``: total row count;
    - for each ``sums`` entry ``name -> col``: ``__cum_<name>``
      (inclusive running sum in rank order) and ``__tot_<name>``
      (grand total).

    ``order_cols`` are sort-order Columns (``F.asc(...)`` /
    ``F.col(...).desc()``) shared verbatim between the range partitioner
    and the per-partition window, which is what makes local rank +
    offset = global rank.
    """
    spark = df.sparkSession
    sums = sums or {}
    p = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    # Materialize the range partitioning ONCE. The construction reads
    # `ranged` from two branches (the per-partition window and the
    # per-partition counts); without materialization each branch may
    # re-execute the range exchange, and RangePartitioner's boundary
    # SAMPLING is seeded by the RDD id — a fresh id per evaluation —
    # so the two branches can land rows in DIFFERENT partitions and the
    # local-rank + offset sum stops being a permutation (observed:
    # duplicate/missing global ranks on a 10k-row input whenever
    # exchange reuse didn't kick in). localCheckpoint pins one
    # evaluated partitioning that both branches read. (On a cluster,
    # prefer reliable checkpoint() if executor loss during the query
    # is a concern; the partition layout cost is the same one shuffle
    # either way.)
    ranged = (
        df.repartitionByRange(p, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    wloc = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("__lrn", F.count("*").over(wloc))
    for name, col in sums.items():
        local = local.withColumn(f"__lcum_{name}", F.sum(col).over(wloc))
    per = ranged.groupBy("__pid").agg(
        F.count("*").alias("__cnt"),
        *[F.sum(col).alias(f"__s_{name}") for name, col in sums.items()],
    )
    # offsets over the per-partition aggregate: partition-count-bounded
    # (#rows = num range partitions), the one sanctioned unpartitioned
    # window in this codebase  # scale: partition-count-bounded
    woff = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wall = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off_cols = [
        F.col("__pid"),
        F.coalesce(F.sum("__cnt").over(woff), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(wall).alias(N),
    ]
    cum_types = dict(local.dtypes)
    for name in sums:
        s = f"__s_{name}"
        # cast the widened window-sum back to the local-cum dtype before
        # the add: decimal(38,s) + decimal(28,s) would overflow precision
        # and silently drop a scale digit
        dt = cum_types[f"__lcum_{name}"]
        off_cols.append(
            F.sum(s).over(woff).cast(dt).alias(f"__off_{name}")
        )
        off_cols.append(
            F.sum(s).over(wall).cast(dt).alias(f"__tot_{name}")
        )
    off = per.select(*off_cols)
    out = local.join(F.broadcast(off), "__pid").withColumn(
        RN, F.col("__lrn") + F.col("__off")
    )
    for name in sums:
        # NULL offset on the first partition: coalesce to a typed zero so
        # decimal sums stay decimal
        cum = F.col(f"__lcum_{name}") + F.coalesce(
            F.col(f"__off_{name}"), F.lit(0)
        )
        out = out.withColumn(f"__cum_{name}", cum)
    drop = ["__pid", "__lrn", "__off"]
    drop += [c for name in sums for c in (f"__lcum_{name}", f"__off_{name}")]
    return out.drop(*drop)


def exact_ntile(rn: Column, n: Column, k: int) -> Column:
    """SQL ``ntile(k)`` from an exact global row_number ``rn`` and total
    ``n``: the first ``n % k`` buckets get ``ceil(n/k)`` rows, the rest
    ``floor(n/k)`` — bit-identical to the window function, computable
    per-row with no global sort. Integer-exact below 2^53 rows
    (divisions are performed on numerators made divisible, so the
    double quotient is an exact integer)."""

    def iceil(a: Column, b: Column) -> Column:
        # ceil(a/b) for positive integers via exact integer math
        am1 = a - 1
        return ((am1 - (am1 % b)) / b + 1).cast("bigint")

    rem = n % k
    q = ((n - rem) / k).cast("bigint")
    big = rem * (q + 1)
    return (
        F.when(rn <= big, iceil(rn, q + 1))
        .otherwise(rem + iceil(rn - big, q))
        .cast("int")
    )


def percent_rank_of(rn: Column, n: Column) -> Column:
    """SQL ``percent_rank`` from an exact global row_number over a TOTAL
    ordering (rank == row_number when the ordering is unique):
    (rn - 1) / (n - 1), 0.0 for a single row."""
    return F.when(n > 1, (rn - 1) / (n - 1)).otherwise(F.lit(0.0))
