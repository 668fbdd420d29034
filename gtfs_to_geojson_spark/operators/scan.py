"""Distributed prefix scan: global running totals and training-shard
packing (engine-new; the training-data-pipeline family of SURVEY.md
§2, same contract style as operators/dedup.py).

Spark's own window API cannot express a GLOBAL cumulative sum at
scale: ``Window.orderBy(id)`` with no ``partitionBy`` moves the whole
table into ONE task (Spark emits the single-partition warning and the
plan shows Exchange SinglePartition). This module implements the
textbook two-phase parallel scan instead:

1. range-repartition by the (unique) order key and sort within each
   partition — the ONLY wide shuffle, data crosses the wire once;
2. per-partition weight sums — a map-side aggregate whose result is
   ≤ num_partitions rows (bounded by configuration, not data), the
   one driver-side collect;
3. broadcast the exclusive prefix offsets back and add a partition-
   local cumulative sum in a single streaming Arrow pass (no second
   shuffle; each task owns exactly one range of the key space).

The result is exact and partitioning-independent as long as the order
key is a total order (unique values): integer weights sum
associatively, so the per-partition decomposition returns the same
int64 as a serial left fold. Float weights are supported but carry
the usual FP caveat (addition is not associative; the value can
differ from a serial fold in the last ulp — use integer weights when
an external engine must reproduce the numbers bit-for-bit).

``pack_shards`` is the consumer this exists for: packing documents
into fixed-size training shards (~N tokens each) needs every row's
global start offset — exactly the exclusive running total — and at
10^12 rows that must not serialize through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PID = "_scan_pid"


def _is_integral(dt) -> bool:
    return isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType))


def running_total(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    out_col: str = "running_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append the inclusive global running total of ``weight_col`` in
    ``order_col`` order (the SQL ``SUM(w) OVER (ORDER BY id ROWS
    UNBOUNDED PRECEDING)`` with nulls counted as 0), computed as a
    two-phase distributed scan — one range shuffle, one ≤P-row
    collect, one map-only Arrow pass. ``order_col`` must be a total
    order (unique); ties would make any engine's running total
    ambiguous row-by-row.

    Scale: the range partitioner samples the key distribution, so a
    skewed key density still yields balanced partitions; phase-2
    state is one scalar carry per task; the full rows cross the
    executor-local Arrow boundary once (node-local, not a network
    shuffle — strictly cheaper than the window-by-partition-id
    alternative, which re-shuffles every row a second time).
    """
    wt = df.schema[weight_col].dataType
    integral = _is_integral(wt)
    if not integral and not isinstance(wt, (T.FloatType, T.DoubleType)):
        raise TypeError(f"running_total: unsupported weight type {wt}")
    out_type = T.LongType() if integral else T.DoubleType()

    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    # phase 1: the one wide shuffle — range partition + local sort,
    # then freeze the partition assignment (both later passes must
    # see the same pid stamps and row order). MEMORY_AND_DISK (the
    # SERIALIZED level for DataFrames) — the default deserialized
    # checkpoint heap-caches every row object and OOMed a 400M-row
    # local[32] run; serialized blocks spill cleanly and at cluster
    # scale the frozen frame was never going to live on-heap anyway.
    from pyspark.storagelevel import StorageLevel

    d = (
        df.repartitionByRange(n, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )

    # phase 2: per-partition sums — map-side combine, ≤ n rows out
    sums = {
        r[_PID]: r["_s"]
        for r in d.groupBy(_PID)
        .agg(F.sum(F.coalesce(F.col(weight_col), F.lit(0))).alias("_s"))
        .collect()
    }
    zero = 0 if integral else 0.0
    offsets: dict[int, int | float] = {}
    acc = zero
    for pid in range(n):
        offsets[pid] = acc
        acc += sums.get(pid, zero)

    names = [f.name for f in d.schema.fields]
    if out_col in names:
        raise ValueError(f"running_total: column {out_col!r} already exists")
    wx = names.index(weight_col)
    px = names.index(_PID)
    out_schema = T.StructType(list(d.schema.fields) + [T.StructField(out_col, out_type)])

    def kernel(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        npt = np.int64 if integral else np.float64
        cur_pid, carry = None, npt(0)
        for rb in batches:
            if rb.num_rows == 0:
                continue
            w = pc.fill_null(rb.column(wx), zero).to_numpy(zero_copy_only=False)
            w = w.astype(npt, copy=False)
            pid = rb.column(px).to_numpy(zero_copy_only=False)
            run = np.cumsum(w)
            # a task normally sees exactly one pid, but stay correct
            # under any narrow partition merge: at each pid boundary
            # restart the carry from that partition's exclusive offset
            starts = np.flatnonzero(np.r_[True, pid[1:] != pid[:-1]])
            bounds = np.r_[starts, len(run)]
            raw_prefix = [run[s - 1] if s else npt(0) for s in starts]
            for idx, s in enumerate(starts):
                p = int(pid[s])
                if p != cur_pid:
                    cur_pid, carry = p, npt(offsets[p])
                run[s : bounds[idx + 1]] += carry - raw_prefix[idx]
                carry = run[bounds[idx + 1] - 1]
            yield pa.RecordBatch.from_arrays(
                list(rb.columns) + [pa.array(run)], names=names + [out_col]
            )

    return d.mapInArrow(kernel, out_schema).drop(_PID)


def pack_shards(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    shard_size: int,
    out_col: str = "shard_id",
    total_col: str = "running_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each row to a fixed-capacity training shard: shard_id =
    (global start offset) // shard_size, where a row's start offset
    is the exclusive running total of ``weight_col`` in ``order_col``
    order. Deterministic, engine-reproducible (integer division on
    the int64 scan for integral weights), and every shard holds
    ~shard_size weight regardless of row-size skew — the standard
    greedy token-packing contract for LLM training data.

    The shard id is derived from the scan as a JVM codegen expression
    (integer ``div`` for integral weights — no double rounding at
    >2^53 totals), so the only Python stage is the scan's own
    map-only cumsum pass."""
    if shard_size <= 0:
        raise ValueError("pack_shards: shard_size must be positive")
    rt = running_total(df, order_col, weight_col, out_col=total_col, num_partitions=num_partitions)
    start = F.col(total_col) - F.coalesce(F.col(weight_col), F.lit(0))
    if _is_integral(df.schema[weight_col].dataType):
        shard = F.expr(
            f"({total_col} - coalesce({weight_col}, 0)) div {int(shard_size)}"
        )
    else:
        shard = F.floor(start / F.lit(float(shard_size))).cast("long")
    return rt.withColumn(out_col, shard)


def grouped_running_total(
    df: DataFrame,
    group_col: str,
    order_col: str,
    weight_col: str | None,
    out_col: str = "running_total",
    num_partitions: int | None = None,
    max_groups: int = 100_000,
    assume_sorted: bool = False,
) -> DataFrame:
    """Per-group inclusive running total of ``weight_col`` in
    ``order_col`` order — the SQL ``SUM(w) OVER (PARTITION BY g ORDER
    BY id ROWS UNBOUNDED PRECEDING)`` — computed WITHOUT putting any
    group into a single task.

    Why not Spark's own window: ``Window.partitionBy(g).orderBy(id)``
    hashes each group into exactly ONE task. That is the right plan
    for HIGH-cardinality groups (millions of small groups — use the
    built-in window there), and exactly the wrong one for
    LOW-cardinality groups: a 10^12-image table bucketed into ~25
    aspect-ratio buckets would run 25 tasks no matter how many
    executors exist, each sorting ~4·10^10 rows. This operator covers
    that regime with a two-phase scan in one of two physical shapes:

    **Shuffle path (default)** — no assumptions about the input:

    1. one range shuffle on ``(group, order)`` — each group occupies a
       CONTIGUOUS run of partitions, split across as many tasks as its
       size demands (the range partitioner samples the key density, so
       a hot bucket gets proportionally many partitions);
    2. per-(partition, group) weight sums — bounded by P + G rows
       (each partition contributes its boundary groups plus wholly
       contained ones; G = distinct groups, enforced ≤ ``max_groups``),
       one driver collect;
    3. broadcast exclusive per-(partition, group) offsets back, one
       map-only Arrow cumsum pass that restarts the carry at every
       group or partition boundary.

    **Sorted fast path (``assume_sorted=True``)** — when the input is
    already ``order_col``-clustered (each input partition holds a
    contiguous, non-overlapping order range, rows ascending within it:
    ``spark.range``, or a table written range-sorted by id — how a
    10^12-row image table IS laid out), the shuffle AND the
    checkpoint vanish entirely:

    1. per-(partition, group) sums **plus per-partition order min/max**
       in one aggregate over the raw scan;
    2. the driver VERIFIES the claim (partition order ranges must be
       pairwise disjoint — raises ``ValueError`` on overlap, so a
       wrongly-asserted input fails loudly, never silently), orders
       partitions by their range (partition NUMBERING need not be
       ascending: Spark plans parquet splits largest-first), and
       computes offsets in that range order;
    3. the same map-only Arrow pass, now with a per-group carry dict
       (groups interleave arbitrarily in natural order), which also
       re-verifies within-partition monotonicity row-by-row.

    Zero shuffle: the only wide-plan cost left is the Arrow pass
    itself. This is the default plan to reach for at cluster scale —
    re-sorting 10^12 already-sorted rows to avoid trusting (and
    verifying) their layout is exactly the shuffle the brief says not
    to pay.

    Exactness contract matches ``running_total``: ``order_col`` must
    be unique within each group (globally unique for
    ``assume_sorted``, so range disjointness is well-defined); integer
    weights reproduce a serial fold bit-for-bit. The two paths return
    identical values (pinned in tests/test_batching.py).

    ``weight_col=None`` is count mode (every row weighs 1 — the rank /
    batch-packing case): no weight column is scanned or shipped, the
    stats pass aggregates ``count(*)``, and the kernels cumsum a
    constant — at 10^12 rows the bytes crossing the Arrow boundary are
    the visible cost, so not materializing a column of ones is a real
    saving, not an aesthetic one."""
    count_mode = weight_col is None
    if count_mode:
        integral = True
    else:
        wt = df.schema[weight_col].dataType
        integral = _is_integral(wt)
        if not integral and not isinstance(wt, (T.FloatType, T.DoubleType)):
            raise TypeError(f"grouped_running_total: unsupported weight type {wt}")
    out_type = T.LongType() if integral else T.DoubleType()

    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    from pyspark.storagelevel import StorageLevel

    if assume_sorted:
        # no shuffle, no checkpoint: a deterministic scan re-executes
        # with identical partition planning, so the pid stamps agree
        # between the stats pass and the Arrow pass. (A nondeterministic
        # derived frame should be persisted by the caller first.)
        d = df.withColumn(_PID, F.spark_partition_id())
        stats = (
            d.groupBy(_PID, group_col)
            .agg(
                (F.count(F.lit(1)) if count_mode
                 else F.sum(F.coalesce(F.col(weight_col), F.lit(0)))).alias("_s"),
                F.min(order_col).alias("_lo"),
                F.max(order_col).alias("_hi"),
            )
            .collect()
        )
    else:
        d = (
            df.repartitionByRange(n, F.col(group_col), F.col(order_col))
            .sortWithinPartitions(group_col, order_col)
            .withColumn(_PID, F.spark_partition_id())
            .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
        )
        # phase 2: per-(pid, group) sums. Range partitioning keeps each
        # group contiguous, so the result has ≤ P + G rows — the driver
        # state is bounded by configuration (P) and the documented
        # low-cardinality contract (G ≤ max_groups), never by row count.
        stats = (
            d.groupBy(_PID, group_col)
            .agg((F.count(F.lit(1)) if count_mode
                  else F.sum(F.coalesce(F.col(weight_col), F.lit(0)))).alias("_s"))
            .collect()
        )

    n_groups = len({r[group_col] for r in stats})
    if n_groups > max_groups:
        raise ValueError(
            f"grouped_running_total: {n_groups} distinct groups exceeds "
            f"max_groups={max_groups}; for high-cardinality groups use "
            "Window.partitionBy — each group fits one task there"
        )
    zero = 0 if integral else 0.0

    if assume_sorted:
        # verify the sortedness claim at partition granularity: the
        # per-partition order ranges must be pairwise disjoint. Order
        # partitions by range, not by pid.
        by_pid: dict = {}
        for r in stats:
            lo, hi = by_pid.get(r[_PID], (None, None))
            by_pid[r[_PID]] = (
                r["_lo"] if lo is None or r["_lo"] < lo else lo,
                r["_hi"] if hi is None or r["_hi"] > hi else hi,
            )
        ordered = sorted(by_pid.items(), key=lambda kv: kv[1][0])
        for (p1, (_, hi1)), (p2, (lo2, _)) in zip(ordered, ordered[1:]):
            if not (hi1 < lo2):
                raise ValueError(
                    "grouped_running_total(assume_sorted=True): input "
                    f"partitions {p1} and {p2} have overlapping "
                    f"{order_col!r} ranges ({hi1!r} ≥ {lo2!r}) — the "
                    "input is not order-clustered; use the default "
                    "shuffle path"
                )
        pid_order = [p for p, _ in ordered]
    else:
        pid_order = list(range(n))

    # exclusive offset of (pid, g) = sum of g's weight in earlier
    # partitions (earlier in RANGE order)
    sums: dict = {}
    for r in stats:
        sums[(r[_PID], r[group_col])] = r["_s"] if r["_s"] is not None else zero
    acc: dict = {}
    offsets: dict = {}
    for pid in pid_order:
        for (p, g), s in list(sums.items()):
            if p != pid:
                continue
            offsets[(p, g)] = acc.get(g, zero)
            acc[g] = offsets[(p, g)] + s

    names = [f.name for f in d.schema.fields]
    if out_col in names:
        raise ValueError(f"grouped_running_total: column {out_col!r} already exists")
    wx = None if count_mode else names.index(weight_col)
    px = names.index(_PID)
    gx = names.index(group_col)
    ox = names.index(order_col)
    out_schema = T.StructType(list(d.schema.fields) + [T.StructField(out_col, out_type)])

    def kernel_segmented(batches):
        """Shuffle path: rows arrive sorted by (group, order), so each
        batch is a few maximal constant-(pid, group) segments."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        npt = np.int64 if integral else np.float64
        cur_key, carry = None, npt(0)
        for rb in batches:
            if rb.num_rows == 0:
                continue
            if wx is None:
                w = np.ones(rb.num_rows, dtype=npt)
            else:
                w = pc.fill_null(rb.column(wx), zero).to_numpy(zero_copy_only=False)
                w = w.astype(npt, copy=False)
            pid = rb.column(px).to_numpy(zero_copy_only=False)
            grp = rb.column(gx).to_numpy(zero_copy_only=False)
            run = np.cumsum(w)
            # segment = maximal run of constant (pid, group); restart
            # the carry from the broadcast offset at each new segment
            brk = (pid[1:] != pid[:-1]) | (grp[1:] != grp[:-1])
            starts = np.flatnonzero(np.r_[True, brk])
            bounds = np.r_[starts, len(run)]
            raw_prefix = [run[s - 1] if s else npt(0) for s in starts]
            for idx, s in enumerate(starts):
                key = (int(pid[s]), grp[s])
                if key != cur_key:
                    cur_key, carry = key, npt(offsets[key])
                run[s : bounds[idx + 1]] += carry - raw_prefix[idx]
                carry = run[bounds[idx + 1] - 1]
            yield pa.RecordBatch.from_arrays(
                list(rb.columns) + [pa.array(run)], names=names + [out_col]
            )

    def kernel_interleaved(batches):
        """Sorted fast path: rows arrive in natural order, groups
        interleave arbitrarily — per-group carry dict, seeded from the
        broadcast offsets at first sight within each partition; also
        re-verifies within-partition order monotonicity."""
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc

        npt = np.int64 if integral else np.float64
        cur_pid = None
        carry: dict = {}
        last_order = None
        for rb in batches:
            if rb.num_rows == 0:
                continue
            if wx is None:
                w = np.ones(rb.num_rows, dtype=npt)
            else:
                w = pc.fill_null(rb.column(wx), zero).to_numpy(zero_copy_only=False)
                w = w.astype(npt, copy=False)
            pid = rb.column(px).to_numpy(zero_copy_only=False)
            grp = rb.column(gx).to_numpy(zero_copy_only=False)
            order = rb.column(ox).to_numpy(zero_copy_only=False)
            run = np.empty(len(w), dtype=npt)
            # a task normally holds one pid; handle merges defensively
            pstarts = np.flatnonzero(np.r_[True, pid[1:] != pid[:-1]])
            pbounds = np.r_[pstarts, len(w)]
            for k, s in enumerate(pstarts):
                e = pbounds[k + 1]
                p = int(pid[s])
                if p != cur_pid:
                    cur_pid, carry, last_order = p, {}, None
                o = order[s:e]
                if len(o) and ((o[1:] < o[:-1]).any() or (
                    last_order is not None and o[0] < last_order
                )):
                    raise ValueError(
                        "grouped_running_total(assume_sorted=True): "
                        f"rows in partition {p} are not ascending in "
                        "the order column"
                    )
                last_order = o[-1] if len(o) else last_order
                g = pd.Series(grp[s:e])
                seg = pd.Series(w[s:e]).groupby(g).cumsum().to_numpy()
                uniq = g.unique()
                base = np.array(
                    [
                        carry[u] if u in carry else npt(offsets[(p, u)])
                        for u in uniq
                    ],
                    dtype=npt,
                )
                codes = g.map({u: i for i, u in enumerate(uniq)}).to_numpy()
                run[s:e] = seg + base[codes]
                totals = pd.Series(w[s:e]).groupby(g).sum()
                for u in uniq:
                    carry[u] = (carry[u] if u in carry else npt(offsets[(p, u)])) + npt(totals[u])
            yield pa.RecordBatch.from_arrays(
                list(rb.columns) + [pa.array(run)], names=names + [out_col]
            )

    kernel = kernel_interleaved if assume_sorted else kernel_segmented
    return d.mapInArrow(kernel, out_schema).drop(_PID)


def pack_batches(
    df: DataFrame,
    group_col: str,
    order_col: str,
    batch_size: int,
    out_col: str = "batch_id",
    pos_col: str = "pos_in_batch",
    num_partitions: int | None = None,
    assume_sorted: bool = False,
) -> DataFrame:
    """Assign each row a per-group training-batch id and position:
    batch_id = (rank_in_group − 1) div batch_size, pos_in_batch =
    (rank_in_group − 1) mod batch_size, rank in ``order_col`` order.

    The image-training consumer this exists for: after aspect-ratio
    bucketing (``multimodal.aspect_bucket``), every batch fed to the
    trainer must be shape-homogeneous, so batches are packed WITHIN a
    bucket — ~25 huge groups at 10^12 images, exactly the
    low-cardinality regime ``grouped_running_total`` is built for
    (a plain partitioned window would collapse each bucket into one
    task). The rank comes from the grouped scan with weight 1; the
    batch id and position are JVM integer div/mod on the int64 rank."""
    if batch_size <= 0:
        raise ValueError("pack_batches: batch_size must be positive")
    rank = "_pack_rank"
    rt = grouped_running_total(
        df, group_col, order_col, None,
        out_col=rank, num_partitions=num_partitions,
        assume_sorted=assume_sorted,
    )
    return (
        rt.withColumn(out_col, F.expr(f"({rank} - 1) div {int(batch_size)}"))
        .withColumn(pos_col, F.expr(f"({rank} - 1) % {int(batch_size)}").cast("int"))
        .drop(rank)
    )
