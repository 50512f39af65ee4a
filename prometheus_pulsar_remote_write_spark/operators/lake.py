"""Lake layout for the sample stream: how 100 TB of samples should land.

The reference hands samples to downstream systems (Pulsar topic keyed by
the FNV partition key; Cortex remote-write per tenant) and keeps nothing
-- reference pkg/pulsar/serializers.go:91-114 chooses the partition key
exactly so one series always lands on one partition. A Spark-native
engine persists the same stream as a queryable lake, and the layout IS
the performance model:

- **Partition by (tenant_id, day)**: every operational query starts with
  a tenant + time-range predicate; directory-level partition pruning
  turns those into file skips before any I/O (Catalyst shows them as
  PartitionFilters). This mirrors the reference's per-tenant isolation.
- **Bucket by series key within a partition**: the per-series access
  pattern (the reason for the reference's FNV key) becomes a co-located
  join/agg: two tables bucketed on the same key with the same bucket
  count join with NO Exchange on either side.

Both claims are asserted in tests/test_lake.py, not just stated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def with_lake_columns(samples: DataFrame) -> DataFrame:
    """Derive the physical layout columns: day from the ms timestamp and
    the series colocation key (xxhash64 tier of B8; JVM-side)."""
    from ..functions.fnv import colocation_key_col

    return samples.withColumn(
        "day", F.to_date(F.timestamp_millis(F.col("timestamp")))
    ).withColumn("series_key", colocation_key_col(F.col("labels"), F.col("tenant_id")))


def write_samples_lake(samples: DataFrame, path: str) -> None:
    """Persist the flattened sample stream partitioned by (tenant_id, day).

    Partition columns are low-cardinality by design: tenants x days, not
    series. Series-level locality comes from sorting within files, which
    also gives parquet run-length/delta encoding its best shot."""
    (
        with_lake_columns(samples)
        .repartition("tenant_id", "day")
        .sortWithinPartitions("series_key", "timestamp")
        .write.mode("overwrite")
        .partitionBy("tenant_id", "day")
        .parquet(path)
    )


def read_samples_lake(spark: SparkSession, path: str) -> DataFrame:
    """Read the lake back; tenant/day predicates prune at directory level."""
    return spark.read.parquet(path)


def stream_samples_to_lake(
    samples: DataFrame,
    path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Land a STREAMING flattened sample stream in the lake layout.

    Uses the native parquet file sink (not foreachBatch): its
    _spark_metadata transaction log makes the append exactly-once across
    replays -- a replayed micro-batch's files are recorded once, so the
    lake never double-counts a sample even though the wire side is
    at-least-once. Streaming appends cannot sort within files (global
    sort is unsupported on append streams); series-key file ordering is
    the job of periodic compaction rewriting closed (tenant, day)
    partitions with ``write_samples_lake``.

    Returns the started StreamingQuery.
    """
    writer = (
        with_lake_columns(samples)
        .writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("tenant_id", "day")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_lake_partition(
    spark: SparkSession, path: str, tenant_id: str, day: str, n_files: int = 1
) -> None:
    """Rewrite one closed (tenant, day) partition sorted by
    (series_key, timestamp) in n_files files.

    The nightly companion to ``stream_samples_to_lake``: streaming appends
    land many small unsorted files (a sort is unsupported mid-stream);
    compaction restores the read-optimized layout -- fewer files, series
    runs contiguous, timestamps delta-friendly. Only the one partition
    directory is read and atomically replaced via a temp dir + rename, so
    a 100 TB lake compacts partition-by-partition with bounded work."""
    import shutil
    import uuid

    part_dir = f"{path}/tenant_id={tenant_id}/day={day}"
    tmp_dir = f"{path}/.compact-{uuid.uuid4().hex}"
    (
        spark.read.parquet(part_dir)
        .repartition(n_files)
        .sortWithinPartitions("series_key", "timestamp")
        .write.mode("overwrite")
        .parquet(tmp_dir)
    )
    shutil.rmtree(part_dir)
    # keep only data files; drop the tmp write's _SUCCESS marker
    import glob
    import os

    os.makedirs(part_dir)
    for f in glob.glob(f"{tmp_dir}/*.parquet"):
        shutil.move(f, part_dir)
    shutil.rmtree(tmp_dir, ignore_errors=True)
    # the streaming sink's metadata log still lists the replaced files, so
    # readers must address the lake by path glob, not the sink log
    shutil.rmtree(f"{path}/_spark_metadata", ignore_errors=True)


def compaction_plan(
    path: str, target_bytes: int, min_files: int = 2
) -> list:
    """Lake-wide small-file compaction PLAN: for every (tenant, day)
    partition with at least ``min_files`` data files, pack the files
    into output groups of at most ``target_bytes`` via first-fit
    decreasing -- the decision layer OPTIMIZE runs before rewriting
    anything. Deterministic: files sort by (size desc, name asc), so
    the same lake state always yields the same plan.

    Returns [{tenant_id, day, group_id, files, n_files, group_bytes}].
    A single file larger than the target forms its own group (it is
    already "compact"); a partition whose files all fit in one group
    becomes one rewrite task. This is a metadata-scale operation (file
    listing only -- at 100 TB the same sizes come from the table
    manifest, never from opening data files); the rewrites it plans are
    executed per partition by :func:`compact_lake_partition`."""
    import os
    import re

    plan = []
    part_re = re.compile(r"tenant_id=([^/]*)/day=([^/]*)$")
    for dirpath, _dirnames, filenames in os.walk(path):
        m = part_re.search(dirpath.replace(os.sep, "/"))
        if not m:
            continue
        files = sorted(
            (
                (os.path.getsize(os.path.join(dirpath, f)), f)
                for f in filenames
                if f.endswith(".parquet")
            ),
            key=lambda t: (-t[0], t[1]),
        )
        if len(files) < min_files:
            continue
        groups: list = []  # (remaining_bytes, [names])
        for size, name in files:
            placed = False
            for g in groups:
                if g[0] >= size:
                    g[0] -= size
                    g[1].append(name)
                    placed = True
                    break
            if not placed:
                groups.append([max(target_bytes - size, 0), [name]])
        for gid, (_rem, names) in enumerate(groups):
            gbytes = sum(s for s, n in files if n in set(names))
            plan.append(
                {
                    "tenant_id": m.group(1),
                    "day": m.group(2),
                    "group_id": gid,
                    "files": sorted(names),
                    "n_files": len(names),
                    "group_bytes": gbytes,
                }
            )
    plan.sort(key=lambda p: (p["tenant_id"], p["day"], p["group_id"]))
    return plan


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Materialize a table bucketed (and optionally sorted) by a key.

    Joins/aggregations between tables bucketed on the same key with the
    same bucket count skip the shuffle entirely -- the physical plan has
    no Exchange on either side. This is how the hot series<->metadata
    join should run at 100 TB."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def morton_key(x_col: str, y_col: str, bits: int = 16) -> F.Column:
    """Z-order (Morton) key: interleave ``bits`` low bits of two integer
    columns (given by name). Pure codegen expression -- see
    plans/events_batch.py events_zorder_key for the oracle-checked form.
    SQL-expr because shiftleft's amount must itself be an expression of
    the fold variable, which the Python shiftleft API cannot express."""
    m = 1 << bits
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> "
        f"acc + (((cast({x_col} as bigint) % {m}) >> i) & 1) * shiftleft(1L, 2*i)"
        f"    + (((cast({y_col} as bigint) % {m}) >> i) & 1) * shiftleft(1L, 2*i + 1))"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    dim_x: str,
    dim_y: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered by the Morton key of two integer
    dimensions: repartitionByRange on z (contiguous z-runs per file) +
    sortWithinPartitions (tight pages within the file).

    This is OPTIMIZE ZORDER in plain Spark: each file's (dim_x, dim_y)
    bounding box becomes small and square-ish, so a range predicate on
    EITHER dimension overlaps few files and parquet row-group/file
    min-max stats skip the rest. tests/test_lake.py measures the actual
    bounding-box selectivity against a time-ordered layout.

    Each dimension is min-max normalized to the full ``bits`` range
    before interleaving. Raw values would break the interleave whenever
    the dimensions have different magnitudes (e.g. 4-bit user ids
    against 20-bit epoch-hours: every high z bit would be a time bit and
    the sort degenerates to time-only clustering). The normalization
    pass is one global min/max aggregate, broadcast back -- the same
    shape production ZORDER implementations use (range-id per column,
    then interleave)."""
    b = df.agg(
        F.min(dim_x).cast("double").alias("__xmin"),
        F.max(dim_x).cast("double").alias("__xmax"),
        F.min(dim_y).cast("double").alias("__ymin"),
        F.max(dim_y).cast("double").alias("__ymax"),
    )
    m = (1 << bits) - 1
    scaled = (
        df.crossJoin(F.broadcast(b))
        .withColumn(
            "__ux",
            F.floor(
                (F.col(dim_x) - F.col("__xmin"))
                * m
                / F.greatest(F.col("__xmax") - F.col("__xmin"), F.lit(1.0))
            ).cast("long"),
        )
        .withColumn(
            "__tx",
            F.floor(
                (F.col(dim_y) - F.col("__ymin"))
                * m
                / F.greatest(F.col("__ymax") - F.col("__ymin"), F.lit(1.0))
            ).cast("long"),
        )
    )
    (
        scaled.withColumn("__z", morton_key("__ux", "__tx", bits))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", "__ux", "__tx", "__xmin", "__xmax", "__ymin", "__ymax")
        .write.mode("overwrite")
        .parquet(path)
    )


def stream_continuous_aggregate(
    agg_stream,
    path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    available_now: bool = True,
):
    """Incremental materialized-view maintenance for a streaming
    aggregate (the continuous-aggregate pattern): the update-mode stream
    emits re-aggregated rows per micro-batch, and ``foreachBatch`` merges
    them into a parquet MV with a read-modify-write of only the
    PARTITIONS the batch touched (dynamic partition overwrite keyed by
    the first key column).

    The merge is a true upsert on the FULL group key, not a blind
    partition overwrite: existing rows in a touched partition whose
    group key is absent from the batch are retained (left_anti against
    the batch's keys, then union).  Without that, two groups sharing a
    partition value but updating in different micro-batches would erase
    each other and the MV would diverge from the batch aggregate.

    Exactly-once: a replayed micro-batch upserts the same keys with the
    same rows (idempotent), so the MV converges to the batch aggregate
    regardless of replays. At 100 TB the touched partition set per
    batch is bounded by the watermark horizon -- late windows past the
    watermark stop changing, so old partitions are never rewritten --
    and the read-modify-write only scans those partitions (partition
    pruning on ``part_col``), never the whole MV.

    Returns the started StreamingQuery.
    """
    part_col = key_cols[0]

    def _merge(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch = batch_df.localCheckpoint(eager=True)
        merged = batch
        # Only the first-batch missing-path case may fall through to a
        # plain write; any OTHER read/merge failure (transient FS error,
        # schema drift) must fail the micro-batch so it replays, instead
        # of silently degrading the upsert to a blind partition
        # overwrite that erases co-partitioned groups.
        if _path_exists(spark, path):
            # on-disk partition strings, not inferred types: the keep
            # side's rewrite must land in the SAME directories (see
            # _read_parquet_no_inference)
            existing = _read_parquet_no_inference(spark, path).select(*batch.columns)
            parts = [r[0] for r in batch.select(part_col).distinct().collect()]
            keep = (
                existing.where(F.col(part_col).isin(parts))
                .join(
                    F.broadcast(batch.select(*key_cols).distinct()),
                    on=key_cols,
                    how="left_anti",
                )
            )
            merged = keep.unionByName(batch)
        # cut lineage so the overwrite below does not re-scan the path
        # it is about to rewrite
        merged = merged.localCheckpoint(eager=True)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(part_col)
            .parquet(path)
        )

    writer = (
        agg_stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_merge)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --- row-level deletes: equality-delete files (merge-on-read) ----------------

def _path_exists(spark: SparkSession, path: str) -> bool:
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.exists(jvm_path)


def _fs_delete(spark: SparkSession, path: str) -> None:
    """Recursively delete ``path`` via the Hadoop FileSystem API, so the
    same code path works on local FS, HDFS, and object stores (a
    ``shutil.rmtree`` would silently no-op anywhere but local disk).
    Raises if the FS reports a failed delete -- a delete log that cannot
    be cleared must surface, not linger."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jvm_path) and not fs.delete(jvm_path, True):
        raise IOError(f"Hadoop FileSystem failed to delete {path}")


def _read_parquet_no_inference(spark: SparkSession, path: str):
    """Read a partitioned table with partition values kept as the EXACT
    on-disk strings. Any read-modify-write that reconstructs partition
    directories (apply_deletes, the MV upsert) must use this: with type
    inference on, a string partition like tenant_id='007' reads back as
    int 7 and the rewrite mints a RENAMED 'tenant_id=7' directory next
    to the original.

    Implemented by re-reading with a user-specified schema whose
    partition columns are StringType -- partition parsing then keeps
    the raw directory strings. No session-conf mutation: toggling the
    inference conf around a read is not safe when two threads share the
    session (one thread's restore races the other's read)."""
    base = spark.read.parquet(path)
    # partition columns are exactly the fields ABSENT from the data
    # files (their values come from directory names, at any nesting
    # depth) -- find one data file and diff schemas
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jvm_path, True)
    file_fields: set | None = None
    while it.hasNext():
        p = it.next().getPath()
        if p.getName().endswith(".parquet"):
            file_fields = set(
                spark.read.parquet(p.toString()).schema.fieldNames()
            )
            break
    if file_fields is None:
        return base
    part_names = set(base.schema.fieldNames()) - file_fields
    if not part_names:
        return base
    pinned = T.StructType(
        [
            T.StructField(
                f.name,
                T.StringType() if f.name in part_names else f.dataType,
                f.nullable,
            )
            for f in base.schema.fields
        ]
    )
    return spark.read.schema(pinned).parquet(path)


def _escape_partition_value(spark: SparkSession, value) -> str:
    """Render one partition value the way Spark renders it in a
    partition directory name (Hive-style escaping; NULL becomes the
    Hive default-partition sentinel)."""
    if value is None:
        return "__HIVE_DEFAULT_PARTITION__"
    utils = spark._jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    return utils.escapePathName(str(value))




def write_equality_deletes(
    delete_keys: DataFrame, deletes_path: str, key_cols: list[str]
) -> None:
    """Record row-level DELETEs as equality-delete files (the
    Iceberg/Delta merge-on-read pattern): instead of rewriting data
    files, append a tiny parquet of the deleted keys. GDPR/right-to-
    erasure at 100 TB works exactly like this -- deletes land in
    O(|deleted keys|), the expensive rewrite is deferred to compaction.
    Append-mode so successive delete batches accumulate."""
    delete_keys.select(*key_cols).distinct().write.mode("append").parquet(
        deletes_path
    )


def read_with_deletes(
    spark: SparkSession, path: str, deletes_path: str, key_cols: list[str]
) -> DataFrame:
    """Merge-on-read: the live view is table ANTI-JOIN delete-keys. The
    delete set is broadcast (tiny relative to data by construction), so
    the read plan is scan + broadcast hash anti-join -- no shuffle added
    to the consumer's plan. A missing/empty deletes path degrades to the
    plain read."""
    base = spark.read.parquet(path)
    # explicit existence check, NOT a bare except: a transient read
    # error must fail the query -- silently skipping the delete log
    # would resurrect deleted rows (the data-privacy failure mode)
    if not _path_exists(spark, deletes_path):
        return base
    dels = spark.read.parquet(deletes_path).select(*key_cols).distinct()
    return base.join(F.broadcast(dels), on=key_cols, how="left_anti")


def apply_deletes(
    spark: SparkSession,
    path: str,
    deletes_path: str,
    key_cols: list[str],
    part_cols: list[str] | None = None,
) -> list:
    """Compaction of the delete log into the data files: rewrite ONLY the
    partitions that contain a deleted key (pruned via the distinct
    partition TUPLES of the matching rows -- bounded by the delete set,
    never the table), preserving the table's partition layout
    (``part_cols``, default the lake's (tenant_id, day)). Dynamic
    partition overwrite leaves untouched partitions' files alone; the
    delete log is cleared afterwards. Returns the rewritten partition
    tuples.

    Dynamic overwrite only replaces partitions PRESENT in the written
    output -- a partition whose every row was deleted produces no output
    and its old files would survive the rewrite. Those touched-but-empty
    partitions are explicitly deleted via the Hadoop FileSystem so the
    erasure path holds even when a delete wipes out a whole partition."""
    part_cols = part_cols or ["tenant_id", "day"]
    # partition values must round-trip as the EXACT on-disk strings
    # (tenant_id='007' must not become int 7), or the rewrite mints a
    # renamed directory and the emptied-dir probe below misses the real
    # one -- silently resurrecting erased rows
    base = _read_parquet_no_inference(spark, path)
    if not _path_exists(spark, deletes_path):
        return []
    dels = spark.read.parquet(deletes_path).select(*key_cols).distinct()
    touched_df = (
        base.join(F.broadcast(dels), on=key_cols, how="left_semi")
        .select(*part_cols)
        .distinct()
        .localCheckpoint(eager=True)
    )
    touched = [tuple(r) for r in touched_df.collect()]
    if touched:
        # dynamic overwrite scoped via the writer option below -- no
        # session-conf mutation (a leaked global would change overwrite
        # semantics for unrelated writes in the same session)
        rewritten = (
            base.join(F.broadcast(touched_df), on=part_cols, how="left_semi")
            .join(F.broadcast(dels), on=key_cols, how="left_anti")
            .select(*base.columns)
            .localCheckpoint(eager=True)  # cut lineage from the path being rewritten
        )
        surviving = {
            tuple(r)
            for r in rewritten.select(*part_cols).distinct().collect()
        }
        emptied = [t for t in touched if t not in surviving]
        if surviving:
            (
                rewritten.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*part_cols)
                .parquet(path)
            )
        # a fully-deleted partition emits no rows, so dynamic overwrite
        # never rewrites it -- drop its directory explicitly or the
        # delete silently resurrects on the next read
        for t in emptied:
            segments = [
                f"{c}={_escape_partition_value(spark, v)}"
                for c, v in zip(part_cols, t)
            ]
            _fs_delete(spark, path.rstrip("/") + "/" + "/".join(segments))
            # prune now-empty ancestor dirs (e.g. tenant_id=X once its
            # last day=Y child is gone) so the layout stays clean
            for depth in range(len(segments) - 1, 0, -1):
                parent = path.rstrip("/") + "/" + "/".join(segments[:depth])
                jvm_path = spark._jvm.org.apache.hadoop.fs.Path(parent)
                fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
                if not fs.exists(jvm_path) or len(fs.listStatus(jvm_path)):
                    break
                _fs_delete(spark, parent)
    _fs_delete(spark, deletes_path)
    return sorted(touched)
