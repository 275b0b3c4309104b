"""Three-layer parquet warehouse (SURVEY.md §1.4).

staging -> transformed -> production directories, replacing the
reference's three databases (MySQL stagging/transformed + PostgreSQL
bank_production). Writers are layout-aware: the production fact sink
partitions by date (replacing the reference's secondary indexes,
K6 src/load.py:107-122 — partition pruning is the scalable analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

LAYERS = ("staging", "transformed", "production")


class Warehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, layer: str, table: str) -> str:
        assert layer in LAYERS, layer
        return f"{self.root}/{layer}/{table}"

    def read(
        self, layer: str, table: str, merge_schema: bool = False
    ) -> DataFrame:
        """``merge_schema=True`` reconciles files written under evolved
        schemas (a daily append that gained a column): the union schema
        is read, pre-evolution rows surface the new column as NULL.
        Off by default — schema merging footer-scans every file, a real
        cost on a 100 TB table, and the common case is a stable schema
        enforced by the pipeline's validated projections (P1)."""
        r = self.spark.read
        if merge_schema:
            r = r.option("mergeSchema", "true")
        return r.parquet(self.path(layer, table))

    def exists(self, layer: str, table: str) -> bool:
        """Filesystem probe via the Hadoop FS API (scheme-agnostic: local,
        HDFS, object stores). Callers use this instead of catching read
        exceptions — a corrupt table then fails loudly instead of being
        silently treated as "first run"."""
        sc = self.spark.sparkContext
        p = sc._jvm.org.apache.hadoop.fs.Path(self.path(layer, table))
        fs = p.getFileSystem(sc._jsc.hadoopConfiguration())
        return bool(fs.exists(p))

    def qualified_uri(self, path: str) -> str:
        """Fully-qualified URI for ``path`` exactly as Spark's
        ``input_file_name()`` reports it. input_file_name returns the
        URL-ENCODED ``toUri().toString()`` form (``file:///a%20b``);
        Hadoop ``Path.toString()`` renders ``file:/a b`` — comparing
        against the latter silently matches NOTHING, which let the
        cross-file keep-last rank fall back to monotonic-id enumeration
        order (correct only by local-mode accident) and zeroed every
        observed per-file record count."""
        sc = self.spark.sparkContext
        p = sc._jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(sc._jsc.hadoopConfiguration())
        return fs.makeQualified(p).toUri().toString()

    def overwrite(self, df: DataFrame, layer: str, table: str,
                  partition_by: list[str] | None = None) -> None:
        """Snapshot rewrite — the upsert sink's terminal step (K1/K2)."""
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(layer, table))

    def append(self, df: DataFrame, layer: str, table: str,
               partition_by: list[str] | None = None) -> None:
        """Append-only sink (K3, src/load.py:207-255)."""
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(layer, table))

    def overwrite_partitions(self, df: DataFrame, layer: str, table: str,
                             partition_by: list[str]) -> None:
        """Dynamic partition overwrite: replace ONLY the partitions
        present in ``df``, leave every other partition untouched — the
        incremental-refresh sink (reload one day/source without
        rewriting the table). Static overwrite mode would truncate the
        whole table first; at 100 TB that turns a one-partition backfill
        into a full rewrite. Scoped config flip, restored afterward, so
        the session default stays static for plain ``overwrite``."""
        key = "spark.sql.sources.partitionOverwriteMode"
        prev = self.spark.conf.get(key, "STATIC")
        self.spark.conf.set(key, "dynamic")
        try:
            (df.write.mode("overwrite")
             .partitionBy(*partition_by)
             .parquet(self.path(layer, table)))
        finally:
            self.spark.conf.set(key, prev)

    def export_csv(self, df: DataFrame, out_dir: str) -> None:
        """K4: CSV export with NULL -> 'NA' (src/transform.py:493-515)."""
        df.na.fill("NA").write.mode("overwrite").option("header", True).csv(out_dir)

    def export_jsonl_shards(
        self,
        df: DataFrame,
        out_dir: str,
        shard_col: str | None = None,
        n_shards: int | None = None,
    ) -> dict:
        """Training-data delivery: export as JSON-Lines shard files —
        the format dataloaders (webdataset-style readers, HF
        datasets, streaming tokenizers) actually consume. If
        ``shard_col`` is given (e.g. x40's LPT shard assignment) the
        output is partitioned by it with ONE file per shard (the
        writer repartitions on the shard key first, so each shard
        directory holds exactly one sequentially-readable file);
        ``shard_col`` values must be non-null — a NULL would land in
        Hive's default partition and corrupt the manifest key, so the
        writer rejects it up front. Otherwise rows are content-hash
        sharded into ``n_shards`` buckets (xxhash64 over all columns —
        deterministic and replay-stable, but fully-duplicate rows
        collide into one shard; dedupe first if exact balance
        matters). Returns a manifest {shard_value: row_count} — the
        sidecar a dataloader uses for length-aware scheduling. At
        100 TB this is the same partitioned-write economics as the
        year-partitioned fact sink: shard count must track data
        volume, and the per-shard repartition guarantees no tiny-file
        explosion."""
        from pyspark.sql import functions as F

        if shard_col is None:
            if n_shards is not None and n_shards < 1:
                raise ValueError(f"n_shards must be >= 1, got {n_shards}")
            n = 16 if n_shards is None else n_shards
            df = df.withColumn(
                "shard",
                F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), n),
            )
        else:
            if df.filter(F.col(shard_col).isNull()).limit(1).count():
                raise ValueError(
                    f"shard_col {shard_col!r} contains NULLs — they would "
                    "land in __HIVE_DEFAULT_PARTITION__ and break the "
                    "manifest; fill or filter them first"
                )
        if shard_col is None:
            shard_col = "shard"
        out = df.repartition(shard_col)
        out.write.mode("overwrite").partitionBy(shard_col).json(out_dir)
        back = self.spark.read.json(out_dir)
        manifest = {
            r["sv"]: r["n"]
            for r in back.groupBy(F.col(shard_col).alias("sv"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        return manifest

    def read_jsonl_shards(
        self,
        in_dir: str,
        schema=None,
        shards: list | None = None,
        verify_manifest: dict | None = None,
    ) -> DataFrame:
        """The read side of ``export_jsonl_shards`` — a dataloader's
        view of the shard store. ``schema`` (DDL string or StructType)
        skips JSON inference (never infer over 100 TB — the same rule
        as the CSV staging scans); ``shards`` prunes to specific shard
        values via PARTITION PRUNING (the directory layout means
        unrequested shards are never opened — verify with
        .explain: PartitionFilters); ``verify_manifest`` re-counts the
        requested shards against the export's manifest sidecar and
        raises on drift (a torn copy or partial sync shows up as a
        count mismatch BEFORE training consumes the data)."""
        from pyspark.sql import functions as F

        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.json(in_dir)
        if shards is not None:
            df = df.filter(F.col("shard").isin(*[F.lit(s) for s in shards]))
        if verify_manifest is not None:
            got = {
                r["sv"]: r["n"]
                for r in df.groupBy(F.col("shard").alias("sv"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            want = {
                k: v
                for k, v in verify_manifest.items()
                if shards is None or k in set(shards)
            }
            if got != want:
                drift = {
                    k: (want.get(k), got.get(k))
                    for k in set(want) | set(got)
                    if want.get(k) != got.get(k)
                }
                raise ValueError(
                    f"jsonl shard store does not match its manifest "
                    f"(shard: expected, found): {drift}"
                )
        return df

    def publish_staged(
        self,
        df: DataFrame,
        layer: str,
        table: str,
        audits: dict,
        partition_by: list[str] | None = None,
    ) -> dict:
        """Write-Audit-Publish: write ``df`` to ``<table>.staging``,
        run every audit against the STAGED read-back, and only an
        all-green report atomically swaps staging into the serving
        path — a failed audit leaves the serving table UNTOUCHED and
        the staged files in place for inspection (the promotion gate
        Iceberg calls WAP; the reference's staged upsert,
        src/load.py:210-286, publishes unconditionally — this adds the
        audit between its two steps). ``audits`` maps name ->
        callable(DataFrame) -> truthy; audits run on the read-back, not
        the input plan, so they verify the BYTES a consumer would see.
        The swap reuses the crash-safe two-rename helper the streaming
        state compactors use (a crash window leaves a complete .trash
        copy, never a half-published table). Returns the audit report
        plus '__published__'. At 100 TB the staged write is the same
        cost the publish would be — the audit scan is the only extra,
        and it is the scan you WANT before 1000 consumers read bad
        data."""
        from ..streaming.file_stream import _swap_compacted

        final = self.path(layer, table)
        staging = final + ".staging"
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(staging)
        staged = self.spark.read.parquet(staging)
        report = {name: bool(fn(staged)) for name, fn in audits.items()}
        published = all(report.values())
        if published:
            if self.exists(layer, table):
                _swap_compacted(self.spark, final, staging)
            else:
                sc = self.spark.sparkContext
                hadoop = sc._jvm.org.apache.hadoop.fs.Path
                p_stage, p_final = hadoop(staging), hadoop(final)
                fs = p_final.getFileSystem(sc._jsc.hadoopConfiguration())
                if not fs.rename(p_stage, p_final):
                    raise IOError(
                        f"publish: rename {staging} -> {final} failed; "
                        f"staged data intact"
                    )
        report["__published__"] = published
        return report

    def compact(
        self,
        layer: str,
        table: str,
        target_file_bytes: int = 128 << 20,
        partition_by: list[str] | None = None,
    ) -> dict[str, int]:
        """Rewrite a table directory into ~``target_file_bytes`` files.

        Small-file management is the tax every incremental-append sink
        pays: each micro-batch/daily delta adds files, and a year of
        appends turns a 100 TB table into millions of KB-sized parquet
        files whose open/footer cost dominates scan time. Compaction
        reads the current snapshot, coalesces to
        ceil(bytes / target_file_bytes) output files, writes to a
        side directory, and atomically swaps via FileSystem rename —
        readers see the old or the new layout, never a partial one.
        (Table formats make this a metadata-only OPTIMIZE; this is the
        plain-parquet form.) Returns {files_before, files_after}.

        For a partitioned table pass ``partition_by``: the rewrite then
        preserves the directory layout (omitting it on a partitioned
        table would flatten the partition columns into the data files
        and destroy pruning) and still honors ``target_file_bytes``
        per DIRECTORY: each partition gets
        ceil(partition_bytes / target_file_bytes) files, estimated from
        per-partition row counts x the table's mean row width (one tiny
        agg — no extra data shuffle). Rows are salted with a
        deterministic hash of the whole row into that many buckets and
        the write repartitions on (partition keys, salt), so a skewed
        10 GB partition becomes ~80 x 128 MB files while tiny partitions
        stay at one file each. (A non-deterministic salt — rand() — is
        unsafe under task retry with repartition: a re-executed stage
        could re-salt rows mid-write.) files_before/after count files
        recursively across partition directories.
        """
        import math

        from pyspark.sql import functions as F

        sc = self.spark.sparkContext
        jvm = sc._jvm
        conf = sc._jsc.hadoopConfiguration()
        cur = jvm.org.apache.hadoop.fs.Path(self.path(layer, table))
        fs = cur.getFileSystem(conf)
        summary = fs.getContentSummary(cur)
        total_bytes = summary.getLength()

        def _count_files(p) -> int:
            n = 0
            for f in fs.listStatus(p):
                if f.isFile():
                    n += 0 if f.getPath().getName().startswith("_") else 1
                else:
                    n += _count_files(f.getPath())
            return n

        files_before = _count_files(cur)
        n_files = max(1, math.ceil(total_bytes / target_file_bytes))
        tmp = jvm.org.apache.hadoop.fs.Path(self.path(layer, table) + "__compact_tmp")
        df = self.read(layer, table)
        if partition_by:
            # Per-directory file budget: rows_p * (total_bytes / total_rows)
            # estimates partition bytes (exact per-dir byte listing would
            # work too but couples this to the physical layout; the row
            # estimate is layout-independent and one keyed agg). The agg
            # output is one row per partition directory — broadcast.
            sizes = df.groupBy(*partition_by).agg(F.count("*").alias("__rows"))
            # total row count as a 1-row broadcast scalar (a windowed
            # total over the tiny sizes frame would plan an
            # unpartitioned WindowExec and trip Spark's single-partition
            # alarm for what is a per-directory metadata frame)
            tot = sizes.agg(F.sum("__rows").alias("__tot"))
            # File-size guarantee lives in the WRITER, not the shuffle
            # layout: maxRecordsPerFile = target bytes / mean row width
            # splits any over-budget write task's output, so the file
            # budget holds even when several (partition, salt) groups
            # hash-collide into one shuffle partition. Before this, the
            # budget silently relied on distinct groups landing in
            # distinct shuffle partitions — true at 32 fixed partitions
            # by luck, false the moment shuffle parallelism tracks the
            # session core count (r15; guide §2.5/§6).
            total_rows = tot.collect()[0]["__tot"] or 1
            rows_per_file = max(
                1, int(target_file_bytes * total_rows / max(total_bytes, 1))
            )
            sizes = (
                sizes.withColumn("__tot", F.lit(total_rows))
                .withColumn(
                    "__nf",
                    F.greatest(
                        F.lit(1),
                        F.ceil(
                            F.col("__rows")
                            * F.lit(float(total_bytes))
                            / F.col("__tot")
                            / F.lit(float(target_file_bytes))
                        ),
                    ).cast("int"),
                )
                .drop("__rows", "__tot")
            )
            # Null-safe join: partition keys CAN be null (e.g. a
            # transaction_year derived from a dirty date parses to NULL
            # and lands in the __HIVE_DEFAULT_PARTITION__ directory). A
            # plain equi-join would silently drop those rows from the
            # rewrite and the swap would then delete them — eqNullSafe
            # keeps the null partition in the compacted output.
            sizes = sizes.select(
                *[F.col(c).alias(f"__k_{c}") for c in partition_by], "__nf"
            )
            cond = [
                F.col(c).eqNullSafe(F.col(f"__k_{c}")) for c in partition_by
            ]
            salted = df.join(F.broadcast(sizes), cond).drop(
                *[f"__k_{c}" for c in partition_by]
            )
            salted = salted.withColumn(
                "__salt",
                F.pmod(
                    F.xxhash64(*[df[c] for c in df.columns]), F.col("__nf")
                ).cast("int"),
            ).drop("__nf")
            (
                salted.repartition(*partition_by, "__salt")
                .drop("__salt")
                .write.mode("overwrite")
                .option("maxRecordsPerFile", rows_per_file)
                .partitionBy(*partition_by)
                .parquet(tmp.toString())
            )
        else:
            # coalesce, not repartition: narrowing file count needs no shuffle
            df.coalesce(n_files).write.mode("overwrite").parquet(tmp.toString())
        old = jvm.org.apache.hadoop.fs.Path(self.path(layer, table) + "__compact_old")
        if not fs.rename(cur, old):
            raise IOError(f"compact: could not move {cur} aside")
        if not fs.rename(tmp, cur):
            # roll back so the table stays readable
            fs.rename(old, cur)
            raise IOError(f"compact: could not swap {tmp} into place")
        fs.delete(old, True)
        return {"files_before": files_before, "files_after": _count_files(cur)}


def create_table_from_schema(
    spark: SparkSession, db: str, table: str, schema, using: str = "parquet"
) -> None:
    """K5: CREATE TABLE IF NOT EXISTS from a declared StructType
    (src/load.py:60-105, src/extract.py:105-208) — catalog-managed DDL
    instead of hand-assembled SQL strings."""
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    spark.sql(f"CREATE TABLE IF NOT EXISTS {db}.{table} ({cols}) USING {using}")


def _resolve_table_location(spark: SparkSession, db: str, table: str) -> tuple[str, bool]:
    """(location, is_external): the table's ACTUAL storage location —
    the catalog entry when the table exists, else where this catalog
    would place a managed table of that name (the database's own
    location, which honors CREATE DATABASE ... LOCATION, + the table
    name). Never assumes the default ``<warehouse>/<db>.db/<table>``
    layout."""
    if spark.catalog.tableExists(f"{db}.{table}"):
        rows = {
            r.col_name: r.data_type
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {db}.{table}").collect()
        }
        if "Location" in rows:
            return rows["Location"], rows.get("Type", "").upper() == "EXTERNAL"
    return (
        f"{spark.catalog.getDatabase(db).locationUri.rstrip('/')}/{table}",
        False,
    )


def _drop_table_and_location(spark: SparkSession, db: str, table: str) -> None:
    """DROP TABLE IF EXISTS plus an orphaned-location sweep: with the
    default session-scoped (in-memory) catalog a managed table's files
    outlive its metadata, and a fresh session's ``saveAsTable`` then
    fails with LOCATION_ALREADY_EXISTS. The swept path is RESOLVED from
    the catalog (table entry, else the database's location), so a
    database created with a custom LOCATION sweeps the right directory.
    EXTERNAL tables lose only their metadata — the backing directory
    may be shared with other readers and is never deleted (matching
    DROP TABLE's own managed-vs-external contract). The DEFAULT
    managed location for the name is always swept regardless: it is
    where a subsequent saveAsTable/RENAME will land, and orphans can
    sit there even while the name currently binds an external table
    elsewhere. Scheme-agnostic via the Hadoop FS API."""
    loc_str, is_external = _resolve_table_location(spark, db, table)
    spark.sql(f"DROP TABLE IF EXISTS {db}.{table}")
    targets = {
        f"{spark.catalog.getDatabase(db).locationUri.rstrip('/')}/{table}"
    }
    if not is_external:
        targets.add(loc_str)
    sc = spark.sparkContext
    for t in targets:
        loc = sc._jvm.org.apache.hadoop.fs.Path(t)
        fs = loc.getFileSystem(sc._jsc.hadoopConfiguration())
        if fs.exists(loc):
            fs.delete(loc, True)


def write_bucketed(
    df: DataFrame, db: str, table: str, n_buckets: int, key: str
) -> None:
    """K6: the scalable analog of the reference's secondary FK indexes
    (src/load.py:107-122): bucket the table on the join key so later
    joins/aggregations on that key are exchange-free (bucket pruning +
    co-located join).

    Overwrite is staged, not in-place: the bucketed write lands in a
    ``__staging`` table first, and only on success is the existing
    table retired and staging promoted (ALTER TABLE RENAME, which for
    managed tables moves the directory with the metadata). A failed
    write therefore leaves the previous table fully intact — the old
    drop-then-write path lost both copies when ``saveAsTable`` failed
    midway. All swept locations are resolved from the catalog
    (:func:`_drop_table_and_location`), so databases with custom
    LOCATIONs are handled and a catalog restart (in-memory catalog,
    orphaned files) still overwrites cleanly."""
    spark = df.sparkSession
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    staging = f"{table}__staging"
    _drop_table_and_location(spark, db, staging)  # stale crashed-run staging
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(f"{db}.{staging}")
    )
    # staging write succeeded: promote it. A crash between these two
    # statements leaves the data at __staging — recoverable, never lost.
    _drop_table_and_location(spark, db, table)
    spark.sql(f"ALTER TABLE {db}.{staging} RENAME TO {db}.{table}")


def analyze_table(
    spark: SparkSession, db: str, table: str, columns: list[str] | None = None
) -> dict:
    """Collect table- and column-level statistics into the catalog
    (ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS ...]).

    The reference's databases do this implicitly (MySQL/PG auto-analyze
    feeds their planners); on Spark it is an explicit step, and at
    100 TB it is what turns join planning from file-length guessing
    into real cost-based decisions: accurate sizeInBytes/rowCount lets
    the optimizer pick broadcast sides after filters, and column NDVs
    drive join reordering under spark.sql.cbo.enabled. Run it after
    each load phase on managed tables (bucketed dims especially — a
    dim that *is* broadcast-sized should be known to be).

    Returns {"size_bytes": int, "row_count": int | None} parsed back
    from the catalog so callers (health checks, load-phase metrics)
    can log what the planner will actually see.
    """
    import re

    full = f"{db}.{table}"
    spark.sql(f"ANALYZE TABLE {full} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(f"`{c}`" for c in columns)
        spark.sql(f"ANALYZE TABLE {full} COMPUTE STATISTICS FOR COLUMNS {cols}")
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {full}").collect()
    stats_line = next(
        (r.data_type for r in rows if r.col_name == "Statistics"), ""
    )
    m = re.search(r"(\d+) bytes(?:, (\d+) rows)?", stats_line)
    return {
        "size_bytes": int(m.group(1)) if m else None,
        "row_count": int(m.group(2)) if m and m.group(2) else None,
    }


def health_check(spark: SparkSession, db: str) -> dict[str, int]:
    """M4: connectivity/health probe — SHOW TABLES + per-table counts
    (test.py:27-125 reimagined for the catalog)."""
    tables = [r.tableName for r in spark.sql(f"SHOW TABLES IN {db}").collect()]
    return {t: spark.table(f"{db}.{t}").count() for t in tables}


def read_evolved(spark: SparkSession, path: str):
    """Schema-evolution read: one DataFrame over parquet batches whose
    schemas drifted (columns added over time) — ``mergeSchema`` unions
    the per-file footers and null-fills missing columns, so old batches
    stay readable after the pipeline starts writing new fields.

    Merge cost is footer-only (no data scan) but still one footer per
    file; at 100 TB pin the expected schema with ``.schema(...)`` once
    known and keep mergeSchema for the discovery/backfill path only.
    """
    return spark.read.option("mergeSchema", True).parquet(path)
