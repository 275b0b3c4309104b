"""Pipeline orchestration — the reference's extract → transform → load
flow (SURVEY.md §3, §2.12) over the three-layer parquet warehouse.

Every stage is a pure ``DataFrame -> DataFrame`` function; the runner
wires them to the warehouse, records DataQualityMetrics-style row
accounting (main.py:43-144), and reconciles counts (load.py:317-360).
Fail-fast per phase like the reference's run_full_pipeline
(main.py:279-308).

Scale design: no driver-side row loops anywhere — the only driver
values are per-phase row counts (one scalar action per table); merges
are keyed shuffles; the production sink partitions the fact table by
date for partition pruning (the analog of the reference's secondary
indexes, K6).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import (
    safe_val,
    safe_num,
    safe_date,
    calc_age,
    tenure_days,
    duration_months,
    customer_segment,
    risk_category,
    transaction_category,
    gender_norm,
    fraud_flag,
    region_map,
)
from .operators import (
    validate_and_project,
    pk_filter,
    normalize_nulls,
    dedup_keep_first,
    dedup_keep_last,
)
from .plans import upsert_last_writer_wins, incremental_append_antijoin, reconcile_counts
from .schemas import STAGING_COLUMNS, PRIMARY_KEYS, LOAD_ORDER
from .sources import IngestLog, Warehouse, read_csv_all_string


# ---------------------------------------------------------------------------
# Per-entity transform chains (src/transform.py:229-491, vectorized)
# ---------------------------------------------------------------------------

def _passthrough(df: DataFrame) -> list:
    """Layout passthrough for the per-entity transforms: staging's
    __pk_bucket partition column (r16 incremental re-transform) must
    ride through the row-wise select UNCHANGED — recomputing it from
    the cleaned PK could re-bucket a row, and overwrite_partitions
    would then replace its new bucket without the untouched rows that
    live there. Empty for non-bucketed inputs, so direct callers see
    the original schema."""
    return [F.col("__pk_bucket")] if "__pk_bucket" in df.columns else []


def transform_branches(df: DataFrame) -> DataFrame:
    state = safe_val(F.col("state"), upper=True)
    return df.select(
        safe_val(F.col("branch_id")).alias("branch_id"),
        safe_val(F.col("branch_name"), title=True).alias("branch_name"),
        safe_val(F.col("city"), title=True).alias("city"),
        state.alias("state"),
        safe_val(F.col("manager_name"), title=True).alias("manager_name"),
        region_map(state).alias("region"),
        *_passthrough(df),
    )


def transform_customers(df: DataFrame) -> DataFrame:
    dob = safe_date(F.col("dob"))
    aod = safe_date(F.col("account_open_date"))
    tenure = tenure_days(aod)
    return df.select(
        safe_val(F.col("customer_id")).alias("customer_id"),
        safe_val(F.col("branch_id"), upper=True).alias("branch_id"),
        safe_val(F.col("first_name"), title=True).alias("first_name"),
        safe_val(F.col("last_name"), title=True).alias("last_name"),
        dob.alias("dob"),
        calc_age(dob).alias("age"),
        gender_norm(F.col("gender")).alias("gender"),
        safe_val(F.col("email"), lower=True).alias("email"),
        safe_val(F.col("phone")).alias("phone"),
        safe_val(F.col("address"), title=True).alias("address"),
        aod.alias("account_open_date"),
        tenure.alias("customer_tenure_days"),
        customer_segment(tenure).alias("customer_segment"),
        *_passthrough(df),
    )


def transform_loans(df: DataFrame) -> DataFrame:
    start = safe_date(F.col("start_date"))
    # end dates legitimately exceed the current year: lift the guard
    end = safe_date(F.col("end_date"), max_year=F.lit(9999))
    amount = safe_num(F.col("loan_amount"))
    return df.select(
        safe_val(F.col("loan_id")).alias("loan_id"),
        safe_val(F.col("customer_id")).alias("customer_id"),
        safe_val(F.col("loan_type"), title=True).alias("loan_type"),
        amount.alias("loan_amount"),
        safe_num(F.col("interest_rate")).cast("decimal(5,2)").alias("interest_rate"),
        start.alias("start_date"),
        end.alias("end_date"),
        safe_val(F.col("loan_status"), title=True).alias("loan_status"),
        duration_months(start, end).alias("loan_duration_months"),
        risk_category(amount).alias("risk_category"),
        *_passthrough(df),
    )


def transform_transactions(df: DataFrame) -> DataFrame:
    amount = safe_num(F.col("amount"))
    return df.select(
        safe_val(F.col("transaction_id")).alias("transaction_id"),
        safe_val(F.col("customer_id")).alias("customer_id"),
        safe_date(F.col("transaction_date")).cast("timestamp").alias("transaction_date"),
        safe_val(F.col("transaction_type"), upper=True).alias("transaction_type"),
        amount.alias("amount"),
        safe_num(F.col("balance_after")).alias("balance_after"),
        fraud_flag(F.col("fraud_flag")).alias("fraud_flag"),
        transaction_category(amount).alias("transaction_category"),
        *_passthrough(df),
    )


ENTITY_TRANSFORMS = {
    "branches": transform_branches,
    "customers": transform_customers,
    "loans": transform_loans,
    "transactions": transform_transactions,
}


# ---------------------------------------------------------------------------
# Metrics (DataQualityMetrics, main.py:43-144)
# ---------------------------------------------------------------------------

@dataclass
class PipelineMetrics:
    extracted: dict[str, int] = field(default_factory=dict)
    transformed: dict[str, int] = field(default_factory=dict)
    loaded: dict[str, int] = field(default_factory=dict)
    reconciliation: dict[str, dict] = field(default_factory=dict)

    def summary(self) -> dict:
        te, tt, tl = (sum(d.values()) for d in (self.extracted, self.transformed, self.loaded))
        accuracy = (tt / te * 100.0) if te else 100.0
        synced = all(r["synced"] for r in self.reconciliation.values()) if self.reconciliation else True
        return {
            "total_extracted": te,
            "total_transformed": tt,
            "total_loaded": tl,
            "end_to_end_accuracy_pct": round(accuracy, 2),
            "status": "SUCCESS" if synced and accuracy >= 100.0 else "PARTIAL",
        }

    def format_report(self, phase_seconds: dict[str, float] | None = None) -> list[str]:
        """The reference's human-readable run report (M3,
        src/logger.py:169-251 log_pipeline_summary + the per-phase stat
        formatters at :74/:94/:123/:147), re-expressed over this
        engine's metrics: per-table lines per phase, phase totals,
        end-to-end success rate, per-table sync status from the count
        reconciliation, and per-phase wall seconds. Returned as lines
        so callers choose the sink (logger, stdout, a file)."""
        bar = "=" * 70
        lines = [bar, "COMPLETE PIPELINE SUMMARY", bar, "", "EXTRACTION PHASE:"]
        for t, n in sorted(self.extracted.items()):
            lines.append(f"  {t}: {n:,} records staged")
        lines.append(f"  TOTAL EXTRACTED: {sum(self.extracted.values()):,} records")
        lines += ["", "TRANSFORMATION PHASE:"]
        for t, n in sorted(self.transformed.items()):
            staged = self.extracted.get(t, 0)
            dropped = max(staged - n, 0)
            lines.append(
                f"  {t}: {n:,} transformed ({dropped:,} deduplicated/dropped)"
            )
        lines.append(
            f"  TOTAL TRANSFORMED: {sum(self.transformed.values()):,} records"
        )
        lines += ["", "LOADING PHASE:"]
        for t, n in sorted(self.loaded.items()):
            mode = (
                "incremental"
                if self.reconciliation.get(t, {}).get("incremental")
                else "full"
            )
            lines.append(f"  {t}: {n:,} records loaded ({mode})")
        lines.append(f"  TOTAL LOADED: {sum(self.loaded.values()):,} records")
        if self.reconciliation:
            lines += ["", "SYNC STATUS:"]
            for t, r in sorted(self.reconciliation.items()):
                mark = "OK synchronized" if r["synced"] else (
                    f"OUT OF SYNC (diff {r['difference']:+,})"
                )
                lines.append(
                    f"  {t}: source {r['source_count']:,} vs target "
                    f"{r['target_count']:,} — {mark}"
                )
        s = self.summary()
        lines += [
            "",
            f"END-TO-END: {s['status']} — "
            f"{s['total_loaded']:,} loaded / {s['total_extracted']:,} extracted "
            f"({s['end_to_end_accuracy_pct']:.1f}% of extracted rows survived "
            f"cleansing+dedup)",
        ]
        if phase_seconds:
            total = sum(phase_seconds.values())
            per = ", ".join(f"{p} {v:.1f}s" for p, v in phase_seconds.items())
            lines.append(f"DURATION: {total:.1f}s ({per})")
        lines.append(bar)
        return lines


# ---------------------------------------------------------------------------
# Phases
# ---------------------------------------------------------------------------

# Staging/transformed PK-range bucket width (r16, guide §6 / r15 verdict
# #3): the incremental regime's cost was O(accumulated snapshot) PER
# BATCH — the staging upsert re-read and re-wrote the whole snapshot and
# the transform re-derived all of it (measured: per-batch wall grew
# 5.8 -> 11.6 s over six 107k-row batches, extract +0.15 s/batch,
# transform +0.4 s/batch — a quadratic total in ingested volume).
# Bucketing both layers by a coarse PK RANGE localizes monotone-id
# arrivals (the normal ingest regime: new entities get new ids) to a
# handful of partitions, so the merge and re-transform touch O(batch)
# bytes via Warehouse.overwrite_partitions while untouched partitions
# stay on disk byte-for-byte. Non-numeric and dirty PKs land in bucket
# -1 (deterministic); a uniformly-scattered update batch degrades to
# touching every bucket — the old full-rewrite cost, never worse.
_PK_BUCKET_WIDTH = 1_000_000


def _pk_bucket(pk: str):
    return F.coalesce(
        F.floor(
            F.expr(f"try_cast({pk} AS BIGINT)") / _PK_BUCKET_WIDTH
        ),
        F.lit(-1),
    ).cast("bigint")


class Pipeline:
    """Extract → transform → load over a layered warehouse."""

    def __init__(self, spark: SparkSession, warehouse_root: str):
        self.spark = spark
        self.wh = Warehouse(spark, warehouse_root)
        self.ingest_log = IngestLog(spark, f"{warehouse_root}/_ingest_log")
        self.metrics = PipelineMetrics()
        # path -> raw record count for the batch in flight (filled by
        # _extract_entity Observations, consumed by the log append)
        self._file_record_counts: dict[str, int] = {}
        self._n_new_files: int | None = None
        # entity -> PK buckets touched by the batch in flight (filled by
        # _extract_entity, consumed by _transform_entity to re-transform
        # only the staging partitions this batch changed). None = no
        # bucket knowledge — transform falls back to the full pass.
        self._touched_buckets: dict[str, list[int] | None] = {}

    # -- extract: CSV files -> all-string staging layer ----------------------
    def run_extract(self, files_per_entity: dict[str, list[str]]) -> None:
        """Entities are independent DAGs, so their (small) Spark jobs run
        concurrently from a driver-side thread pool — overlapping job
        scheduling/IO latency; the cluster's task scheduler interleaves
        the stages. Results land in per-entity dict slots (thread-safe).

        The ingest log is consulted ONCE for the whole batch (one
        anti-join job over every entity's candidate files, executor-side
        md5s) and appended ONCE after all entities land — not per entity.
        Per-entity log jobs were pure scheduling overhead (5 anti-joins +
        5 appends for one batch), and the batched append reuses the
        hashes the anti-join already computed, so no file is read twice
        for hashing. Failure semantics: if any entity fails, NOTHING is
        logged, and the next run re-ingests the whole batch — safe, the
        staging write is an idempotent overwrite.

        Each log row carries the file's REAL raw record count (the
        reference tracker stores rows-per-file, extract.py:246-270, and
        its summary sums them, extract.py:573-580): per-file counts are
        folded into each entity's staging-write job as Observation
        metrics over the raw frame — one count expression per batch
        file, zero extra scans (an earlier version logged 0 for every
        file, so IngestLog.summary() reported an empty warehouse after
        a real run)."""
        from concurrent.futures import ThreadPoolExecutor

        all_paths = [p for ps in files_per_entity.values() for p in ps]
        new_rows = (
            self.ingest_log.new_files_df(all_paths).collect() if all_paths else []
        )
        new_set = {r["path"] for r in new_rows}
        self._n_new_files = len(new_set)  # run_full's hash-skip signal
        hashes = {r["path"]: r["file_hash"] for r in new_rows}

        self._file_record_counts: dict[str, int] = {}
        items = [
            (entity, [p for p in paths if p in new_set])
            for entity, paths in files_per_entity.items()
        ]
        with ThreadPoolExecutor(max_workers=min(8, max(1, len(items)))) as ex:
            list(ex.map(lambda kv: self._extract_entity(*kv), items))
        self.ingest_log.mark_processed_batch(
            [(p, self._file_record_counts.get(p, 0)) for p in sorted(new_set)],
            hashes=hashes,
        )

    def _extract_entity(self, entity: str, new_paths: list[str]) -> None:
        pk = PRIMARY_KEYS[entity]
        if not new_paths:
            self.metrics.extracted[entity] = 0
            return
        raw = read_csv_all_string(self.spark, new_paths, STAGING_COLUMNS[entity])
        # Per-file raw record counts, observed at the point in the plan
        # BEFORE any filter/dedup drops rows — every raw row flows
        # through this observe during the staging write, so the counts
        # cost no extra scan. One count expression per batch file:
        # bounded by the batch's file list, never the row count.
        from pyspark.sql import Observation

        file_obs = Observation()
        raw = raw.observe(
            file_obs,
            *[
                F.count(
                    F.when(
                        F.input_file_name() == self.wh.qualified_uri(p), 1
                    )
                ).alias(f"f{i}")
                for i, p in enumerate(new_paths)
            ],
        )
        df = validate_and_project(raw, STAGING_COLUMNS[entity])
        df = normalize_nulls(df)
        df = pk_filter(df, pk)
        # keep-last across files must mean "the later file in the batch
        # wins" (O2, reference extract.py:389) — an EXPLICIT file sequence,
        # not monotonically_increasing_id enumeration order, which Spark
        # does not guarantee to follow the file list. Rank each row by its
        # source file's position in the batch; a monotonic id only breaks
        # ties WITHIN one file (where it does follow physical row order
        # per split).
        seq_map = F.create_map(
            *[
                F.lit(x)
                for i, p in enumerate(new_paths)
                for x in (self.wh.qualified_uri(p), i)
            ]
        )
        df = df.withColumn(
            "_ingest_seq",
            F.coalesce(seq_map[F.input_file_name()], F.lit(-1)).cast("long"),
        ).withColumn("_ingest_sub", F.monotonically_increasing_id())
        df = dedup_keep_last(df, pk, ["_ingest_seq", "_ingest_sub"]).drop("_ingest_sub")
        # PK-range bucket partitioning (r16): touched-bucket discovery
        # is metadata-sized output (bounded by key-range/width, a
        # handful for monotone-id arrivals) but requires an action over
        # the batch — so it runs ONLY on incremental runs, off a pinned
        # batch frame that the merge then reuses (one materialization
        # serves both; the first-load path pays no extra action at all:
        # an early version collected buckets unconditionally off the
        # lazy lineage and re-ran the whole CSV-parse/dedup chain,
        # measured +15 s of extract at the 100x one-shot).
        touched: list[int] | None = None
        partitioned_staging = True
        if self.wh.exists("staging", entity):
            df = df.localCheckpoint(eager=True)
            existing = self.wh.read("staging", entity)
            partitioned_staging = "__pk_bucket" in existing.columns
            if partitioned_staging:
                touched = [
                    r["b"]
                    for r in df.select(
                        _pk_bucket(pk).alias("b")
                    ).distinct().collect()
                ]
                # merge touches ONLY the batch's buckets: partition
                # pruning keeps untouched snapshot bytes off this plan
                existing = existing.filter(
                    F.col("__pk_bucket").isin(touched)
                ).drop("__pk_bucket")
            existing = existing.withColumn(
                "_ingest_seq", F.lit(-1).cast("long")
            )
            # break lineage before overwriting the directory being read
            merged = upsert_last_writer_wins(
                existing, df, pk, "_ingest_seq"
            ).localCheckpoint(eager=True)
        else:
            merged = df
        out = merged.drop("_ingest_seq")
        # fold the row-count metric into the write job (Observation):
        # the count is computed by the tasks that write, not a second job
        from pyspark.sql import Observation

        obs = Observation()
        out = out.observe(obs, F.count(F.lit(1)).alias("n"))
        staging_exists = self.wh.exists("staging", entity)
        if staging_exists and partitioned_staging:
            # replace only the touched partitions; the rest of the
            # snapshot is not read, shuffled, or rewritten
            out = out.withColumn("__pk_bucket", _pk_bucket(pk))
            self.wh.overwrite_partitions(
                out, "staging", entity, ["__pk_bucket"]
            )
            obs.get  # force the Observation so the write job has run
            # extracted = the full snapshot row count, as before (the
            # merge only saw the touched buckets, so its Observation
            # under-counts): one count over the final table — parquet
            # footer metadata only, no data scan.
            self.metrics.extracted[entity] = self.wh.read(
                "staging", entity
            ).count()
        elif staging_exists:
            # legacy unpartitioned staging: one full-merge rewrite
            # upgrades it to the bucketed layout
            out = out.withColumn("__pk_bucket", _pk_bucket(pk))
            self.wh.overwrite(
                out, "staging", entity, partition_by=["__pk_bucket"]
            )
            self.metrics.extracted[entity] = obs.get["n"]
        else:
            # FIRST LOAD: the pre-r16 unpartitioned write, byte-for-
            # byte — a fresh-warehouse one-shot run (the bench's e2e
            # slot, and any batch pipeline run once) must not pay the
            # dynamic-partition writer's per-task sort (+11% measured
            # on the 1x e2e median). The first INCREMENTAL run pays
            # one upgrade rewrite instead, after which merges touch
            # only their buckets.
            self.wh.overwrite(out, "staging", entity)
            self.metrics.extracted[entity] = obs.get["n"]
        self._touched_buckets[entity] = touched
        # entities write DISJOINT path keys, so concurrent updates from
        # the extract thread pool never collide
        fc = file_obs.get
        self._file_record_counts.update(
            {p: fc[f"f{i}"] for i, p in enumerate(new_paths)}
        )

    # -- transform: staging -> typed/enriched layer ---------------------------
    def run_transform(self, entities: list[str] | None = None) -> None:
        """Per-entity transforms write distinct directories — independent
        jobs, run concurrently (load stays serial: FK order matters)."""
        from concurrent.futures import ThreadPoolExecutor

        ents = entities or LOAD_ORDER
        with ThreadPoolExecutor(max_workers=min(8, len(ents))) as ex:
            list(ex.map(self._transform_entity, ents))

    def _transform_entity(self, entity: str) -> None:
        pk = PRIMARY_KEYS[entity]
        if not self.wh.exists("staging", entity):
            return  # nothing staged for this entity; read errors propagate
        staged = self.wh.read("staging", entity)
        # Incremental re-transform (r16): the transforms are pure
        # per-row functions and staging is one-row-per-PK, so rows in
        # buckets this batch did not touch transform to byte-identical
        # output — re-derive ONLY the touched staging partitions and
        # swap them into a bucket-partitioned transformed layer.
        # Requires (a) bucket knowledge from this run's extract phase,
        # (b) bucketed staging, and (c) an existing bucketed
        # transformed table to merge into; anything else falls back to
        # the full pass (first load, legacy layouts, standalone
        # run_transform).
        touched = self._touched_buckets.get(entity)
        incremental = (
            touched is not None
            and "__pk_bucket" in staged.columns
            and self.wh.exists("transformed", entity)
            and "__pk_bucket"
            in self.wh.read("transformed", entity).columns
        )
        if incremental:
            staged = staged.filter(F.col("__pk_bucket").isin(touched))
        staged = staged.withColumn("_seq", F.monotonically_increasing_id())
        deduped = dedup_keep_first(staged, pk, "_seq").drop("_seq")
        typed = ENTITY_TRANSFORMS[entity](deduped)
        from pyspark.sql import Observation

        obs = Observation()
        typed = typed.observe(obs, F.count(F.lit(1)).alias("n"))
        if incremental:
            self.wh.overwrite_partitions(
                typed, "transformed", entity, ["__pk_bucket"]
            )
            obs.get  # force the write before the footer-only count
            self.metrics.transformed[entity] = self.wh.read(
                "transformed", entity
            ).count()
        elif "__pk_bucket" in typed.columns:
            # bucketed staging (post-upgrade) but no incremental scope
            # yet: full pass, written bucketed so the NEXT batch can
            # re-transform incrementally
            self.wh.overwrite(
                typed, "transformed", entity, partition_by=["__pk_bucket"]
            )
            self.metrics.transformed[entity] = obs.get["n"]
        else:
            # first load / legacy layout: the pre-r16 write, unchanged
            self.wh.overwrite(typed, "transformed", entity)
            self.metrics.transformed[entity] = obs.get["n"]

    # -- load: incremental append into production ----------------------------
    def run_load(self, entities: list[str] | None = None) -> None:
        for entity in entities or LOAD_ORDER:  # FK-safe order (load.py:305)
            pk = PRIMARY_KEYS[entity]
            if not self.wh.exists("transformed", entity):
                continue  # entity had no input this run; read errors propagate
            # the bucket is a staging/transformed layout detail — it
            # must never reach the production schema
            src = self.wh.read("transformed", entity).drop("__pk_bucket")
            incremental = self.wh.exists("production", entity)
            if incremental:
                target = self.wh.read("production", entity)
                # materialize the delta before appending into the scanned dir
                delta = incremental_append_antijoin(src, target, pk).localCheckpoint(eager=True)
            else:
                delta = src
            # partition the fact table by YEAR: coarse enough to avoid a
            # tiny-file explosion (day-granularity created ~23k dirs for
            # 107k rows and dominated wall time), fine enough for pruning;
            # repartition on the key first so each partition writes 1 file.
            part = ["transaction_year"] if entity == "transactions" else None
            if part:
                delta = delta.withColumn(
                    "transaction_year", F.year("transaction_date")
                ).repartition("transaction_year")
            if not incremental:
                # first load: delta IS src, and production after the append
                # holds exactly these rows — one Observation folded into the
                # write yields loaded, source, and target counts with no
                # extra job. (The incremental branch keeps explicit counts:
                # an observe node on src/target would sit inside the
                # anti-join and block column pruning of the key-only side.)
                from pyspark.sql import Observation

                obs = Observation()
                delta = delta.observe(obs, F.count(F.lit(1)).alias("n"))
                self.wh.append(delta, "production", entity, partition_by=part)
                prod_count = src_count = int(obs.get["n"])
            else:
                self.wh.append(delta, "production", entity, partition_by=part)
                # one read-back count serves both the loaded metric and the
                # reconciliation target side (was two scans of production)
                prod_count = self.wh.read("production", entity).count()
                src_count = src.count()
            self.metrics.loaded[entity] = prod_count
            self.metrics.reconciliation[entity] = {
                "source_count": src_count,
                "target_count": prod_count,
                "synced": src_count == prod_count,
                "difference": src_count - prod_count,
                # the ACTUAL branch taken, so the run report's
                # "(incremental)"/"(full)" label reflects what happened
                # rather than inferring it from the dict's presence
                # (which both branches populate)
                "incremental": incremental,
            }

    def _marker_fs_path(self):
        sc = self.spark.sparkContext
        path = sc._jvm.org.apache.hadoop.fs.Path(f"{self.wh.root}/_run_marker")
        return path.getFileSystem(sc._jsc.hadoopConfiguration()), path

    def _write_success_marker(self) -> None:
        """Record that a run COMPLETED (extract through load) at the
        current ingest-log size. Driver-side metadata IO via the Hadoop
        FS API (scheme-agnostic, object-store-safe) — NOT a Spark
        write: a 1-row ``createDataFrame(...).write.parquet`` was
        measured at 3.6 s per run (it drags a Python-worker exchange
        into the job), which doubled the 107k-row pipeline's wall. The
        FS write is ~ms; only the ingest-log summary (one tiny agg
        job) remains."""
        n = int(self.ingest_log.summary().first()["n_files"] or 0)
        fs, path = self._marker_fs_path()
        out = fs.create(path, True)
        try:
            out.write(str(n).encode("ascii"))
        finally:
            out.close()

    def _marker_current(self) -> bool:
        """True iff the last COMPLETED run saw exactly today's ingest
        log — i.e. nothing was ingested since, and no run crashed
        between extract and load (a crash leaves the marker behind the
        log, or absent)."""
        sc = self.spark.sparkContext
        try:
            fs, path = self._marker_fs_path()
            if not fs.exists(path):
                return False
            stream = fs.open(path)
            try:
                text = sc._jvm.org.apache.commons.io.IOUtils.toString(
                    stream, "UTF-8"
                )
            finally:
                stream.close()
            marker_n = int(text.strip())
        except Exception:
            return False  # unreadable/garbled marker -> run everything
        s = self.ingest_log.summary().first()
        return marker_n == int(s["n_files"] or 0)

    def run_full(self, files_per_entity: dict[str, list[str]]) -> dict:
        """Fail-fast phase runner with per-phase timing logs (M1/M3:
        main.py:279-308, src/logger.py).

        No-new-files short-circuit (the reference's hash-skip,
        extract.py:494-496 — a scheduled window where every file is
        already in the tracker logs 'skipped' and ends): when extract
        ingests ZERO new files AND the success marker shows the last
        run completed at the current ingest-log state, transform and
        load are skipped — they would recompute byte-identical tables
        from unchanged staging. Recovery-safe: the marker is written
        only after a successful load, so a run that crashed between
        extract and load leaves marker != log and the next invocation
        runs every phase. Measured at 10x volume (1.07M rows): the
        skip path is ~1 s vs ~8.8 s for the full recompute
        (SCALE.md)."""
        import logging
        import time

        log = logging.getLogger("spark_etl_engine.pipeline")
        timings: dict[str, float] = {}
        t0 = time.time()
        self.run_extract(files_per_entity)
        timings["extract"] = round(time.time() - t0, 3)
        log.info("phase extract done in %.1fs", timings["extract"])
        if self._n_new_files == 0 and self._marker_current():
            summary = self.metrics.summary()
            summary["phase_seconds"] = timings
            summary["no_new_files"] = True
            log.info(
                "no new files and previous run completed — transform/load "
                "skipped (hash-skip): %s", summary,
            )
            return summary
        for phase, fn in [("transform", self.run_transform), ("load", self.run_load)]:
            t0 = time.time()
            fn()
            timings[phase] = round(time.time() - t0, 3)
            log.info("phase %s done in %.1fs", phase, timings[phase])
        self._write_success_marker()
        summary = self.metrics.summary()
        summary["phase_seconds"] = timings
        summary["no_new_files"] = False
        for line in self.metrics.format_report(timings):
            log.info("%s", line)
        log.info("pipeline %s: %s", summary["status"], summary)
        return summary
