"""End-to-end pipeline test over messy banking CSVs (FIXTURES.md
patterns): extract -> staging, transform -> typed, load -> production,
idempotent re-run, incremental second batch."""

from __future__ import annotations

import datetime

from python_etl_pipeline_spark.pipeline import Pipeline

BRANCHES = (
    "branch_id,branch_name,city,state,manager_name\n"
    'QT0001,"Viswanathan, Singh and Bhattacharyya Branch",pune,Maharashtra,amit kumar\n'
    "QT0002,North Branch,delhi,Delhi,priya s\n"
    "QT0003,Odd Branch,agra,Agra,NaN\n"
)

CUSTOMERS = (
    "customer_id,branch_id,first_name,last_name,dob,gender,email,phone,address,account_open_date\n"
    '1,QT0001,asha,rao,27-07-78,f,ASHA@X.COM,9999999999,"60/736, Swamy Nagar",2020-01-15\n'
    "2,QT0002,vik,nair,31-09-45,male,V@X.COM,8888888888,addr,2019-06-01\n"
    "3,QT0001,dup,first,2000-01-01,NaN,d@x.com,77,addr,2024-01-01\n"
    "3,QT0001,dup,last,2000-01-01,NaN,d@x.com,77,addr,2024-01-01\n"
    ",QT0001,nopk,row,2000-01-01,m,n@x.com,1,addr,2024-01-01\n"
)

LOANS = (
    "loan_id,customer_id,loan_type,loan_amount,interest_rate,start_date,end_date,loan_status\n"
    "10,1,home,\"₹600,000.00\",8.5,15-01-20,15-01-2040,Active\n"
    "11,2,car,50000,9,01-03-22,01-03-24,Closed\n"
    "12,3,personal,NaN,10,NaN,NaN,NaN\n"
)

TRANSACTIONS = (
    "transaction_id,customer_id,transaction_date,transaction_type,amount,balance_after,fraud_flag\n"
    "100,1,2024-01-05,deposit,\"₹15,000\",20000,no\n"
    "101,2,2024-01-06,withdrawal,500,19500,TRUE\n"
)


def _write_files(tmp_path):
    files = {}
    for name, content in [
        ("branches", BRANCHES), ("customers", CUSTOMERS),
        ("loans", LOANS), ("transactions", TRANSACTIONS),
    ]:
        p = tmp_path / f"{name}_1.csv"
        p.write_text(content)
        files[name] = [str(p)]
    return files


def test_full_pipeline(spark, tmp_path):
    (tmp_path / "in").mkdir(exist_ok=True)
    files = _write_files(tmp_path / "in")
    pipe = Pipeline(spark, str(tmp_path / "wh"))
    summary = pipe.run_full(files)

    # staging: all-string, PK-filtered (5 customer rows -> 4 after pk filter)
    staging_cust = pipe.wh.read("staging", "customers")
    assert staging_cust.count() == 3  # keep-last dedup of pk 3 + pk filter

    cust = {r["customer_id"]: r for r in pipe.wh.read("transformed", "customers").collect()}
    # 2-digit pivot: 27-07-78 -> 1978-07-27
    assert cust["1"]["dob"] == datetime.date(1978, 7, 27)
    assert cust["1"]["gender"] == "F"
    assert cust["1"]["email"] == "asha@x.com"
    assert cust["1"]["customer_segment"] in ("VIP", "Regular", "New")
    # impossible date 31-09-45 -> null dob, age 0
    assert cust["2"]["dob"] is None and cust["2"]["age"] == 0
    # keep-first dedup at transform
    assert cust["3"]["last_name"] == "Last" or cust["3"]["last_name"] == "First"

    loans = {r["loan_id"]: r for r in pipe.wh.read("transformed", "loans").collect()}
    assert float(loans["10"]["loan_amount"]) == 600000.0
    assert loans["10"]["risk_category"] == "High"
    assert loans["10"]["loan_duration_months"] == 240  # 2020-01 -> 2040-01
    assert loans["12"]["loan_amount"] is not None and float(loans["12"]["loan_amount"]) == 0.0
    assert loans["12"]["loan_duration_months"] == 0

    txns = {r["transaction_id"]: r for r in pipe.wh.read("transformed", "transactions").collect()}
    assert float(txns["100"]["amount"]) == 15000.0
    assert txns["100"]["transaction_category"] == "Large"
    assert txns["100"]["fraud_flag"] is False
    assert txns["101"]["fraud_flag"] is True
    assert txns["100"]["transaction_type"] == "DEPOSIT"

    branches = {r["branch_id"]: r for r in pipe.wh.read("transformed", "branches").collect()}
    assert branches["QT0001"]["region"] == "West"   # MAHARASHTRA
    assert branches["QT0002"]["region"] == "North"  # DELHI
    assert branches["QT0003"]["region"] == "NA"     # city-in-state-column
    assert branches["QT0003"]["manager_name"] == "Na"  # sentinel -> NA -> title

    assert summary["status"] == "SUCCESS"
    assert summary["total_loaded"] == summary["total_transformed"]

    # the ingest log records each file's REAL raw record count (the
    # reference tracker's rows-per-file, extract.py:246-270): summing
    # the log must give the CSV data-row total, not 0 (the r6-verdict
    # defect: a real run used to log record_count=0 for every file)
    raw_rows = 3 + 5 + 3 + 2  # branches + customers + loans + transactions
    log1 = pipe.ingest_log.summary().first()
    assert log1["n_files"] == 4
    assert log1["sum_records"] == raw_rows

    # idempotent re-run: same files skipped, counts unchanged
    summary2 = pipe.run_full(files)
    assert pipe.wh.read("production", "customers").count() == 3
    assert summary2["status"] == "SUCCESS"
    log2 = pipe.ingest_log.summary().first()
    assert (log2["n_files"], log2["sum_records"]) == (4, raw_rows)

    # incremental batch: one new customer appended, existing not duplicated
    p2 = tmp_path / "in" / "customers_2.csv"
    p2.write_text(
        "customer_id,branch_id,first_name,last_name,dob,gender,email,phone,address,account_open_date\n"
        "4,QT0002,new,person,1990-05-05,F,p@x.com,123,addr,2023-03-03\n"
    )
    pipe.run_full({"customers": [str(files["customers"][0]), str(p2)]})
    assert pipe.wh.read("production", "customers").count() == 4
    # only the new file's (real) count is appended to the log
    log3 = pipe.ingest_log.summary().first()
    assert (log3["n_files"], log3["sum_records"]) == (5, raw_rows + 1)


CUST_HEADER = "customer_id,branch_id,first_name,last_name,dob,gender,email,phone,address,account_open_date\n"


def test_format_report_mirrors_reference_summary(spark, tmp_path):
    """M3 fidelity: the human-readable run report carries what the
    reference's log_pipeline_summary + per-phase formatters print —
    per-table lines per phase, phase totals, per-table sync status, an
    end-to-end status line, and per-phase durations."""
    (tmp_path / "in").mkdir(exist_ok=True)
    files = _write_files(tmp_path / "in")
    pipe = Pipeline(spark, str(tmp_path / "wh"))
    summary = pipe.run_full(files)
    report = pipe.metrics.format_report(summary["phase_seconds"])
    text = "\n".join(report)
    for section in (
        "COMPLETE PIPELINE SUMMARY",
        "EXTRACTION PHASE:",
        "TRANSFORMATION PHASE:",
        "LOADING PHASE:",
        "SYNC STATUS:",
        "END-TO-END:",
        "DURATION:",
    ):
        assert section in text, section
    for t in ("branches", "customers", "loans", "transactions"):
        assert f"  {t}:" in text
    assert "TOTAL EXTRACTED:" in text and "TOTAL LOADED:" in text
    assert "OK synchronized" in text and "OUT OF SYNC" not in text
    assert f"END-TO-END: {summary['status']}" in text
    # first FULL load must be labeled full — the mode label reads the
    # recorded branch, not the mere presence of a reconciliation entry
    # (which both branches populate)
    assert "(full)" in text and "(incremental)" not in text
    # a re-run with a NEW file goes incremental (an identical re-run
    # would hash-skip transform/load entirely — tested separately)
    p2 = tmp_path / "in" / "customers_9.csv"
    p2.write_text(
        CUST_HEADER
        + "9,QT0002,ninth,person,1991-06-06,F,n@x.com,123,addr,2023-04-04\n"
    )
    files2 = dict(files)
    files2["customers"] = list(files["customers"]) + [str(p2)]
    summary2 = pipe.run_full(files2)
    assert summary2["no_new_files"] is False
    text2 = "\n".join(pipe.metrics.format_report(summary2["phase_seconds"]))
    assert "(incremental)" in text2 and "(full)" not in text2


def test_no_new_files_run_skips_transform_and_load(spark, tmp_path):
    """The reference's hash-skip (extract.py:494-496) as a phase
    short-circuit: a re-run whose every file is already in the ingest
    log skips transform/load — but ONLY when the previous run
    completed; a missing/stale success marker (crash between extract
    and load) forces the full phase sequence."""
    (tmp_path / "in").mkdir(exist_ok=True)
    files = _write_files(tmp_path / "in")
    pipe = Pipeline(spark, str(tmp_path / "wh"))
    s1 = pipe.run_full(files)
    assert s1["no_new_files"] is False and "load" in s1["phase_seconds"]
    n_prod = pipe.wh.read("production", "customers").count()

    # identical re-run: nothing new + marker current -> phases skipped
    s2 = pipe.run_full(files)
    assert s2["no_new_files"] is True
    assert "transform" not in s2["phase_seconds"]
    assert s2["status"] == "SUCCESS"
    assert pipe.wh.read("production", "customers").count() == n_prod

    # crash simulation: marker behind the log (as if a run died after
    # extract logged files but before load finished) -> full run
    (tmp_path / "wh" / "_run_marker").write_text("0")
    s3 = pipe.run_full(files)
    assert s3["no_new_files"] is False and "load" in s3["phase_seconds"]
    assert pipe.wh.read("production", "customers").count() == n_prod


def test_qualified_uri_matches_input_file_name(spark, tmp_path):
    """The file-rank map and per-file record counts both key on
    input_file_name() equality; Hadoop Path.toString() (file:/a b) vs
    the URL-encoded URI (file:///a%20b) silently matches nothing, so
    pin the exact round-trip — including a path that needs encoding."""
    from pyspark.sql import functions as F

    from python_etl_pipeline_spark.sources.warehouse import Warehouse

    p = tmp_path / "has space" / "t.csv"
    p.parent.mkdir()
    p.write_text("a,b\n1,2\n")
    wh = Warehouse(spark, str(tmp_path / "wh"))
    got = spark.read.csv(str(p), header=True).select(F.input_file_name()).first()[0]
    assert wh.qualified_uri(str(p)) == got


def test_cross_file_later_wins(spark, tmp_path):
    """O2 across files: the same PK in two files of one batch resolves to
    the LATER file in the batch list — by explicit file rank, not Spark's
    file-enumeration order (reference extract.py:389). The batch list
    deliberately orders the alphabetically-later name first."""
    pz = tmp_path / "z_first.csv"
    pa = tmp_path / "a_second.csv"
    pz.write_text(CUST_HEADER + "7,QT0001,from,zfile,2000-01-01,m,z@x.com,1,addr,2020-01-01\n")
    pa.write_text(CUST_HEADER + "7,QT0001,from,afile,2000-01-01,m,a@x.com,1,addr,2020-01-01\n")
    pipe = Pipeline(spark, str(tmp_path / "wh"))
    pipe.run_extract({"customers": [str(pz), str(pa)]})
    rows = pipe.wh.read("staging", "customers").collect()
    assert len(rows) == 1
    assert rows[0]["last_name"] == "afile"  # later list position wins


def test_upsert_version_tie_incoming_wins(spark):
    """Equal version values must resolve to the incoming row (ON
    DUPLICATE KEY UPDATE overwrites unconditionally)."""
    from python_etl_pipeline_spark.plans import upsert_last_writer_wins

    existing = spark.createDataFrame([(1, "old", 5)], "pk int, val string, v int")
    incoming = spark.createDataFrame([(1, "new", 5)], "pk int, val string, v int")
    out = upsert_last_writer_wins(existing, incoming, "pk", "v").collect()
    assert len(out) == 1 and out[0]["val"] == "new"
    assert "__src" not in upsert_last_writer_wins(existing, incoming, "pk", "v").columns


def test_corrupt_staging_fails_loudly(spark, tmp_path):
    """A corrupt staged table must raise, not be silently treated as
    'first run' (which would discard previously staged rows)."""
    import pytest

    corrupt = tmp_path / "wh" / "staging" / "customers"
    corrupt.mkdir(parents=True)
    (corrupt / "part-00000.parquet").write_bytes(b"not a parquet file")
    pipe = Pipeline(spark, str(tmp_path / "wh"))
    with pytest.raises(Exception):
        pipe._transform_entity("customers")
