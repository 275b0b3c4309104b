"""CLI entry points (reference §3 parity): full / per-phase / health /
bounded schedule, driven through the real arg parser."""

from __future__ import annotations

from python_etl_pipeline_spark.cli import build_parser, discover_files, run

CUSTOMERS = (
    "customer_id,branch_id,first_name,last_name,dob,gender,email,phone,address,account_open_date\n"
    "1,QT0001,a,b,1990-01-01,F,a@x.com,1,addr,2020-01-01\n"
    "2,QT0001,c,d,1991-02-02,M,c@x.com,2,addr,2021-01-01\n"
)


def _setup(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    (d / "customers_1.csv").write_text(CUSTOMERS)
    (d / "branches_1.csv").write_text(
        "branch_id,branch_name,city,state,manager_name\nQT0001,B,Pune,Maharashtra,M\n"
    )
    return d


def test_discover_files(tmp_path):
    d = _setup(tmp_path)
    files = discover_files(str(d))
    assert set(files) == {"branches", "customers"}


def test_cli_full_then_health_then_phases(spark, tmp_path):
    d = _setup(tmp_path)
    wh = str(tmp_path / "wh")
    parser = build_parser()

    args = parser.parse_args(["--mode", "full", "--data-dir", str(d), "--warehouse", wh])
    summary = run(args, spark=spark)
    assert summary["status"] == "SUCCESS"
    assert summary["total_loaded"] == 3  # 2 customers + 1 branch

    health = run(parser.parse_args(["--mode", "health", "--warehouse", wh]), spark=spark)
    assert health["production"]["customers"] == 2

    # per-phase modes are independently invocable (reference §3 entry 3)
    t = run(parser.parse_args(
        ["--mode", "transform", "--warehouse", wh]), spark=spark)
    assert t["transformed"]["customers"] == 2
    ld = run(parser.parse_args(["--mode", "load", "--warehouse", wh]), spark=spark)
    assert ld["reconciliation"]["customers"]["synced"]

    # bounded schedule loop: idempotent re-runs (hash-skip), lock structural
    sched = run(parser.parse_args(
        ["--mode", "schedule", "--data-dir", str(d), "--warehouse", wh,
         "--interval-sec", "0", "--max-runs", "2"]), spark=spark)
    assert sched["runs"] == 2 and sched["last"]["status"] == "SUCCESS"


def test_schedule_cadence_presets_pin_reference_firing_times():
    """The reference's three cadences (main.py:372-396) computed as
    pure firing times: daily at run-time; twice-daily adds the 12 h
    offset slot (with the '13:00' fallback on unparseable input);
    biweekly fires Wednesday AND Sunday."""
    from datetime import datetime

    from python_etl_pipeline_spark.cli import fire_times, offset_12h

    # 12h offset arithmetic incl. wraparound + the reference's fallback
    assert offset_12h("01:00") == "13:00"
    assert offset_12h("14:30") == "02:30"
    assert offset_12h("garbage") == "13:00"

    after = datetime(2026, 8, 13, 10, 0)  # a Thursday

    daily = fire_times("daily", "09:00", after, 3)
    assert daily == [
        datetime(2026, 8, 14, 9, 0),   # next 09:00 is Friday
        datetime(2026, 8, 15, 9, 0),
        datetime(2026, 8, 16, 9, 0),
    ]
    # same day still fires if the slot is ahead of `after`
    assert fire_times("daily", "23:00", after, 1) == [
        datetime(2026, 8, 13, 23, 0)
    ]

    twice = fire_times("twice-daily", "09:00", after, 3)
    assert twice == [
        datetime(2026, 8, 13, 21, 0),  # the +12h slot later today
        datetime(2026, 8, 14, 9, 0),
        datetime(2026, 8, 14, 21, 0),
    ]

    bi = fire_times("biweekly", "06:00", after, 4)
    assert [(t.strftime("%A"), t.hour) for t in bi] == [
        ("Sunday", 6), ("Wednesday", 6), ("Sunday", 6), ("Wednesday", 6)
    ]
    assert bi[0] == datetime(2026, 8, 16, 6, 0)
    assert bi[1] == datetime(2026, 8, 19, 6, 0)


def test_validate_config_actionable_errors(tmp_path, monkeypatch):
    """--mode health (and every other mode) validates configuration
    BEFORE building a session — the reference's validate_config
    analog (config/config.py:241-260, test.py:134-140): every problem
    collected into ONE error with actionable text."""
    import pytest

    from python_etl_pipeline_spark.cli import build_parser, validate_config

    parser = build_parser()

    # health against a missing warehouse: points at --mode full
    args = parser.parse_args(
        ["--mode", "health", "--warehouse", str(tmp_path / "nope")]
    )
    with pytest.raises(ValueError, match="run --mode full first"):
        validate_config(args)

    # warehouse path exists but is a file
    f = tmp_path / "whfile"
    f.write_text("x")
    args = parser.parse_args(["--mode", "health", "--warehouse", str(f)])
    with pytest.raises(ValueError, match="not a.*directory"):
        validate_config(args)

    # read modes need the data dir; errors COLLECT (data dir AND env)
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "zero")
    args = parser.parse_args(
        ["--mode", "full", "--data-dir", str(tmp_path / "missing")]
    )
    with pytest.raises(ValueError) as ei:
        validate_config(args)
    assert "data directory not found" in str(ei.value)
    assert "SPARK_GRAFT_CPUS must be a positive integer" in str(ei.value)
    monkeypatch.delenv("SPARK_GRAFT_CPUS")

    monkeypatch.setenv("SPARK_DRIVER_MEMORY", "lots")
    d = tmp_path / "d"
    d.mkdir()
    args = parser.parse_args(["--mode", "full", "--data-dir", str(d)])
    with pytest.raises(ValueError, match="4g/512m"):
        validate_config(args)
    monkeypatch.delenv("SPARK_DRIVER_MEMORY")

    # scheduler arguments
    for argv, msg in [
        (["--mode", "schedule", "--interval-sec", "-5"], "interval-sec"),
        (["--mode", "schedule", "--max-runs", "-1"], "max-runs"),
        (
            ["--mode", "schedule", "--schedule-type", "daily",
             "--run-time", "25:00"],
            "run-time must be HH:MM",
        ),
        (
            ["--mode", "schedule", "--schedule-type", "biweekly",
             "--run-time", "garbage"],
            "run-time must be HH:MM",
        ),
    ]:
        args = parser.parse_args(argv + ["--data-dir", str(d)])
        with pytest.raises(ValueError, match=msg):
            validate_config(args)

    # the reference's offset-fallback quirk input stays VALID: '001:00'
    # parses by int() (hour 1) though strptime rejects it, so the
    # twice-daily second slot falls back to 13:00 — validation must not
    # make that path unreachable
    args = parser.parse_args(
        ["--mode", "schedule", "--schedule-type", "twice-daily",
         "--run-time", "001:00", "--data-dir", str(d)]
    )
    validate_config(args)

    # a good config validates clean for every mode
    wh = tmp_path / "wh"
    wh.mkdir()
    for mode in ("full", "extract", "transform", "load", "health"):
        args = parser.parse_args(
            ["--mode", mode, "--data-dir", str(d), "--warehouse", str(wh)]
        )
        validate_config(args)
