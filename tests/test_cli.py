"""CLI surface tests (``python -m acuvate_spark``).

``main()`` owns (and stops) its own SparkSession, so these tests
exercise the pieces below it: the ``sql`` subcommand's view
registration + ad-hoc statement path, against the shared fixture
session.
"""

from __future__ import annotations

from acuvate_spark.tables import TABLES, register_views


def test_register_views_exposes_all_tables(spark, sf_dir):
    register_views(spark, sf_dir)
    listed = {t.name for t in spark.catalog.listTables()}
    assert set(TABLES) <= listed


def test_adhoc_sql_runs_over_views(spark, sf_dir):
    register_views(spark, sf_dir)
    rows = spark.sql(
        "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1 ORDER BY 1"
    ).collect()
    assert len(rows) == 3
    assert sum(r.n for r in rows) == spark.table("orders").count()


def test_adhoc_sql_reads_events_with_tuned_timestamps(spark, sf_dir):
    """The views must go through load_table: events.ts arrives as
    INT64 nanos, and a raw read would surface it as bigint."""
    register_views(spark, sf_dir)
    dtype = dict(spark.table("events").dtypes)["ts"]
    assert dtype == "timestamp"


def test_cli_sql_subcommand_end_to_end(sf_dir):
    """Full main() path in a subprocess: arg parsing, session
    lifecycle, view registration, statement execution, output."""
    import subprocess
    import sys

    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "acuvate_spark",
            "sql",
            "SELECT count(*) AS n FROM orders",
            "--sf-dir",
            sf_dir,
        ],
        capture_output=True,
        text=True,
        timeout=180,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "| n " in r.stdout or "|n" in r.stdout.replace(" ", ""), r.stdout[-500:]


def test_cli_unknown_query_exits_2(sf_dir):
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "acuvate_spark", "run", "no_such_query"],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert r.returncode == 2
    assert "unknown query" in r.stderr


def test_cli_list_grep_filters(sf_dir):
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "acuvate_spark", "list", "--grep", "dedup"],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert r.returncode == 0
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert lines and all("dedup" in ln.lower() for ln in lines)


def test_cli_schedule_and_sync_subcommands(sf_dir, tmp_path):
    """The /schedule + /sync surface end-to-end in subprocesses: set,
    get, due-run, idempotent re-tick (reference app.py:6754-6813)."""
    import subprocess
    import sys

    state = str(tmp_path / "scheduled_time.json")

    def run(*argv, timeout=180):
        r = subprocess.run(
            [sys.executable, "-m", "acuvate_spark", *argv],
            capture_output=True, text=True, timeout=timeout,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout

    assert "default 05:00" in run("schedule", state)
    assert "06:15" in run("schedule", state, "--set", "6:15")
    assert run("schedule", state).strip() == "06:15"
    out = str(tmp_path / "sync_out")
    at = "2026-01-15T12:00:00+00:00"  # 07:00 America/New_York: slot open
    first = run("sync", state, "--sf-dir", sf_dir, "--out", out, "--at", at)
    assert "synced" in first
    again = run("sync", state, "--sf-dir", sf_dir, "--out", out, "--at", at)
    assert "not due" in again
