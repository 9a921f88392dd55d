"""Daily-sync schedule persistence + runtime reschedule (VERDICT r11
'what's missing' #1 — reference /schedule endpoint app.py:6790-6813,
scheduled_time.json app.py:6759-6771, 05:00 default cron
app.py:6744-6749). The due computation is pure datetime math, so
everything but the one real sync run needs no SparkSession.
"""

from __future__ import annotations

from datetime import datetime
from zoneinfo import ZoneInfo

import pytest

from acuvate_spark.streaming.schedule import DEFAULT_TIME, SYNC_TZ, SyncScheduler

UTC = ZoneInfo("UTC")


def _sched(tmp_path) -> SyncScheduler:
    return SyncScheduler(str(tmp_path / "scheduled_time.json"))


def test_schedule_roundtrip_and_default(tmp_path):
    s = _sched(tmp_path)
    # no file: GET returns None (the reference returns null), but the
    # effective cron is the 05:00 default
    assert s.get_schedule() is None
    assert s.effective_time() == DEFAULT_TIME
    assert s.set_schedule("7:30") == "07:30"  # normalized like the int-split
    assert s.get_schedule() == "07:30"
    # a new instance over the same file sees the persisted time — the
    # property the reference's in-process APScheduler job loses on
    # restart and scheduled_time.json exists to restore
    assert _sched(tmp_path).effective_time() == "07:30"


@pytest.mark.parametrize("bad", ["", "5", "5:3:1", "25:00", "05:60", "ab:cd"])
def test_schedule_rejects_invalid_times(tmp_path, bad):
    s = _sched(tmp_path)
    with pytest.raises(ValueError):
        s.set_schedule(bad)
    assert s.get_schedule() is None  # nothing persisted on failure


def test_next_run_respects_timezone_and_reschedule(tmp_path):
    s = _sched(tmp_path)
    # 2026-01-15 12:00 UTC = 07:00 America/New_York (EST): today's
    # 05:00 slot already fired, next run is tomorrow 05:00
    now = datetime(2026, 1, 15, 12, 0, tzinfo=UTC)
    nxt = s.next_run(now)
    assert (nxt.hour, nxt.minute) == (5, 0)
    assert nxt.tzinfo is SYNC_TZ and nxt.day == 16
    # runtime reschedule to 23:00: that's still ahead TODAY local
    s.set_schedule("23:00")
    nxt = s.next_run(now)
    assert (nxt.day, nxt.hour) == (15, 23)
    # naive datetimes are treated as UTC
    assert s.next_run(datetime(2026, 1, 15, 12, 0)) == nxt


def test_run_if_due_is_idempotent_per_slot(spark, sf_dir, tmp_path):
    s = _sched(tmp_path)
    s.set_schedule("05:00")
    out = str(tmp_path / "sync_out")
    t1 = datetime(2026, 1, 15, 12, 0, tzinfo=UTC)  # 07:00 local, slot open
    n = s.run_if_due(spark, sf_dir, out, now=t1)
    assert n is not None and n > 0
    # re-tick same slot (and even a process 'restart' via a fresh
    # instance): no second run
    assert s.run_if_due(spark, sf_dir, out, now=t1) is None
    assert _sched(tmp_path).run_if_due(spark, sf_dir, out, now=t1) is None
    # the next day's slot opens -> runs again
    t2 = datetime(2026, 1, 16, 12, 0, tzinfo=UTC)
    assert _sched(tmp_path).run_if_due(spark, sf_dir, out, now=t2) == n


def test_run_if_due_crash_before_slot_commit_converges(spark, sf_dir, tmp_path):
    """A crash BETWEEN the sync write and the slot commit re-runs the
    sync on the next tick (at-least-once) and converges: the sync
    itself is an idempotent overwrite, so the replayed output is
    byte-identical and the slot then commits."""
    from datetime import datetime
    from zoneinfo import ZoneInfo

    from acuvate_spark.streaming import schedule as sched_mod

    s = _sched(tmp_path)
    s.set_schedule("05:00")
    out = str(tmp_path / "sync_out")
    t1 = datetime(2026, 1, 15, 12, 0, tzinfo=ZoneInfo("UTC"))

    class Boom(RuntimeError):
        pass

    real = sched_mod.run_daily_sync

    def crashing(spark_, sf, out_):
        real(spark_, sf, out_)  # the sync lands...
        raise Boom()  # ...but the process dies before the slot commits

    sched_mod_run = sched_mod.run_daily_sync
    sched_mod.run_daily_sync = crashing
    try:
        with pytest.raises(Boom):
            s.run_if_due(spark, sf_dir, out, now=t1)
    finally:
        sched_mod.run_daily_sync = sched_mod_run
    # slot did NOT commit -> the replayed tick runs the sync again
    n = _sched(tmp_path).run_if_due(spark, sf_dir, out, now=t1)
    assert n is not None and n > 0
    # and only then does the slot stick
    assert _sched(tmp_path).run_if_due(spark, sf_dir, out, now=t1) is None


def test_concurrent_tick_is_serialized_by_the_state_lease(spark, sf_dir, tmp_path, monkeypatch):
    """ADVICE r12: two simultaneous platform ticks must not both run
    the same slot. The tick runs under the sinks writer lease on the
    state path — a tick that finds the lease held by a LIVE holder
    reports 'nothing due' without touching the sync, and the slot
    stays unrun for the winner to commit."""
    import os
    from datetime import datetime
    from zoneinfo import ZoneInfo

    from acuvate_spark.operators import sinks
    from acuvate_spark.streaming import schedule as sched_mod

    s = _sched(tmp_path)
    s.set_schedule("05:00")
    out = str(tmp_path / "sync_out")
    t1 = datetime(2026, 1, 15, 12, 0, tzinfo=ZoneInfo("UTC"))
    lease = s.state_path.rstrip("/") + ".__lease__"
    with open(lease, "w") as fh:  # a concurrent tick, alive, mid-run
        fh.write(f"pid={os.getpid()} host={sinks._HOSTNAME} purpose=daily-sync")

    ran = []
    monkeypatch.setattr(sched_mod, "run_daily_sync", lambda *a: ran.append(1) or 1)
    assert s.run_if_due(spark, sf_dir, out, now=t1) is None
    assert ran == []  # loser never ran the sync
    os.remove(lease)
    # winner gone (released): the next tick runs the slot normally
    assert s.run_if_due(spark, sf_dir, out, now=t1) == 1
    assert ran == [1]
    # and the under-lease re-check makes a waiting tick a no-op
    assert s.run_if_due(spark, sf_dir, out, now=t1) is None


def test_tick_crashed_mid_sync_lease_is_stolen_by_replay(spark, sf_dir, tmp_path):
    """A tick kill -9'd mid-sync leaves its lease behind; the next
    same-host tick steals it via the pid-liveness probe and replays
    the slot immediately (at-least-once), not after LEASE_TTL_S."""
    import os
    import subprocess
    from datetime import datetime
    from zoneinfo import ZoneInfo

    from acuvate_spark.operators import sinks

    s = _sched(tmp_path)
    s.set_schedule("05:00")
    out = str(tmp_path / "sync_out")
    t1 = datetime(2026, 1, 15, 12, 0, tzinfo=ZoneInfo("UTC"))
    proc = subprocess.Popen(["true"])
    proc.wait()
    lease = s.state_path.rstrip("/") + ".__lease__"
    with open(lease, "w") as fh:  # fresh mtime, dead holder
        fh.write(f"pid={proc.pid} host={sinks._HOSTNAME} purpose=daily-sync")
    n = s.run_if_due(spark, sf_dir, out, now=t1)
    assert n is not None and n > 0
    assert not os.path.exists(lease)
