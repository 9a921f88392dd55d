"""TagRegistry — the reference's endpoint surface (SURVEY §3) as a
library API over the Spark engine.

Each method is the Spark-native re-expression of a Flask endpoint
family; a caller of the reference backend maps 1:1 onto these:

| reference endpoint (app.py) | here |
|---|---|
| /api/Home/GetData (5029-5109) | ``get_data`` |
| EditData search (5186-5209) | ``find_tag`` |
| insert_tag (4544-4690) | ``upsert_tags`` |
| delete (5216-5250) | ``delete_tags`` |
| delete_user soft (4484-4514) | ``soft_delete_user`` |
| approve (5706-5888) | ``apply_approvals`` |
| sync_tags (6631-6740) | ``sync_rows`` |
| uploadExcel (6022-6441) | ``import_rows`` (two-phase) |
| export (7379-7483) | ``export_excel`` |

State lives in parquet register directories (one per tag family, as
the reference keeps one Snowflake table per family). Mutations are
copy-on-write: compute the post-state dataflow, write to a new
version directory, atomically repoint. That gives single-writer
transactional semantics without a table format; on a deployment with
Delta/Iceberg the same dataflows feed MERGE/DELETE instead.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions import tags as tagfn
from .operators import sinks
from .session import tune

REGISTER_TYPES = ("Equipment", "Instrument", "Line", "Cable")


class TagRegistry:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = tune(spark)
        self.root = root
        os.makedirs(root, exist_ok=True)

    # --- storage (versioned copy-on-write) ---------------------------------

    def _versions_dir(self, register: str) -> str:
        return os.path.join(self.root, register.lower())

    def _current_path(self, register: str) -> str | None:
        d = self._versions_dir(register)
        if not os.path.isdir(d):
            return None
        # numeric selection: lexicographic sort would pick a stale
        # version whenever the digit count changes. A version counts
        # only with its _SUCCESS marker (crash-invisibility: a writer
        # killed mid job-commit must not serve a partial register —
        # the previous committed version stays current instead).
        versions = [
            v
            for v in os.listdir(d)
            if v.startswith("v")
            and v[1:].isdigit()
            and os.path.isfile(os.path.join(d, v, "_SUCCESS"))
        ]
        if not versions:
            return None
        return os.path.join(d, max(versions, key=lambda v: int(v[1:])))

    def _write_version(self, register: str, df: DataFrame) -> str:
        d = self._versions_dir(register)
        os.makedirs(d, exist_ok=True)
        # wall-clock ns, zero-padded: survives process restarts
        # (monotonic_ns has an undefined epoch across processes) and
        # keeps even naive lexicographic ordering correct
        path = os.path.join(d, f"v{time.time_ns():025d}")
        df.write.mode("overwrite").parquet(path)
        return path

    def table(self, register: str) -> DataFrame:
        path = self._current_path(register)
        if path is None:
            return self.spark.createDataFrame(
                [], "tag_no string, description string, document string, "
                "modified_by string, modified_date timestamp"
            )
        return self.spark.read.parquet(path)

    # --- reads -------------------------------------------------------------

    def get_data(
        self, register: str, page: int = 1, page_size: int = 10, search: str | None = None
    ) -> DataFrame:
        """Paginated register read with optional ILIKE search and
        COUNT(*) OVER() total (reference app.py:5070-5096)."""
        df = self.table(register)
        if search:
            df = df.where(F.col("tag_no").ilike(f"%{search}%"))
        start = (page - 1) * page_size
        # distributed top-(offset+n) page + broadcast 1-row total: the
        # old COUNT(*) OVER () / global row_number pair funneled the
        # whole filtered register through one WindowExec partition
        total = df.agg(F.count("*").alias("totalCount"))
        page_rows = (
            df.orderBy(F.col("modified_date").desc(), F.col("tag_no").desc())
            .offset(start)
            .limit(page_size)
        )
        return page_rows.crossJoin(F.broadcast(total))

    def get_data_after(
        self, register: str, page_size: int = 10, after: tuple | None = None, search: str | None = None
    ) -> DataFrame:
        """Keyset pagination — the 100 TB replacement for OFFSET
        paging: pages are addressed by the (modified_date, tag_no) of
        the previous page's last row, so every page is a pushable
        range filter + distributed top-k instead of a global
        row_number. ``after`` is that (modified_date, tag_no) pair."""
        df = self.table(register)
        if search:
            df = df.where(F.col("tag_no").ilike(f"%{search}%"))
        # NULL modified_date sorts (and compares) as the epoch so such
        # rows stay reachable — a raw NULL < cursor predicate would
        # silently drop them from every page after the first
        eff_date = F.coalesce(
            F.col("modified_date"), F.lit("1970-01-01 00:00:00").cast("timestamp")
        )
        if after is not None:
            last_date, last_tag = after
            if last_date is None:
                last_date = "1970-01-01 00:00:00"
            df = df.where(
                (eff_date < F.lit(last_date))
                | ((eff_date == F.lit(last_date)) & (F.col("tag_no") < F.lit(last_tag)))
            )
        return df.orderBy(eff_date.desc(), F.col("tag_no").desc()).limit(page_size)

    def find_tag(self, tag_no: str) -> DataFrame:
        """First match across registers in priority order (reference
        EditData app.py:5186-5209): union with priority + pick-first."""
        branches = []
        for prio, reg in enumerate(REGISTER_TYPES):
            branches.append(
                self.table(reg)
                .where(F.col("tag_no") == tag_no)
                .withColumn("tag_type", F.lit(reg))
                .withColumn("prio", F.lit(prio))
            )
        out = branches[0]
        for b in branches[1:]:
            out = out.unionByName(b)
        # partition-less window is safe here: the input is <= 4 rows by
        # construction (at most one exact tag_no match per register)
        w = Window.orderBy("prio")
        return out.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop(
            "rn", "prio"
        )

    # --- mutations ---------------------------------------------------------

    def upsert_tags(self, register: str, incoming: DataFrame) -> None:
        """MERGE: existing rows get updated fields + semicolon-merged
        document column; new rows insert (reference app.py:4544-4690)."""
        existing = self.table(register)
        inc = incoming.select(
            F.col("tag_no").alias("i_tag_no"),
            F.col("description").alias("i_description"),
            F.col("document").alias("i_document"),
            F.col("modified_by").alias("i_modified_by"),
        )
        j = existing.join(inc, existing.tag_no == inc.i_tag_no, "full_outer")
        merged = j.select(
            F.coalesce(F.col("tag_no"), F.col("i_tag_no")).alias("tag_no"),
            F.coalesce(F.col("i_description"), F.col("description")).alias("description"),
            F.when(
                F.col("tag_no").isNotNull() & F.col("i_tag_no").isNotNull(),
                tagfn.merge_semicolon_sorted(F.col("document"), F.col("i_document")),
            )
            .otherwise(F.coalesce(F.col("i_document"), F.col("document")))
            .alias("document"),
            F.coalesce(F.col("i_modified_by"), F.col("modified_by")).alias("modified_by"),
            F.when(F.col("i_tag_no").isNotNull(), F.current_timestamp())
            .otherwise(F.col("modified_date"))
            .cast("timestamp")
            .alias("modified_date"),
        )
        self._write_version(register, merged)

    def delete_tags(self, register: str, tag_nos: list[str]) -> int:
        """DELETE by key via anti-join (reference app.py:5216-5250);
        returns rows removed."""
        existing = self.table(register)
        doomed = self.spark.createDataFrame([(t,) for t in tag_nos], "tag_no string")
        remaining = existing.join(doomed, "tag_no", "left_anti")
        before, after = existing.count(), remaining.count()
        self._write_version(register, remaining)
        return before - after

    def apply_approvals(self, register: str, history: DataFrame) -> DataFrame:
        """Approval promote (reference app.py:5706-5888): PENDING
        history rows with action Add/Edit apply against the register
        with validation; returns the per-row dispositions and commits
        the post-state."""
        main = self.table(register)
        # one pending row per tag: duplicates (resubmitted approvals)
        # would fan out through the join and commit duplicate register
        # rows; deterministic pick = first by (description, action)
        w = Window.partitionBy("h_tag_no").orderBy("h_description", "action")
        h = (
            history.where(F.col("approval_status") == "PENDING")
            .select(
                F.col("tag_no").alias("h_tag_no"),
                F.col("description").alias("h_description"),
                F.col("action"),
            )
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
        )
        j = main.join(h, main.tag_no == h.h_tag_no, "full_outer")
        disposition = (
            F.when(F.col("h_tag_no").isNull(), F.lit("unchanged"))
            .when(F.col("tag_no").isNotNull() & (F.col("action") == "Edit"), F.lit("edited"))
            .when(F.col("tag_no").isNotNull() & (F.col("action") == "Add"), F.lit("rejected_add"))
            .when(F.col("action") == "Add", F.lit("added"))
            .otherwise(F.lit("rejected_edit"))
        )
        applied = disposition.isin("edited", "added")
        result = j.select(
            F.coalesce(F.col("tag_no"), F.col("h_tag_no")).alias("tag_no"),
            F.when(applied, F.col("h_description")).otherwise(F.col("description")).alias(
                "description"
            ),
            F.coalesce(F.col("document"), F.lit("")).alias("document"),
            # applied rows get the approval stamp (reference stamps the
            # approval time, app.py:4838-4841) — otherwise added rows
            # carry NULLs that the sync window and pagination never see
            F.when(applied, F.lit("approval")).otherwise(F.col("modified_by")).alias(
                "modified_by"
            ),
            F.when(applied, F.current_timestamp().cast("timestamp"))
            .otherwise(F.col("modified_date"))
            .alias("modified_date"),
            disposition.alias("disposition"),
        ).where(F.col("disposition") != "rejected_edit")
        post = result.drop("disposition")
        self._write_version(register, post)
        return result

    def soft_delete_user(self, users: DataFrame, email: str) -> DataFrame:
        """isActive=0 flag update (reference app.py:4484-4514)."""
        return users.withColumn(
            "is_active",
            F.when(F.lower(F.col("email")) == email.lower(), F.lit(0)).otherwise(
                F.col("is_active")
            ),
        )

    # --- egress ------------------------------------------------------------

    def sync_rows(self, window_start, window_end) -> DataFrame:
        """UNION-ALL sync of all registers inside a date window
        (reference sync_tags app.py:6638-6668)."""
        out = None
        for reg in REGISTER_TYPES:
            b = (
                self.table(reg)
                .where(
                    F.coalesce(F.col("modified_date"), F.col("modified_date")).between(
                        window_start, window_end
                    )
                )
                .select("tag_no", "description", F.lit(reg).alias("tag_type"))
            )
            out = b if out is None else out.unionByName(b)
        return out

    def export_excel(self, register: str, path: str, header_map=None, exclude=None) -> str:
        return sinks.export_excel(self.table(register), path, header_map, exclude)

    # --- Excel import (two-phase, reference app.py:6022-6441) --------------

    def import_rows(self, register: str, rows: DataFrame) -> DataFrame:
        """Phase 1 validation: null-normalize tag, require description;
        split Add/Edit vs errors. Phase 2 commit: apply valid rows as
        an upsert. Returns the validation report."""
        existing = self.table(register).select(F.col("tag_no").alias("e_tag"))
        v = rows.select(
            tagfn.null_normalize(F.col("tagno")).alias("tag_no"),
            tagfn.null_normalize(F.col("description")).alias("description"),
            F.coalesce(F.col("document"), F.lit("")).alias("document"),
            F.col("modified_by"),
        )
        report = (
            v.join(existing, v.tag_no == existing.e_tag, "left")
            .select(
                "tag_no",
                "description",
                "document",
                "modified_by",
                F.when(F.col("tag_no").isNull(), F.lit("MISSING_TAG"))
                .when(F.col("description").isNull(), F.lit("MISSING_DESCRIPTION"))
                .alias("error"),
                F.when(F.col("tag_no").isNull() | F.col("description").isNull(), F.lit("ERROR"))
                .when(F.col("e_tag").isNotNull(), F.lit("Edit"))
                .otherwise(F.lit("Add"))
                .alias("action"),
            )
        )
        valid = report.where(F.col("action") != "ERROR").drop("error", "action")
        if valid.take(1):
            self.upsert_tags(register, valid)
        return report
