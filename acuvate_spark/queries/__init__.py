"""Named query registry.

Every implemented operator from SURVEY.md §2 (plus the training-data
pipeline extensions) is registered here as a ``QuerySpec``: a
``(spark, sf_dir) -> DataFrame`` callable plus, where SQL-expressible,
an equivalent ANSI-SQL string the driver runs on DuckDB as the
correctness oracle. ``__spark_entry__.queries()/oracle_sql()`` are thin
views over this registry.
"""

from __future__ import annotations

from .registry import REGISTRY, QuerySpec, register  # noqa: F401

# Import for side effects: each module registers its queries.
from . import core  # noqa: E402,F401
from . import joins  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import textstats  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import graph  # noqa: E402,F401
from . import mutations  # noqa: E402,F401
from . import etl  # noqa: E402,F401
from . import pid  # noqa: E402,F401
from . import training  # noqa: E402,F401
from . import layout  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
