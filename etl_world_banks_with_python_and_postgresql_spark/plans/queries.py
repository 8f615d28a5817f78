"""Verified query registry: every operator family from SURVEY.md §2 plus
the north-star extensions, each as (Spark callable, DuckDB oracle SQL).

The driver runs the Spark side and the oracle side on the same parquet
tables at sf=0.01 and hash-compares rows (order-insensitive, columns
sorted by name) -- so every computed column is aliased identically on
both sides and, since round 5, every gated ratio/average is exact
BIGINT-derived (see functions.exactnum). LIMIT queries carry a total
deterministic ORDER BY.

This module is the aggregation point: the definitions live in family
modules (imported below for their registration side effects), shared
infrastructure in plans.base. Public surface -- REGISTRY, Query, query,
load -- is unchanged from the pre-split monolith.
"""

from .base import *  # noqa: F401,F403 -- Query, REGISTRY, query, load, helpers

# family modules register their queries into REGISTRY on import
from . import analytic  # noqa: F401,E402
from . import dedup_sim  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import scd  # noqa: F401,E402
from . import textprep  # noqa: F401,E402
from . import timeseries  # noqa: F401,E402
