"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship maintenance pipeline (compact → Z-order
cluster → MERGE INTO → snapshot expiry) on a transcript table derived from
``/root/testdata/sf0.001`` and returns the post-maintenance ordered scan.
``queries()``/``oracle_sql()`` expose every implemented operator
(SURVEY.md §2 + training-data ops) with DuckDB oracles where SQL can express
them (see e2e_ocsf_cyber_lakehouse_blueprint_ray/pipelines/queries.py).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from e2e_ocsf_cyber_lakehouse_blueprint_ray.pipelines import queries as _q


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return _q.q_maint_full_scan("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (others are
    rows-only: approximate ANN, MinHash/SimHash/Jaccard candidates,
    winnowing sketch)."""
    return _q.oracle_sql()
