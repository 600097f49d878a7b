"""Data-quality expectations — the Delta Live Tables ``@dlt.expect`` /
Delta CHECK-constraint analog.

The reference's platform ships declarative expectations (retain / drop /
fail actions per rule) even though the blueprint itself declares none
(SURVEY.md §5); a production medallion needs them at the bronze→silver
boundary. This stage evaluates a rule set over a Dataset in ONE streaming
pass per consumer:

    rules = [Rule("value_nonneg", lambda b: pc.greater_equal(b["value"], 0)),
             Rule("has_user",     lambda b: pc.is_valid(b["user_id"]))]

    validated = expectations.validate(ds, rules)        # adds _violations
    clean     = expectations.drop_invalid(validated)    # rows passing ALL
    quarantine= expectations.quarantined(validated)     # rows failing ANY,
                                                        #   with rule names
    stats     = expectations.violation_counts(ds, rules)  # per-rule counts

Rule predicates are VECTORIZED batch functions (pa.Table → BooleanArray,
True = pass; null counts as FAIL, matching SQL CHECK semantics where the
constraint must evaluate TRUE). Violation counting pre-aggregates per
batch — the combine moves one row per rule per block.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_VIOL = "_violations"


@dataclass(frozen=True)
class Rule:
    name: str
    predicate: Callable[[pa.Table], pa.Array]  # True = row passes


def _fail_masks(b: pa.Table, rules: list[Rule]) -> list[np.ndarray]:
    out = []
    for r in rules:
        ok = r.predicate(b)
        if isinstance(ok, pa.ChunkedArray):
            ok = ok.combine_chunks()
        ok = pc.fill_null(ok, False)  # null ⇒ constraint not TRUE ⇒ fail
        out.append(np.invert(ok.to_numpy(zero_copy_only=False)))
    return out


def validate(ds, rules: list[Rule]):
    """Append a ``_violations`` list<string> column: the names of every
    rule each row fails (empty list = clean row)."""
    names = [r.name for r in rules]

    def fn(b: pa.Table) -> pa.Table:
        fails = _fail_masks(b, rules)
        n = b.num_rows
        counts = np.zeros(n, dtype=np.int32)
        for m in fails:
            counts += m
        # build the ragged list column without per-row Python: for each
        # rule, the failing row indices contribute one entry; sort entries
        # by (row, rule order) and slice by per-row counts
        rows = np.concatenate(
            [np.flatnonzero(m) for m in fails] or [np.array([], np.int64)]
        )
        rule_idx = np.concatenate(
            [np.full(int(m.sum()), i, np.int64) for i, m in enumerate(fails)]
            or [np.array([], np.int64)]
        )
        order = np.lexsort((rule_idx, rows))
        values = pa.array(np.asarray(names, dtype=object)[rule_idx[order]], pa.string()) \
            if len(order) else pa.array([], pa.string())
        offsets = pa.array(np.concatenate([[0], np.cumsum(counts)]).astype(np.int32))
        viol = pa.ListArray.from_arrays(offsets, values)
        return b.append_column(_VIOL, viol)

    return ds.map_batches(fn, batch_format="pyarrow")


def drop_invalid(validated_ds):
    """Rows passing every rule (the DLT ``expect_or_drop`` retain side)."""
    return validated_ds.map_batches(
        lambda b: b.filter(pc.equal(pc.list_value_length(b[_VIOL]), 0)).drop_columns(
            [_VIOL]
        ),
        batch_format="pyarrow",
    )


def quarantined(validated_ds):
    """Rows failing at least one rule, with the failed-rule names kept —
    the quarantine side table."""
    return validated_ds.map_batches(
        lambda b: b.filter(pc.greater(pc.list_value_length(b[_VIOL]), 0)),
        batch_format="pyarrow",
    )


def violation_counts(ds, rules: list[Rule]) -> pa.Table:
    """Per-rule (rule, n_failed, n_rows) counts: per-batch combiner emits
    one row per rule, the driver folds O(blocks × rules) partials."""
    names = [r.name for r in rules]

    def partial(b: pa.Table) -> pa.Table:
        fails = _fail_masks(b, rules)
        return pa.table(
            {
                "rule": pa.array(names, pa.string()),
                "n_failed": pa.array([int(m.sum()) for m in fails], pa.int64()),
                "n_rows": pa.array([b.num_rows] * len(rules), pa.int64()),
            }
        )

    parts = [
        b
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
        if b.num_rows
    ]
    if not parts:
        return pa.table(
            {
                "rule": pa.array(names, pa.string()),
                "n_failed": pa.array([0] * len(names), pa.int64()),
                "n_rows": pa.array([0] * len(names), pa.int64()),
            }
        )
    t = pa.concat_tables(parts)
    agg = t.group_by(["rule"]).aggregate([("n_failed", "sum"), ("n_rows", "sum")])
    out = pa.table(
        {
            "rule": agg["rule"],
            "n_failed": agg["n_failed_sum"],
            "n_rows": agg["n_rows_sum"],
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("rule", "ascending")]))
