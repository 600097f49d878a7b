"""Declarative pipeline builder + transform registry (SURVEY.md §2.9).

Reference analog: ``@sdp.table`` / ``@sdp.append_flow`` / ``sdp.create_sink``
bind pure DataFrame→DataFrame transform functions to flows
(/root/reference/transformations/mappings/ocsf/iam/
gold_ocsf_iam_event_classes_delta_sinks.py:47-69,184-305). Here a user
registers ``Callable[[pa.Table], pa.Table]`` batch transforms and composes
them into ``read → [transforms] → write+commit`` flows; adding a
source/class = write one function + ``@register``.

The builder stays thin on purpose: steps compile to one Ray Data pipeline
(reads stay lazy, transforms fuse into map_batches stages, the sink is the
Table append path committing a snapshot), so the declarative surface adds no
execution overhead.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import pyarrow as pa

from ..table import Table

REGISTRY: dict[str, Callable[[pa.Table], pa.Table]] = {}


def register(name: str | None = None):
    """Decorator: add a batch transform to the global registry."""

    def deco(fn):
        REGISTRY[name or fn.__name__] = fn
        return fn

    return deco


def transform(name: str) -> Callable[[pa.Table], pa.Table]:
    return REGISTRY[name]


@dataclass
class Flow:
    """One append flow: source table/dataset → transforms → sink table."""

    name: str
    source: object  # Table | ray.data.Dataset | callable returning a Dataset
    sink: Table
    transforms: list = field(default_factory=list)  # names or callables
    batch_size: int | None = None
    use_actor: bool = False  # serialize sink commits via metastore actor

    def _resolve(self):
        out = []
        for t in self.transforms:
            out.append(transform(t) if isinstance(t, str) else t)
        return out

    def run(self) -> int | None:
        ds = self.source
        if isinstance(ds, Table):
            ds = ds.scan()
        elif callable(ds):
            ds = ds()
        cfg = self.sink.config
        for fn in self._resolve():
            ds = ds.map_batches(
                fn, batch_format="pyarrow", batch_size=self.batch_size or cfg.batch_size
            )
        return self.sink.append_dataset(
            ds, operation=f"flow-{self.name}", use_actor=self.use_actor
        )


@dataclass
class Pipeline:
    """An ordered list of flows (the ``@sdp.append_flow`` registration list);
    multiple flows may share one sink — commits serialize via its metastore
    actor when ``use_actor`` is set."""

    name: str
    flows: list[Flow] = field(default_factory=list)

    def add(self, flow: Flow) -> "Pipeline":
        self.flows.append(flow)
        return self

    def run(self) -> dict[str, int | None]:
        return {f.name: f.run() for f in self.flows}
