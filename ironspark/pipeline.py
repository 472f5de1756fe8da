"""Item pipelines: type-routed, priority-ordered DataFrame transform chains.

Reference: ``PipelineManager`` routes each item by TypeId to a chain of
pipelines sorted ascending by priority; a pipeline may transform or
drop the item, and a drop short-circuits the chain
(``src/pipeline/manager.rs:51-99``, ``fn_pipeline.rs:5-41``). Here a
pipeline is a ``DataFrame -> DataFrame`` transform over the rows of its
item_type; drops are row filters (which short-circuit trivially — a
dropped row never reaches later transforms in the composition).
Unrouted item types are counted, matching ``manager.rs:96-98``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PipelineManager:
    # item_type -> list[(priority, transform)]
    _chains: dict = field(default_factory=dict)

    def add_pipeline(
        self, item_type: str, transform: Callable[[DataFrame], DataFrame], priority: int = 0
    ) -> "PipelineManager":
        self._chains.setdefault(item_type, []).append((priority, transform))
        # stable sort on priority at registration (manager.rs:66)
        self._chains[item_type].sort(key=lambda pt: pt[0])
        return self

    def registered_types(self) -> list[str]:
        return sorted(self._chains)

    def process(self, items: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(processed, unrouted). processed = union of each type's rows
        run through its priority-ordered transform chain."""
        types = self.registered_types()
        if not types:
            empty = items.limit(0)
            return empty, items
        unrouted = items.filter(~F.col("item_type").isin(types))
        processed = None
        for t in types:
            df = items.filter(F.col("item_type") == t)
            for _, transform in self._chains[t]:
                df = transform(df)
            processed = df if processed is None else processed.unionByName(df)
        return processed, unrouted
