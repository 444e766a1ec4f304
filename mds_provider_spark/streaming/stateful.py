"""Custom stateful streaming operator: cumulative per-partition verdicts.

``applyInPandasWithState`` keyed by part_id maintains running
(n_rows, n_violations) across micro-batches — the streaming analog of the
batch verdict table, surviving restarts via the streaming checkpoint.
This is the "custom stateful operator" surface: state schema, timeout
handling, and the batch-iterator contract are the transferable parts; the
arithmetic is deliberately simple.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mds_provider_spark.rules import RuleSet

STATE_SCHEMA = "n_rows long, n_violations long"
OUTPUT_SCHEMA = "part_id int, n_rows long, n_violations long, status string"


def running_verdicts(
    stream_df: DataFrame,
    ruleset: RuleSet,
) -> DataFrame:
    """Streaming DF -> cumulative verdict rows, one update per key/batch.

    Upstream we pre-compute the per-row hit count with the SAME compiled
    rule expression as batch (no second rule implementation), so state
    only aggregates two longs per partition — state size is O(partitions),
    independent of data volume.
    """
    flagged = stream_df.select(
        F.col(ruleset.part_col).alias("part_id"),
        F.size(ruleset.hits_column()).alias("_hits"),
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows, viols = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            rows += len(pdf)
            viols += int(pdf["_hits"].sum())
        state.update((rows, viols))
        yield pd.DataFrame(
            {
                "part_id": [key[0]],
                "n_rows": [rows],
                "n_violations": [viols],
                "status": ["fail" if viols > 0 else "pass"],
            }
        )

    return flagged.groupBy("part_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
