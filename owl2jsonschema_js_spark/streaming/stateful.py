"""Custom stateful streaming operator: per-conversation turn-sequence monitor.

The batch engine checks turn_idx contiguity with one fused groupBy
(runner._group_violations). On a stream, the conversation's history spans
micro-batches, so the check needs per-key state: ``applyInPandasWithState``
keeps the running max turn_idx per conv_id and flags

 * ``dup_or_replay`` — an arriving turn_idx <= the max already seen,
 * ``gap``           — an arriving turn_idx that skips past max+1.

Inside the grouped function everything is vectorized numpy (sort + running
max), honoring the no-per-row-Python mandate; Python only touches per-batch
per-key scalars (the state tuple).

Reference parity: this is the streaming analog of C5/C6+contiguity — the
reference's cardinality restrictions (lib/index.js:355-361) evaluated
incrementally instead of over a complete document.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "conv_id string, turn_idx int, kind string"
STATE_SCHEMA = "max_idx long, n_seen long"


def _monitor(key, pdf_iter, state: GroupState):
    (conv_id,) = key
    max_idx, n_seen = state.get if state.exists else (-1, 0)
    chunks = [pdf["turn_idx"].to_numpy(dtype=np.int64) for pdf in pdf_iter]
    idxs = np.sort(np.concatenate(chunks)) if chunks else np.empty(0, np.int64)
    if idxs.size:
        # prev-max before each element: running max seeded with carried state
        run = np.maximum.accumulate(np.concatenate(([max_idx], idxs)))[:-1]
        dup = idxs <= run
        gap = idxs > run + 1
        n_seen += int(idxs.size)
        max_idx = int(max(max_idx, idxs[-1]))
        state.update((max_idx, n_seen))
        bad = dup | gap
        if bad.any():
            yield pd.DataFrame({
                "conv_id": np.repeat(conv_id, int(bad.sum())),
                "turn_idx": idxs[bad].astype("int32"),
                "kind": np.where(dup[bad], "dup_or_replay", "gap"),
            })


def turn_sequence_monitor(stream_df: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, kind) violation stream; state = (max_idx, n_seen)
    per conv_id, no timeout (conversations never expire in this check)."""
    return (
        stream_df.groupBy("conv_id")
        .applyInPandasWithState(
            _monitor, OUTPUT_SCHEMA, STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
