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

State is BOUNDED (the at-scale requirement: with unbounded conversation
cardinality at the 10^12-turn north star, keep-forever state grows without
bound): a conversation idle for longer than ``idle_timeout_ms`` is evicted
via a processing-time timeout. Eviction semantics, stated precisely:

 * Eviction itself emits nothing — an idle-and-complete conversation just
   releases its (max_idx, n_seen) slot from the state store.
 * A turn arriving AFTER its conversation was evicted re-seeds state from
   scratch (max_idx = -1) and is judged against that: turn_idx 0 is accepted
   silently, anything greater is flagged ``gap``. That is the conservative
   direction — a genuinely-contiguous late continuation (idx N after idle)
   is reported as a gap rather than a real post-idle gap being swallowed.
   Downstream consumers that replay history (the batch lane) can reconcile;
   the stream's job is to never under-report.
 * The batch lane is unaffected; this is purely the streaming state story,
   and it mirrors the sibling dedup monitor's already-bounded design
   (streaming/dedup_stream.py externalizes its corpus index to a table).

``idle_timeout_ms=None`` restores keep-forever state for short-lived or
bounded-key streams where eviction noise is worse than state growth.
Making the bounded mode the DEFAULT is a deliberate round-4 output-contract
change (flagged in review, kept): a conversation that resumes contiguously
after >30 min of silence now emits a conservative ``gap`` flag it would not
have before. At the 10^12-turn north star the default must be the one that
cannot OOM the state store; callers whose streams carry long human pauses
over a bounded conversation population pass ``None`` (or a larger deadline)
explicitly.

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

# 30 min of idle wall-clock before a conversation's state slot is released —
# generous next to real inter-turn gaps, tiny next to the stream's lifetime
DEFAULT_IDLE_TIMEOUT_MS = 30 * 60 * 1000


def _make_monitor(idle_timeout_ms: int | None):
    def _monitor(key, pdf_iter, state: GroupState):
        if idle_timeout_ms is not None and state.hasTimedOut:
            # idle past the deadline: release the slot; nothing to emit
            state.remove()
            return
        (conv_id,) = key
        max_idx, n_seen = state.get if state.exists else (-1, 0)
        chunks = [pdf["turn_idx"].to_numpy(dtype=np.int64) for pdf in pdf_iter]
        idxs = np.sort(np.concatenate(chunks)) if chunks else np.empty(0, np.int64)
        if idxs.size:
            # prev-max before each element: running max seeded with carried
            # state (or -1 after eviction — the conservative re-seed)
            run = np.maximum.accumulate(np.concatenate(([max_idx], idxs)))[:-1]
            dup = idxs <= run
            gap = idxs > run + 1
            n_seen += int(idxs.size)
            max_idx = int(max(max_idx, idxs[-1]))
            state.update((max_idx, n_seen))
            if idle_timeout_ms is not None:
                state.setTimeoutDuration(idle_timeout_ms)
            bad = dup | gap
            if bad.any():
                yield pd.DataFrame({
                    "conv_id": np.repeat(conv_id, int(bad.sum())),
                    "turn_idx": idxs[bad].astype("int32"),
                    "kind": np.where(dup[bad], "dup_or_replay", "gap"),
                })

    return _monitor


def turn_sequence_monitor(
    stream_df: DataFrame,
    idle_timeout_ms: int | None = DEFAULT_IDLE_TIMEOUT_MS,
) -> DataFrame:
    """(conv_id, turn_idx, kind) violation stream; state = (max_idx, n_seen)
    per conv_id, evicted after ``idle_timeout_ms`` of processing-time idleness
    (None = keep forever). See the module docstring for the exact
    late-turn-after-eviction semantics."""
    timeout = (GroupStateTimeout.NoTimeout if idle_timeout_ms is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    return (
        stream_df.groupBy("conv_id")
        .applyInPandasWithState(
            _make_monitor(idle_timeout_ms), OUTPUT_SCHEMA, STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
