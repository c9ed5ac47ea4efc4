"""Structured Streaming adapters (SURVEY §2.9).

The same DataFrame transformations the batch corpus verifies, over
``readStream``: tumbling/sliding/session windows with watermarks, stateful
dedup, and a foreachBatch sink that reuses the incremental materialization
(dynamic partition overwrite per micro-batch) — so batch backfill and the
live stream write through one code path, the engine's version of the
reference's "same model, daily batches" semantics.
"""

from dbtwiz_spark.streaming.jobs import (  # noqa: F401
    events_stream,
    foreach_batch_apply_changes,
    foreach_batch_merge,
    foreach_batch_overwrite,
    cusum_alarm_stream,
    holt_stream,
    rate_limit_stream,
    running_user_totals_stream,
    sessionized_stream,
    stateful_dedup_stream,
    windowed_counts_stream,
)
