"""Custom stateful streaming operator: first-seen dedup across
micro-batches (applyInPandasWithState).

A continuously-landing crawl re-fetches the same pages forever;
training-data ingestion wants each normalized text exactly once —
ACROSS batches, which a stateless transform cannot do. State here is
one small record per fingerprint group (first url + count), kept in
the state store and checkpointed with the query.

Scale notes:
  - state is keyed by the md5 fingerprint → uniformly distributed,
    no hot groups; size = one tiny struct per distinct text;
  - the shuffle is the groupBy(fingerprint) exchange — the same
    exchange exact dedup pays in batch;
  - a production deployment adds state TTL (GroupStateTimeout) to
    bound the store on an unbounded feed; kept explicit here via the
    `timeout` parameter (NoTimeout default matches batch semantics).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.text_metrics import fingerprint

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("fp", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("first_seen_batch", T.BooleanType()),
        T.StructField("dupes_so_far", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_url", T.StringType()),
        T.StructField("seen", T.LongType()),
    ]
)


def _first_seen(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (fp,) = key
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("url")
    if state.exists:
        first_url, seen = state.get
        state.update((first_url, seen + len(rows)))
        return iter(())  # all duplicates of an already-kept text → drop
    first_url = rows["url"].iloc[0]
    state.update((first_url, int(len(rows))))
    out = pd.DataFrame(
        [{"fp": fp, "url": first_url, "first_seen_batch": True, "dupes_so_far": len(rows)}]
    )
    return iter([out])


def streaming_first_seen(
    docs_stream: DataFrame, text_col: str = "text", url_col: str = "url"
) -> DataFrame:
    """Stream of documents → stream of first-seen (fp, url) keepers.

    Emits exactly one row per distinct normalized text for the
    lifetime of the checkpoint; later sightings only bump state.
    """
    keyed = docs_stream.select(
        F.col(url_col).alias("url"), fingerprint(F.col(text_col)).alias("fp")
    )
    return keyed.groupBy("fp").applyInPandasWithState(
        _first_seen,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_first_seen(
    docs_stream: DataFrame, out_path: str, checkpoint: str, available_now: bool = False
):
    dedup = streaming_first_seen(docs_stream)
    writer = (
        dedup.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
