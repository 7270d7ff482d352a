"""Streaming sampling operators.

The stateless samplers need no twin: `sampling.assign_splits` and
`sampling.mixture_sample` are pure per-row md5 expressions and run
unchanged on a readStream (batch/stream equality pinned in
tests/test_streaming.py). This module holds the ones that need state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_source_cap(docs, group_col: str, k: int,
                      id_col: str = "doc_id") -> DataFrame:
    """Streaming per-source cap: ADMIT the first ``k`` rows per group
    in arrival order and drop the rest — the ingest-time version of
    `sampling.cap_per_group`. Semantics differ by construction and on
    purpose: the batch cap picks a UNIFORM k-subset of a finished
    corpus (it can see every candidate), a stream must decide on
    arrival without eviction (append-mode sinks can't retract an
    admitted row), so first-k-in-arrival-order is the honest streaming
    cap — the classic admission-control shape. Batch relationship:
    over any prefix of arrivals, admitted == the first min(k, seen)
    rows per group (pinned in tests); run the batch operator over the
    settled corpus when a uniform draw matters.

    Exactly-once: the per-group state is the admitted-id list (<= k
    bigints), so an at-least-once re-delivery of an admitted row is
    emitted ZERO additional times and a post-cap replay admits
    nothing — no extra ledger needed, post-cap arrivals leave no
    trace (the stream_cdc_shared_passages cap argument). State is
    bounded at O(k) per group.

    Emits (group, id) admission records in arrival order — join back
    to the payload stream/corpus downstream (keeping payloads out of
    both state and the sink is what makes the op cheap at any rate).
    """
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    id_type = dict(docs.dtypes).get(id_col)
    if id_type not in ("bigint", "int", "smallint", "tinyint"):
        raise TypeError(
            f"stream_source_cap needs an integral id column, got "
            f"{id_col}: {id_type} — map ids to bigint first (the batch "
            "cap_per_group accepts any id type)")
    base = docs.select(F.col(group_col).cast("string").alias("grp"),
                       F.col(id_col).cast("long").alias("__did"))

    out_schema = "grp string, id bigint"
    state_schema = "ids array<bigint>"

    def fn(key, pdf_iter, state):
        ids = list(state.get[0]) if state.exists else []
        admitted = []
        for pdf in pdf_iter:
            for did in pdf["__did"]:
                if len(ids) >= k:
                    break
                did = int(did)
                if did in ids:
                    continue  # replay of an admitted row: emit nothing
                ids.append(did)
                admitted.append(did)
        state.update((ids,))
        yield pd.DataFrame({"grp": [key[0]] * len(admitted),
                            "id": admitted})

    return (base.groupBy("grp")
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", "NoTimeout"))
