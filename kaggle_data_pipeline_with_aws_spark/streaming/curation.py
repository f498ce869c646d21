"""Streaming curation: per-domain frequency cap with cross-batch state.

The batch cap (``operators/domains.cap_per_domain``, registered as
d158) selects the global hash-min rows per domain — correct when the
whole corpus is visible. An INGEST pipeline sees documents arrive in
micro-batches and must decide admit/drop per document as it lands;
the cap state (how many docs each domain has already placed) lives in
the Spark state store, keyed by domain, exactly like the running-stats
operator in ``stateful.py``:

- **Keyed state, never a driver dict** — per-domain admitted counts
  are ``applyInPandasWithState`` GroupState, partitioned by domain
  across executors; a hot crawl of one domain scales like any other
  hot key.
- **Deterministic within a batch** — each micro-batch's candidates
  for a domain are ranked by the same salted portable hash (ties by
  key) the batch cap uses, so a replayed batch admits the same rows.
- **Arrival-order across batches** — earlier batches win remaining
  slots; that IS the streaming semantics (an ingest gate can't
  reclaim a slot from a doc it already admitted). With everything in
  one batch the admitted set equals the batch operator's selection
  for every domain (pinned by test).

Reference scope: the reference's only cross-cycle state is the
per-file ledger (SURVEY §2.9); per-record admission state is part of
the beyond-reference streaming surface.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

ADMITTED_SCHEMA = StructType(
    [
        StructField("domain", StringType()),
        StructField("doc_id", LongType()),
        StructField("admit_rank", LongType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("n_admitted", LongType())])


def _cap_hash(key: int, salt: str = "cap") -> int:
    """Python twin of operators/text.portable_hash over 'cap|<key>' —
    the same ranking the batch operator applies, so a single-batch
    stream admits exactly the batch selection."""
    return (
        int(hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:15], 16)
        % 2_147_483_647
    )


def _make_admit_fn(cap: int):
    def _admit(
        key: tuple, batch_iter: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        (n_admitted,) = state.get if state.exists else (0,)
        ids: list[int] = []
        for pdf in batch_iter:
            ids.extend(int(x) for x in pdf["doc_id"])
        ids.sort(key=lambda i: (_cap_hash(i), i))
        take = ids[: max(cap - n_admitted, 0)]
        state.update((n_admitted + len(take),))
        if take:
            yield pd.DataFrame(
                {
                    "domain": [key[0]] * len(take),
                    "doc_id": take,
                    "admit_rank": [
                        n_admitted + i + 1 for i in range(len(take))
                    ],
                }
            )

    return _admit


def streaming_domain_cap(docs: DataFrame, cap: int) -> DataFrame:
    """Admit at most ``cap`` documents per domain across the life of
    the stream. ``docs`` must be a streaming DataFrame with columns
    ``doc_id, domain``. Emits one row per ADMITTED doc with its
    admission rank; dropped docs emit nothing."""
    return docs.groupBy("domain").applyInPandasWithState(
        _make_admit_fn(cap),
        outputStructType=ADMITTED_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
