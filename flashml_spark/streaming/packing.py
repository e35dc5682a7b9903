"""Streaming token-stream packer — the incremental twin of
``operators.textops.token_stream_spans(n_shards=...)``.

A continuously-ingesting pretraining pipeline packs documents into
fixed-length token sequences as they arrive; the only state that needs
to survive between micro-batches is each shard's RUNNING STREAM OFFSET
(one BIGINT per shard).  Documents route to ``shard = id % n_shards``
and each shard packs independently, so the packer parallelizes across
shards exactly like the batch keyed-window layout — there is no global
order anywhere.

Convergence contract (the x257 manifest discipline): when documents
arrive in ``id`` order within their shard (micro-batches are sorted
internally; the test harness feeds id-ordered files), the emitted span
rows are INTEGER-EXACT equal to the batch
``token_stream_spans(..., n_shards=n)`` of everything ingested — same
sequences, same offsets, same boundary flags.  Out-of-id-order arrival
packs in arrival order instead (each doc still gets a contiguous span;
only the doc→sequence assignment differs from the batch layout), which
is the honest semantics of an order-sensitive writer.

Tokenization parity: the Spark-side ``split(lower(trim(text)),
'\\s+')`` trims ASCII SPACE only (Spark ``trim``) and splits on the
JAVA ``\\s`` class ``[ \\t\\n\\x0b\\f\\r]`` (ASCII only).  The Python
mirror therefore strips only ``' '`` and splits on the same explicit
ASCII class — NOT ``str.strip()``/Python ``\\s``, which are
Unicode-wide and would count ``'\\nfoo'`` or NBSP-joined words
differently, silently diverging the stream offsets from the batch
layout.  Includes the single-empty-token result for empty/all-space
text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

def py_token_count(text: object) -> int:
    """Driver/worker-side token count, a LITERAL mirror of the engine's
    Spark expression ``size(split(lower(trim(text)), '\\s+'))`` — see
    :func:`flashml_spark.functions.hashing.py_tokens` for the exact
    ASCII-whitespace semantics.  Pinned against the Spark expression
    by ``test_py_token_count_matches_spark_tokens``."""
    from flashml_spark.functions.hashing import py_tokens

    return len(py_tokens(text))


_OUT_SCHEMA = (
    "shard long, doc_id long, seq long, start_off long, end_off long,"
    " span_tokens long, starts_here int, ends_here int"
)
_STATE_SCHEMA = "offset long"


def streaming_token_packer(
    stream: DataFrame,
    text_col: str,
    id_col: str,
    seq_len: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """Stateful per-shard packer: one ``applyInPandasWithState`` keyed
    by shard, state = the shard's next stream offset.  Emits one row
    per (doc x covered sequence) with the batch span schema plus the
    shard key.

    Scale shape: |shards| state rows total; per micro-batch each shard
    task does one local sort + linear arithmetic over its documents.
    """
    L = int(seq_len)
    if L <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (offset,) = state.get if state.exists else (0,)
        shard = int(key[0])
        out: dict[str, list] = {
            "shard": [], "doc_id": [], "seq": [], "start_off": [],
            "end_off": [], "span_tokens": [], "starts_here": [],
            "ends_here": [],
        }
        for pdf in pdfs:
            pdf = pdf[pdf[text_col].notna()].sort_values(id_col)
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                n = py_token_count(text)
                start, end = offset, offset + n
                offset = end
                for seq in range(start // L, (end - 1) // L + 1):
                    lo = max(start, seq * L)
                    hi = min(end, (seq + 1) * L)
                    out["shard"].append(shard)
                    out["doc_id"].append(int(doc_id))
                    out["seq"].append(seq)
                    out["start_off"].append(lo)
                    out["end_off"].append(hi)
                    out["span_tokens"].append(hi - lo)
                    out["starts_here"].append(int(start // L == seq))
                    out["ends_here"].append(int((end - 1) // L == seq))
        state.update((offset,))
        if out["shard"]:
            yield pd.DataFrame(out)

    keyed = stream.select(
        (F.col(id_col) % n_shards).cast("bigint").alias("__shard"),
        F.col(id_col),
        F.col(text_col),
    )
    return keyed.groupBy("__shard").applyInPandasWithState(
        update,
        outputStructType=StructType.fromDDL(_OUT_SCHEMA),
        stateStructType=StructType.fromDDL(_STATE_SCHEMA),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
