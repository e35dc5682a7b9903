from flashml_spark.streaming.events import (  # noqa: F401
    read_event_stream,
    streaming_session_stats,
    streaming_window_agg,
)
from flashml_spark.streaming.dedupe import (  # noqa: F401
    corpus_digests,
    streaming_dedup_against_corpus,
    streaming_dedup_exact,
)
from flashml_spark.streaming.joins import streaming_interval_join  # noqa: F401
from flashml_spark.streaming.neardup import (  # noqa: F401
    batch_neardup_curate,
    run_streaming_neardup,
)
from flashml_spark.streaming.sinks import (  # noqa: F401
    read_upsert_snapshot,
    write_stream_parquet,
    write_stream_upsert,
)
from flashml_spark.streaming.drift import (  # noqa: F401
    baseline_fractions,
    batch_windowed_psi,
    quantile_edges,
    windowed_psi,
)
from flashml_spark.streaming.stateful import (  # noqa: F401
    streaming_count_min,
    streaming_hll_distinct,
)
from flashml_spark.streaming.manifest import (  # noqa: F401
    streaming_shard_checksum,
)
from flashml_spark.streaming.packing import (  # noqa: F401
    streaming_token_packer,
)
