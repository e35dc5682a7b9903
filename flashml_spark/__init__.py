"""flashml_spark — a PySpark-native analytics & AutoML engine.

A ground-up reimplementation of the capabilities of the FlashML AutoML
framework (reference: 247-ai/FlashML, Scala/Spark 2.4), re-expressed as
idiomatic PySpark: DataFrame/SQL declarative plans optimized by Catalyst,
``pyspark.ml`` Pipelines for the feature/model layer, and scale-aware
(broadcast joins, AQE, partial aggregation, no driver-side data loops)
implementations of every operator.

Layout:
    session          SparkSession builder tuned for the engine
    sources          readers (parquet/csv/tsv/json/SQL view chain/JDBC), savepoints
    operators        relational ops, sampling, binning, dedup, similarity, text
    functions        column-expression helpers (vector math, hashing, stability)
    preprocessing    pyspark.ml text-preprocessing Transformers
    features         feature-generation Transformers (ngram/skipgram/...)
    training         estimator factory, OVR/Platt/Uplift/TopK post-processors
    tuning           CrossValidator with fold metrics, HyperBand
    metrics          binary/multiclass/hotlead/PSI/VSI evaluators
    streaming        Structured Streaming variants of the event operators
"""

__version__ = "0.1.0"

from flashml_spark.config import load_config  # noqa: E402
from flashml_spark.experiment import Experiment, ExperimentConfig  # noqa: E402
from flashml_spark.session import get_spark  # noqa: E402

__all__ = ["Experiment", "ExperimentConfig", "get_spark", "load_config", "__version__"]
