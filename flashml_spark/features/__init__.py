from flashml_spark.features.generators import (  # noqa: F401
    CategoricalConcat,
    GramAssembler,
    SkipGramGenerator,
    build_ngram_stages,
)
