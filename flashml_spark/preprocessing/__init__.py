from flashml_spark.preprocessing.transformers import (  # noqa: F401
    TOKEN_DELIMITER,
    CaseNormalizer,
    NullImputer,
    RegexRemover,
    RegexReplacer,
    SentenceMarker,
    StopwordRemover,
    PorterStemmer,
    WordSubstituter,
    build_tokenizer,
)
