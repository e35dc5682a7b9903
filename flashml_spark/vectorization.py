"""Vectorization layer (SURVEY §2.8, ``core/VectorizationEngine.scala``).

Four text-vectorization methods + categorical vectorization + final
assembly, all stock ``pyspark.ml.feature`` stages:

  * hashingtf         — ``HashingTF(numFeatures=slots)``      (:193-196)
  * count_vectorizer  — ``CountVectorizer(vocabSize=slots)``  (:198-201)
  * word2vec          — ``Word2Vec(vectorSize=slots)``        (:203-206)
  * tfidf             — ``CountVectorizer`` → ``IDF``         (:208-216)

Assembly: text vector cols + categorical vector col + raw numerical cols,
with the uplift treatment variable kept as the LAST slot
(``VectorizationEngine.scala:139-150``; ``UpliftTransformer.scala:123-129``
flips that slot at scoring time).
"""

from __future__ import annotations

from pyspark.ml.feature import (
    IDF,
    CountVectorizer,
    HashingTF,
    VectorAssembler,
    Word2Vec,
)

TEXT_METHODS = ("hashingtf", "count_vectorizer", "word2vec", "tfidf")


def build_text_vectorizer(
    method: str, input_col: str, output_col: str, slots: int = 1000, seed: int = 999
) -> list:
    """Stages vectorizing one token-array column."""
    method = method.lower()
    if method == "hashingtf":
        return [HashingTF(inputCol=input_col, outputCol=output_col, numFeatures=slots)]
    if method == "count_vectorizer":
        return [CountVectorizer(inputCol=input_col, outputCol=output_col, vocabSize=slots)]
    if method == "word2vec":
        return [
            Word2Vec(inputCol=input_col, outputCol=output_col, vectorSize=slots, seed=seed)
        ]
    if method == "tfidf":
        tf_col = f"{output_col}_tf"
        return [
            CountVectorizer(inputCol=input_col, outputCol=tf_col, vocabSize=slots),
            IDF(inputCol=tf_col, outputCol=output_col),
        ]
    raise ValueError(f"unknown vectorization method {method!r}; pick from {TEXT_METHODS}")


def build_assembler(
    text_vec_cols: list[str],
    categorical_vec_col: str | None = None,
    numerical_cols: list[str] | None = None,
    treatment_col: str | None = None,
    output_col: str = "features",
) -> VectorAssembler:
    """Final feature assembly; the treatment variable (uplift) must stay
    the LAST assembled slot."""
    cols = list(text_vec_cols)
    if categorical_vec_col:
        cols.append(categorical_vec_col)
    cols.extend(numerical_cols or [])
    if treatment_col:
        cols.append(treatment_col)
    return VectorAssembler(inputCols=cols, outputCol=output_col)
