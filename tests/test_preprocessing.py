"""Preprocessing transformer unit tests (mirrors the reference's
``functionalTests/PreprocessingTest.scala`` strategy: expected transformed
strings on small inputs)."""

from __future__ import annotations

import pytest

from flashml_spark.preprocessing import (
    TOKEN_DELIMITER,
    CaseNormalizer,
    NullImputer,
    PorterStemmer,
    RegexRemover,
    RegexReplacer,
    SentenceMarker,
    StopwordRemover,
    WordSubstituter,
    build_tokenizer,
)
from flashml_spark.preprocessing.porter import stem
from flashml_spark.preprocessing.transformers import word_class_patterns


@pytest.mark.parametrize(
    "word,expected",
    [
        ("caresses", "caress"),
        ("ponies", "poni"),
        ("ties", "ti"),
        ("caress", "caress"),
        ("cats", "cat"),
        ("feed", "feed"),
        ("agreed", "agre"),
        ("plastered", "plaster"),
        ("motoring", "motor"),
        ("sing", "sing"),
        ("conflated", "conflat"),
        ("troubling", "troubl"),
        ("sized", "size"),
        ("hopping", "hop"),
        ("falling", "fall"),
        ("hissing", "hiss"),
        ("failing", "fail"),
        ("happy", "happi"),
        ("relational", "relat"),
        ("conditional", "condit"),
        ("rational", "ration"),
        ("digitizer", "digit"),
        ("operator", "oper"),
        ("feudalism", "feudal"),
        ("hopefulness", "hope"),
        ("formaliti", "formal"),
        ("triplicate", "triplic"),
        ("formative", "form"),
        ("formalize", "formal"),
        ("electrical", "electr"),
        ("hopeful", "hope"),
        ("goodness", "good"),
        ("revival", "reviv"),
        ("allowance", "allow"),
        ("inference", "infer"),
        ("airliner", "airlin"),
        ("adjustment", "adjust"),
        ("dependent", "depend"),
        ("adoption", "adopt"),
        ("activate", "activ"),
        ("angulariti", "angular"),
        ("effective", "effect"),
        ("probate", "probat"),
        ("rate", "rate"),
        ("cease", "ceas"),
        ("controll", "control"),
        ("roll", "roll"),
    ],
)
def test_porter_stem(word, expected):
    assert stem(word) == expected


def test_case_normalizer(spark):
    df = spark.createDataFrame([("Hello WORLD",)], ["t"])
    out = CaseNormalizer(inputCol="t", outputCol="o")._transform(df).first()
    assert out["o"] == "hello world"


def test_sentence_marker(spark):
    df = spark.createDataFrame([("hi there",)], ["t"])
    out = SentenceMarker(inputCol="t", outputCol="o").transform(df).first()
    assert out["o"] == "_class_ss hi there _class_se"


def test_regex_replacer_ordered(spark):
    df = spark.createDataFrame([("abc 123 def",)], ["t"])
    stage = RegexReplacer(
        inputCol="t", outputCol="o", patterns=[r"\d+", "abc"], replacements=["_NUM_", "xyz"]
    )
    assert stage.transform(df).first()["o"] == "xyz _NUM_ def"


def test_word_class_patterns(spark):
    pats, reps = word_class_patterns({"greet": ["hello", "hi"], "who": ["world"]})
    df = spark.createDataFrame([("Hello world, hi!",)], ["t"])
    stage = RegexReplacer(inputCol="t", outputCol="o", patterns=pats, replacements=reps)
    assert stage.transform(df).first()["o"] == "_class_greet _class_who, _class_greet!"


def test_regex_remover(spark):
    df = spark.createDataFrame([("a1b2c3",)], ["t"])
    assert RegexRemover(inputCol="t", outputCol="o", patterns=[r"\d"]).transform(df).first()[
        "o"
    ] == "abc"


def test_stopword_remover(spark):
    text = TOKEN_DELIMITER.join(["The", "quick", "the", "fox"])
    df = spark.createDataFrame([(text,)], ["t"])
    out = StopwordRemover(inputCol="t", outputCol="o", stopwords=["the"]).transform(df).first()
    assert out["o"] == TOKEN_DELIMITER.join(["quick", "fox"])


def test_word_substituter_multiword(spark):
    text = TOKEN_DELIMITER.join(["can't", "stop"])
    df = spark.createDataFrame([(text,)], ["t"])
    out = (
        WordSubstituter(inputCol="t", outputCol="o", dictionary={"can't": "can not"})
        .transform(df)
        .first()
    )
    assert out["o"] == TOKEN_DELIMITER.join(["can", "not", "stop"])


def test_porter_stemmer_transformer(spark):
    text = TOKEN_DELIMITER.join(["running", "_class_num", "quickly"])
    df = spark.createDataFrame([(text,)], ["t"])
    out = PorterStemmer(inputCol="t", outputCol="o").transform(df).first()
    assert out["o"] == TOKEN_DELIMITER.join(["run", "_class_num", "quickli"])


def test_null_imputer(spark):
    df = spark.createDataFrame([(1, None), (2, 5.0)], "id int, v double")
    out = NullImputer(inputCol="v", fillValue="0.0").transform(df)
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["v"] == 0.0 and rows[1]["imputerCol_v"] == 1
    assert rows[2]["v"] == 5.0 and rows[2]["imputerCol_v"] == 0


def test_tokenizer_delimiter(spark):
    text = "hello" + TOKEN_DELIMITER + "big world"
    df = spark.createDataFrame([(text,)], ["t"])
    out = build_tokenizer("t", "toks").transform(df).first()
    assert out["toks"] == ["hello", "big", "world"]


def test_pipeline_roundtrip(spark, tmp_path):
    """Custom stages must survive Pipeline save/load (MLWritable contract)."""
    from pyspark.ml import Pipeline

    df = spark.createDataFrame([("The Cat RUNS",)], ["t"])
    pipe = Pipeline(
        stages=[
            CaseNormalizer(inputCol="t", outputCol="lc"),
            RegexReplacer(inputCol="lc", outputCol="o", patterns=["cat"], replacements=["dog"]),
        ]
    )
    model = pipe.fit(df)
    path = str(tmp_path / "pipe")
    model.save(path)
    from pyspark.ml import PipelineModel

    reloaded = PipelineModel.load(path)
    assert reloaded.transform(df).first()["o"] == "the dog runs"


def test_build_preprocessing_chain_e2e(spark):
    # reference PGUP config chain: nullcheck -> case_normalization ->
    # tokenizer('/') — the output is a token array ready to vectorize
    from pyspark.ml import Pipeline

    from flashml_spark.preprocessing.transformers import (
        build_preprocessing_chain,
    )

    step = {
        "inputVariable": "url",
        "outputVariable": "url1",
        "transformations": [
            {"type": "nullcheck", "parameter": ""},
            {"type": "case_normalization"},
            {"type": "tokenizer", "parameter": "/"},
        ],
    }
    stages, final_col, tokenized = build_preprocessing_chain(step)
    assert final_col == "url1" and tokenized
    df = spark.createDataFrame(
        [("HTTP://A/B",), (None,)], "url string"
    )
    out = Pipeline(stages=stages).fit(df).transform(df).collect()
    rows = {tuple(r["url1"]) for r in out}
    assert ("http:", "a", "b") in rows
    assert () in rows or ("",) in rows  # imputed empty string tokenizes
    # nullcheck indicator column present
    assert "imputerCol_url" in Pipeline(stages=stages).fit(df).transform(df).columns


def test_build_preprocessing_chain_string_chain(spark):
    # chain without tokenizer stays String -> String
    from pyspark.ml import Pipeline

    from flashml_spark.preprocessing.transformers import (
        build_preprocessing_chain,
    )

    step = {
        "inputVariable": "t",
        "outputVariable": "t_clean",
        "transformations": [
            {"type": "case_normalization"},
            {"type": "regex_removal", "parameter": ["[0-9]+"]},
        ],
    }
    stages, final_col, tokenized = build_preprocessing_chain(step)
    assert final_col == "t_clean" and not tokenized
    df = spark.createDataFrame([("AbC123",)], "t string")
    got = Pipeline(stages=stages).fit(df).transform(df).collect()[0]["t_clean"]
    assert got == "abc"


def test_build_preprocessing_chain_rejects_unknown():
    import pytest as _pytest

    from flashml_spark.preprocessing.transformers import (
        build_preprocessing_chain,
    )

    with _pytest.raises(ValueError, match="unknown preprocessing"):
        build_preprocessing_chain(
            {"inputVariable": "t", "transformations": [{"type": "nope"}]}
        )
