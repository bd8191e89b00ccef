"""Golden tests for the analysis chain (FIXTURES.md Table 4)."""

from __future__ import annotations

import pytest

from solr_spark.analysis import porter_stem, standard_tokenize
from solr_spark.analysis.chain import simple_tokenize, text_en, text_general

# Edge cases from FIXTURES.md / SURVEY.md §7 (UAX#29 + chain semantics).
TOKENIZER_GOLDENS = [
    ("don't stop", ["don't", "stop"]),
    ("foo_bar baz", ["foo_bar", "baz"]),          # ExtendNumLet joins
    ("C++ and Java", ["C", "and", "Java"]),
    ("3.14 x2y 1,000", ["3.14", "x2y", "1,000"]),  # MidNum joins
    ("dogs' toys", ["dogs", "toys"]),              # trailing ' not kept
    ("a.b", ["a", "b"]),                           # '.' only joins digits
    ("", []),
    ("  \n\t ", []),
    ("snake_case_name CamelCase kebab-case", ["snake_case_name", "CamelCase", "kebab", "case"]),
]

CHAIN_GOLDENS_EN = [
    ("The quick brown foxes are JUMPING", ["quick", "brown", "fox", "jump"]),
    ("it's John's", ["it", "john"]),             # "it's" -> possessive -> "it"
    ("the and of to", []),                        # stopword-only
    ("Relational databases", ["relat", "databas"]),
]


@pytest.mark.parametrize("text,expected", TOKENIZER_GOLDENS)
def test_standard_tokenizer(text, expected):
    assert standard_tokenize(text) == expected


@pytest.mark.parametrize("text,expected", CHAIN_GOLDENS_EN)
def test_text_en_chain(text, expected):
    assert text_en(text) == expected


def test_max_token_length_chunking():
    long = "a" * 600
    toks = standard_tokenize(long)
    assert toks == ["a" * 255, "a" * 255, "a" * 90]


def test_text_general_is_lowercase_only():
    assert text_general("The Quick") == ["the", "quick"]


def test_simple_tokenize_matches_sql_semantics():
    # Must equal regexp_split_to_array(lower(s), '[^a-z0-9]+') minus empties.
    assert simple_tokenize("Hello, World_x 42!") == ["hello", "world", "x", "42"]
    assert simple_tokenize("") == []


def test_simple_tokenizer_jvm_python_parity(spark):
    """The 'simple' analyzer has two independent implementations — the
    Python chain (`simple_tokenize`) and the JVM column expression
    (`tokens_col`) the index build actually runs. They must agree token-
    for-token, or a query analyzed in Python would miss postings built in
    the JVM. Swept over adversarial unicode: case-mapping edge cases
    (Turkish İ, ß, final sigma), full-width digits, emoji, combining
    marks, length-255 boundaries, and empty/whitespace-only inputs.

    Known ORACLE-side caveat pinned here, not a bug: DuckDB's lower()
    simple-folds 'İ' to 'i' while Python/JVM full case mapping yields
    'i' + U+0307 (which then splits) — the synthetic corpora contain no
    such codepoints, so SQL oracles are unaffected."""
    import pyspark.sql.functions as F

    from solr_spark.functions.dedup import tokens_col

    cases = [
        "", " ", "Hello, World_x 42!", "a" * 300, "ÀÉÎÕÜ çß İı",
        "ΣΙΣΥΦΟΣ σίσυφος", "ＦＵＬＬｗｉｄｔｈ１２３", "emoji 🎉 mix42",
        "tab\tnew\nline", "'quoted' \"dq\"",
        "CamelCase kebab-case snake_case", "12,345.67 3.14e10",
        "mixedМИР世界abc", "a0b1c2", "---", "0", "null", "None",
        "İSTANBUL istanbul", "ß SS ss", "x" * 255 + "!" + "y" * 10,
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "i long, t string"
    )
    got = {
        r["i"]: list(r["toks"])
        for r in df.select("i", tokens_col(F.col("t")).alias("toks")).collect()
    }
    for i, s in enumerate(cases):
        assert got[i] == simple_tokenize(s), repr(s)


# Published Porter test vocabulary spot checks (tartarus vocabulary).
PORTER_GOLDENS = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("cats", "cat"), ("feed", "feed"), ("agreed", "agre"),
    ("plastered", "plaster"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("hopping", "hop"), ("falling", "fall"),
    ("happy", "happi"), ("sky", "sky"), ("relational", "relat"),
    ("rational", "ration"), ("digitizer", "digit"), ("operator", "oper"),
    ("feudalism", "feudal"), ("decisiveness", "decis"),
    ("triplicate", "triplic"), ("formative", "form"),
    ("electriciti", "electr"), ("hopeful", "hope"), ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("adjustable", "adjust"), ("replacement", "replac"),
    ("adoption", "adopt"), ("communism", "commun"), ("activate", "activ"),
    ("effective", "effect"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"), ("ion", "ion"), ("a", "a"),
]


@pytest.mark.parametrize("word,stem", PORTER_GOLDENS)
def test_porter(word, stem):
    assert porter_stem(word) == stem
