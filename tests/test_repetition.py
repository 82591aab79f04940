"""Gopher A1.2 repetition signals (operators/repetition.py): known-value
planted cases for every signal family, plus the zero floor."""

import pytest

from fabstir_vectordb_spark.operators.repetition import (
    GOPHER_REPETITION_THRESHOLDS,
    repetition_signals,
)


def _signals(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return repetition_signals(df).first().asDict()


def test_duplicate_lines_and_chars(spark):
    # 4 lines: 'aa' twice (dup), 'bbb', 'c' -> dup_line 2/4; chars 4/(2+2+3+1)
    got = _signals(spark, "aa\nbbb\naa\nc")
    assert got["dup_line_frac"] == pytest.approx(0.5)
    assert got["dup_line_char_frac"] == pytest.approx(4 / 8)
    assert got["dup_para_frac"] == 0.0  # one paragraph (no blank line)


def test_duplicate_paragraphs(spark):
    text = "para one here\n\npara two\n\npara one here"
    got = _signals(spark, text)
    assert got["dup_para_frac"] == pytest.approx(2 / 3)
    assert got["dup_para_char_frac"] == pytest.approx(26 / 34)


def test_top_and_dup_ngram_char_fractions(spark):
    # 'x y' bigram occurs 3x in 'x y x y x y' (len 11); top-2gram
    # winner 'x y' (len 3): 3*3/11
    got = _signals(spark, "x y x y x y")
    assert got["top_2gram_char_frac"] == pytest.approx(9 / 11)
    # 5-grams: 'x y x y x' (2x... occurrences: positions 0..1) ->
    # grams at i=0 'x y x y x', i=1 'y x y x y' — both unique -> 0
    assert got["dup_5gram_char_frac"] == 0.0


def test_dup_ngram_counts_repeats(spark):
    words = "a b c d e " * 3  # 'a b c d e' 5-gram repeats
    got = _signals(spark, words.strip())
    assert got["dup_5gram_char_frac"] > 0.0


def test_clean_prose_stays_under_thresholds(spark):
    """dup_* signals are exactly zero without repeats; top_* count even a
    single occurrence (the paper's definition), so a SHORT doc is always
    top-heavy — the thresholds assume page-length text, hence the
    repetition-free 150-distinct-word document here."""
    text = " ".join(f"w{i:03d}" for i in range(150))
    got = _signals(spark, text)
    for name, thresh in GOPHER_REPETITION_THRESHOLDS.items():
        if name.startswith("dup_"):
            assert got[name] == 0.0, name
        assert got[name] < thresh, name


def test_empty_and_blank_documents(spark):
    for text in ("", "   ", "\n\n\n"):
        got = _signals(spark, text)
        for name in GOPHER_REPETITION_THRESHOLDS:
            assert got[name] == 0.0, (text, name)


def test_threshold_names_match_columns(spark):
    got = _signals(spark, "some text here")
    assert set(GOPHER_REPETITION_THRESHOLDS) <= set(got)


def test_whitespace_semantics_match_sql_oracle(spark):
    """The kernel's whitespace rules are pinned to the DuckDB oracle's:
    blank-unit filter is trim() (spaces ONLY — a tab-only line counts
    as a unit), word split is the ASCII RE2 \\s class (\\xa0 is a word
    character, not a separator)."""
    # lines: 'aa', '\t', 'aa', '\t' -> every line duplicated (a
    # Unicode-aware strip() would have dropped the tab lines)
    got = _signals(spark, "aa\n\t\naa\n\t")
    assert got["dup_line_frac"] == pytest.approx(1.0)
    # words: NBSP does not split, so the doc is 3 repeats of ONE word
    # 'q\xa0w'; top 2-gram 'q\xa0w q\xa0w' occurs 2x, len 7, text len 11
    got = _signals(spark, "q\xa0w q\xa0w q\xa0w")
    assert got["top_2gram_char_frac"] == pytest.approx(2 * 7 / 11)
