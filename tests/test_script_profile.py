"""Unicode script profiling: pinned against a Python unicodedata-based
scalar reference, plus plan and mixed-script contracts."""
from __future__ import annotations

import unicodedata

import pytest

from valkey_search_spark.operators.textops import _SCRIPTS, script_profile

SAMPLES = {
    1: "The quick brown fox jumps over the lazy dog",
    2: "Съешь же ещё этих мягких французских булок",
    3: "你好世界 这是一个测试文档 汉字内容",
    4: "こんにちは せかい ひらがな だけ",
    5: "안녕하세요 세계 한국어 문서",
    6: "مرحبا بالعالم هذا مستند عربي",
    7: "Hola mundo Привет мир свет 你好世界你好世界",
    8: "12345 !!! ??? ...",
    9: None,
}

# unicodedata has no script property; approximate with codepoint ranges
# good enough for the sample texts (an INDEPENDENT mapping, not Java's)
_RANGES = {
    "latin": [(0x41, 0x5A), (0x61, 0x7A), (0xC0, 0x24F)],
    "cyrillic": [(0x400, 0x4FF)],
    "han": [(0x4E00, 0x9FFF)],
    "hiragana": [(0x3041, 0x3096)],
    "hangul": [(0xAC00, 0xD7A3), (0x1100, 0x11FF)],
    "arabic": [(0x600, 0x6FF)],
}


def _scalar_frac(text, script):
    letters = [c for c in text if unicodedata.category(c).startswith("L")]
    if not letters:
        return 0.0
    n = sum(1 for c in letters
            if any(a <= ord(c) <= b for a, b in _RANGES[script]))
    return n / len(letters)


@pytest.fixture(scope="module")
def prof(spark):
    df = spark.createDataFrame(
        [(k, v) for k, v in SAMPLES.items()], "doc_id int, text string")
    return {r["doc_id"]: r for r in script_profile(df).collect()}


def test_fracs_match_scalar_reference(prof):
    for k, text in SAMPLES.items():
        if text is None:
            continue
        for script in _RANGES:
            got = prof[k][f"script_{script}_frac"]
            want = _scalar_frac(text, script)
            assert got == pytest.approx(want, abs=1e-9), (k, script)


def test_dominant_script(prof):
    assert prof[1]["dominant_script"] == "latin"
    assert prof[2]["dominant_script"] == "cyrillic"
    assert prof[3]["dominant_script"] == "han"
    assert prof[4]["dominant_script"] == "hiragana"
    assert prof[5]["dominant_script"] == "hangul"
    assert prof[6]["dominant_script"] == "arabic"
    assert prof[7]["dominant_script"] is None      # mixed, none >= 0.5
    assert prof[8]["dominant_script"] is None      # no letters at all


def test_no_letters_and_null(prof):
    assert all(prof[8][f"script_{s.lower()}_frac"] == 0.0
               for s in _SCRIPTS)
    assert prof[9]["dominant_script"] is None


def test_plan_map_only_python_free(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    plan = script_profile(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan


def test_threshold_knob(spark):
    df = spark.createDataFrame([(1, SAMPLES[7])], "doc_id int, text string")
    row = script_profile(df, min_dominant_frac=0.3).collect()[0]
    # plurality winner at the lower threshold: cyrillic has the most
    # letters in sample 7 (13 of 31)
    assert row["dominant_script"] == "cyrillic"


def test_script_gate_composes_into_curation(spark):
    from valkey_search_spark.operators.pipeline import (
        CurationConfig, curate_documents,
    )

    rows = [(1, "the quick brown fox jumps over the lazy dog and then "
                "the dog sleeps all day under the warm summer sun there"),
            (2, "Съешь же ещё этих мягких французских булок да выпей же "
                "чаю теперь после долгого дня работы в старом городе"),
            (3, "buy ЗОЛОТО cheap 金金金 now ЗОЛОТО deal 金金金 wow "
                "ЗОЛОТО offer 金金金 click ЗОЛОТО here 金金金 fast "
                "СКИДКА СКИДКА 金金金金")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    clean, funnel = curate_documents(
        df, config=CurationConfig(min_quality=0.0, min_tokens=3,
                                  near_dup_threshold=None,
                                  scripts=("latin",)))
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert kept == {1}     # cyrillic doc and mixed-script spam both fail
    assert funnel["quality_gate"] == 1
