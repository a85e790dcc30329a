"""Property-based fuzz (hypothesis): total functions stay total and
structural invariants hold on arbitrary inputs."""

import string

from hypothesis import given, settings, strategies as st

from valkey_search_spark.functions.porter2 import porter2_stem
from valkey_search_spark.plans.predicate_translator import damerau_levenshtein

words = st.text(alphabet=string.ascii_lowercase + "'y", min_size=0, max_size=24)


@settings(max_examples=300, deadline=None)
@given(words)
def test_porter2_total_and_shrinking(w):
    s = porter2_stem(w)
    assert isinstance(s, str)
    assert len(s) <= max(len(w), 1)         # stemming never grows a word
    assert "Y" not in s                     # consonant-y marking is undone
    # stable: same input -> same output (no hidden state)
    assert porter2_stem(w) == s


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=0, max_size=12), st.text(min_size=0, max_size=12))
def test_damerau_levenshtein_metric_properties(a, b):
    d = damerau_levenshtein(a, b)
    assert d == damerau_levenshtein(b, a)          # symmetric
    assert d <= max(len(a), len(b))                # bounded by longer string
    if abs(len(a) - len(b)) <= 3:                  # exact regime
        assert (d == 0) == (a == b)
        assert d >= abs(len(a) - len(b))           # length diff lower bound
