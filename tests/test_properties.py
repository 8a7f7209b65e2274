"""Hypothesis property tests over the pure layers (no Spark)."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from new_ent_crawler_spark.operators.dedup import BloomFilter
from new_ent_crawler_spark.oracle import extract as X
from new_ent_crawler_spark.oracle import urlspec as U


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=40), min_size=1, max_size=200))
def test_bloom_never_false_negative(keys):
    bf = BloomFilter.sized(max(len(keys), 16), 0.01)
    for k in keys:
        bf.add(k)
    assert all(bf.might_contain(k) for k in keys)


@settings(max_examples=200, deadline=None)
@given(st.one_of(st.none(), st.integers(), st.text(max_size=30)))
def test_timestamp_format_reference_faithful(ts):
    """13-char inputs go through float() — non-numeric ones raise exactly
    like the reference (parser/DetaiParser.py:1058-1059); everything else is
    total: 年-dates get dashed, the rest map to None."""
    if len(str(ts)) == 13:
        try:
            float(ts)
        except (ValueError, TypeError):
            import pytest as _pytest
            with _pytest.raises((ValueError, TypeError)):
                X.timestamp_format(ts)
            return
    try:
        out = X.timestamp_format(ts)
    except (OverflowError, OSError):
        return  # float overflow epoch — reference raises identically
    if out is not None:
        assert isinstance(out, str)
    if ts is not None and len(str(ts)) != 13 and "年" not in str(ts):
        assert out is None


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_extractors_total(s):
    assert X.get_num_from_str(s) == "".join(c for c in s if c.isdigit()
                                            and c.isascii())
    X.get_font_from_str(s)
    X.remove_html(s)
    X.parse_listing(s)
    X.get_urls(s)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_characters="#?"),
               min_size=1, max_size=50))
def test_canonicalize_idempotent(path):
    url = U.canonicalize("/" + path, "Host.Example")
    assert U.canonicalize(url) == url
    assert url.startswith("http://host.example/")


@settings(max_examples=50, deadline=None)
@given(st.dictionaries(st.sampled_from(["a", "b", "c"]),
                       st.one_of(st.none(), st.integers(), st.text(max_size=8)),
                       max_size=3))
def test_map_row_term_join_totality(tmsg):
    model = {"term": "a-b", "plain": "c"}
    row = X.map_row(model, tmsg)
    assert row["term"] == f"{tmsg.get('a')}-{tmsg.get('b')}"
    assert row["plain"] == tmsg.get("c")
    json.dumps(row)  # always serializable
