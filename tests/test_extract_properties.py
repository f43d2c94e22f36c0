"""Property-based extractor tests (hypothesis): the byte-identical
invariant must hold for ARBITRARY byte inputs, not just well-formed pages
— crawls contain garbage."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tab2neo_spark.extract.html import build_html, extract_text


@given(st.binary(max_size=2000))
@settings(max_examples=300, deadline=None)
def test_extract_total_and_deterministic(data: bytes):
    """Never raises; pure (same input -> same output); output is clean."""
    a = extract_text(data)
    b = extract_text(data)
    assert a == b
    assert isinstance(a, str)
    # normalized: no leading/trailing/space-runs
    assert a == " ".join(a.split()) or a == ""


@given(
    st.text(alphabet=st.characters(blacklist_characters="<>&\x00", blacklist_categories=("Cs",)), max_size=200),
    st.text(alphabet="abcdefghij ", max_size=300),
)
@settings(max_examples=200, deadline=None)
def test_build_extract_roundtrip(title: str, body: str):
    """Any page built around tag/entity-free content extracts to the
    documented template expansion (whitespace-normalized)."""
    from tab2neo_spark.extract.html import extracted_from_built

    html = build_html("u", title, body, "en")
    assert extract_text(html) == extracted_from_built(title, body)


@given(st.text(max_size=500))
@settings(max_examples=200, deadline=None)
def test_extract_idempotent_on_extracted(text: str):
    """Extracting already-extracted text (as bytes) is a fixpoint, modulo
    markup characters that are re-interpreted."""
    once = extract_text(text.encode("utf-8"))
    if "<" not in once and "&" not in once:
        assert extract_text(once.encode("utf-8")) == once
