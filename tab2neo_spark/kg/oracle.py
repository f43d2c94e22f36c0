"""Pandas oracle: the reference-semantics triple extractor.

An independent, single-node reimplementation of what the KG pipeline must
compute, used by tests to score triple precision/recall (BASELINE metric:
P/R >= 0.95) and the byte-identical text invariant.  It deliberately goes
through plain Python dict/set code — not Spark, not SQL — so agreement is
meaningful.
"""

from __future__ import annotations

import re

import pandas as pd

from tab2neo_spark.extract.html import extract_text
from tab2neo_spark.model.gazetteer import GAZETTEER, SAME_AS

_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def canonical_lookup() -> dict[str, str]:
    """surface -> canonical via union-find over SAME_AS (both directions)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in SAME_AS:
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-representative, matching hash-min CC semantics
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {s: find(s) for s in list(parent)}


def oracle_triples(pages: pd.DataFrame) -> set[tuple[str, str, str]]:
    """Expected triple set for a pandas pages frame (url, html)."""
    gaz = {surface: cls for cls, surface, _ in GAZETTEER}
    canon = canonical_lookup()
    triples: set[tuple[str, str, str]] = set()
    for _, row in pages.iterrows():
        text = extract_text(row["html"])
        if text is None:
            continue
        for tok in _TOKEN_RE.split(text.lower()):
            if tok in gaz:
                cls = gaz[tok]
                c = canon.get(tok, tok)
                triples.add((row["url"], "MENTIONS", f"{cls}:{c}"))
                triples.add((f"{cls}:{c}", "IS_A", cls))
    return triples


def precision_recall(
    got: set[tuple[str, str, str]], expected: set[tuple[str, str, str]]
) -> tuple[float, float]:
    if not got or not expected:
        return (0.0, 0.0)
    tp = len(got & expected)
    return tp / len(got), tp / len(expected)
