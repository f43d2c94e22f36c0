"""Mention detection: gazetteer scan over extracted page text.

The analog of the reference's ``extract_class_entities`` part 2
(model_appliers/model_applier.py:259-295): per source row, project the
mapped value columns into candidate entity rows.  Over webtext the "mapped
column" is the token stream of the text, and the mapping is the gazetteer.

Two execution strategies, picked automatically:

- **alternation fast path** (default when every surface form is a plain
  token): one JVM ``regexp_extract_all`` with the whole gazetteer compiled
  into an alternation pattern, exploding ONLY the hits (~10-30× fewer rows
  than exploding every token), then a broadcast join to attach
  class/term_code.  Measured to scale at ~0.88 efficiency 4->16 cores vs
  ~0.5 for the token-explosion path — at 100 TB this is the difference
  between shuffling hit rows and shuffling every word on the web.
- **token-join path** (``detect_mentions_with_pos`` / surfaces with
  non-token characters): lower-case split + ``posexplode`` + broadcast
  hash join; keeps in-document positions.

Both are pure JVM column expressions + a broadcast join; no Python.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# token = maximal run of letters/digits; everything else separates.
TOKEN_SPLIT_RE = r"[^a-z0-9]+"
# surfaces the alternation fast path supports: one or more plain tokens
# separated by single spaces ("new york" works; regex metachars and
# non-ascii fall outside the token model entirely)
_PLAIN_TOKEN = re.compile(r"^[a-z0-9]+( [a-z0-9]+)*$")


def tokenize_words(df: DataFrame, text_col: str = "text", out_col: str = "word") -> DataFrame:
    """Explode lower-cased text into (pos, word) rows. JVM-only."""
    words = F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)
    return (
        df.select("*", F.posexplode(words).alias("pos", out_col))
        .filter(F.col(out_col) != "")
    )


def gazetteer_pattern(surfaces: list[str]) -> str:
    """Alternation pattern matching any surface as a whole token sequence.

    Longest-first ordering so regex alternation cannot shadow a longer
    surface with a shorter prefix ('order' before 'or'). Multi-word
    surfaces match across ANY non-token separator ('new york' matches
    'new-york', 'new  york'): the token model says adjacency, not a
    literal space. Matches must be normalized back to single-space form
    before gazetteer lookup (:func:`normalize_match`)."""
    members = [
        "[^a-z0-9]+".join(re.escape(t) for t in s.split())
        for s in sorted(surfaces, key=len, reverse=True)
    ]
    return "(?<![a-z0-9])(" + "|".join(members) + ")(?![a-z0-9])"


def normalize_match(col):
    """Collapse the separators inside a pattern match to single spaces so
    it equals the gazetteer's canonical surface form."""
    return F.regexp_replace(col, TOKEN_SPLIT_RE, " ")


def detect_mentions(
    pages: DataFrame,
    gazetteer: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    surfaces: list[str] | None = None,
) -> DataFrame:
    """All gazetteer hits: (id_col, class, surface, term_code).

    The gazetteer is metadata-scale by contract (it is collected to build
    the pattern and broadcast for the attribute join); pass ``surfaces``
    pre-collected to avoid the collect job in per-batch paths. Falls back
    to the positional token-join path if any surface is not a plain token.
    """
    if surfaces is None:
        surfaces = [r["surface"] for r in gazetteer.select("surface").distinct().collect()]
    if not surfaces:
        return pages.sparkSession.createDataFrame(
            [], f"{id_col} string, class string, surface string, term_code string"
        )
    bad = [s for s in surfaces if not _PLAIN_TOKEN.match(s)]
    if bad:
        # a silent wrong answer (token-join can never match multi-word or
        # non-ascii surfaces) is worse than an explicit gap
        raise NotImplementedError(
            f"gazetteer surfaces outside the token model: {bad[:5]} — "
            "lowercase a-z0-9 tokens separated by single spaces are supported"
        )

    pat = gazetteer_pattern(surfaces)
    # single-token surfaces can only match runs of [a-z0-9] — the
    # separator-collapsing normalization is an identity there, and at
    # ~40 hits/doc the per-hit regexp_replace is a measurable term (r6:
    # ~0.5 s over 2M hits at sf1.0). Multi-word gazetteers keep it.
    needs_norm = any(" " in s for s in surfaces)
    raw = F.explode(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pat), 1)
    ).alias("raw_match")
    hits = pages.select(id_col, raw).select(
        id_col,
        (normalize_match(F.col("raw_match")) if needs_norm
         else F.col("raw_match")).alias("surface"),
    )
    return hits.join(F.broadcast(gazetteer), "surface", "inner").select(
        id_col, "class", "surface", "term_code"
    )


def detect_mentions_with_pos(
    pages: DataFrame,
    gazetteer: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
) -> DataFrame:
    """Token-join variant keeping in-document position:
    (id_col, class, surface, term_code, pos)."""
    toks = tokenize_words(pages.select(id_col, text_col), text_col=text_col)
    return (
        toks.join(F.broadcast(gazetteer), toks.word == gazetteer.surface, "inner")
        .select(id_col, "class", "surface", "term_code", "pos")
    )
