"""Mention detection: gazetteer scan over extracted page text.

The analog of the reference's ``extract_class_entities`` part 2
(model_appliers/model_applier.py:259-295): per source row, project the
mapped value columns into candidate entity rows.  Over webtext the "mapped
column" is the token stream of the text, and the mapping is the gazetteer.

Execution model (scale-first):

- tokenization is a pure JVM column expression (``split`` + ``posexplode``)
  — whole-stage-codegen'd, no Python;
- the gazetteer is tiny -> **broadcast hash join**; the token explosion
  never shuffles (narrow until the join, and the join itself is
  broadcast, so the big side stays in place);
- output carries (url, class, surface, pos) — pos gives in-document
  position for downstream dedup/scoring, url is the FROM_DATA provenance
  (model_applier.py:259-295's FROM_DATA edge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# token = maximal run of letters/digits; everything else separates.
TOKEN_SPLIT_RE = r"[^a-z0-9]+"


def tokenize_words(df: DataFrame, text_col: str = "text", out_col: str = "word") -> DataFrame:
    """Explode lower-cased text into (pos, word) rows. JVM-only."""
    words = F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)
    return (
        df.select("*", F.posexplode(words).alias("pos", out_col))
        .filter(F.col(out_col) != "")
    )


def detect_mentions(
    pages: DataFrame,
    gazetteer: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
) -> DataFrame:
    """All gazetteer hits: (id_col, class, surface, term_code, pos).

    Broadcast hash join against the dictionary; the pages side never
    shuffles. At 100 TB this is a map-only stage.
    """
    toks = tokenize_words(pages.select(id_col, text_col), text_col=text_col)
    return (
        toks.join(F.broadcast(gazetteer), toks.word == gazetteer.surface, "inner")
        .select(id_col, "class", "surface", "term_code", "pos")
    )
