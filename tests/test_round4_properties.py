"""Property-based tests (hypothesis) for the round-4 pure-Python codecs:
R serialization and baseline JPEG. Both have in-repo encoders, so random
round-trips explore the space fixed examples can't."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

# -- rdata -------------------------------------------------------------------

_CELL = st.one_of(
    st.none(),
    st.integers(min_value=-(2**31) + 1, max_value=2**31 - 1),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=20
    ),
    st.booleans(),
)


@st.composite
def _frames(draw):
    n_rows = draw(st.integers(min_value=0, max_value=6))
    n_cols = draw(st.integers(min_value=1, max_value=4))
    cols = {}
    for i in range(n_cols):
        kind = draw(st.sampled_from(["int", "float", "str", "bool"]))
        if kind == "int":
            vals = draw(st.lists(
                st.one_of(st.none(), st.integers(-(2**31) + 1, 2**31 - 1)),
                min_size=n_rows, max_size=n_rows))
        elif kind == "float":
            vals = draw(st.lists(
                st.one_of(st.none(),
                          st.floats(allow_nan=False, allow_infinity=False)),
                min_size=n_rows, max_size=n_rows))
        elif kind == "bool":
            vals = draw(st.lists(st.one_of(st.none(), st.booleans()),
                                 min_size=n_rows, max_size=n_rows))
        else:
            vals = draw(st.lists(
                st.one_of(st.none(), st.text(
                    alphabet=st.characters(blacklist_categories=("Cs",)),
                    max_size=12)),
                min_size=n_rows, max_size=n_rows))
        cols[f"C{i}"] = (kind, vals)
    return cols


@given(_frames())
@settings(max_examples=40, deadline=None)
def test_rdata_roundtrip_property(tmp_path_factory, cols):
    from tab2neo_spark.sources.rdata import read_r, write_rds

    df = pd.DataFrame({name: pd.Series([v for v in vals], dtype=object)
                       for name, (kind, vals) in cols.items()})
    path = str(tmp_path_factory.mktemp("rda") / "x.rds")
    write_rds(path, df)
    got = read_r(path)[None]
    assert list(got.columns) == list(df.columns)
    assert len(got) == len(df)
    for name, (kind, vals) in cols.items():
        for i, v in enumerate(vals):
            g = got[name].iloc[i] if len(got) else None
            if v is None:
                assert g is None or pd.isna(g)
            elif kind == "float":
                assert g == float(v)
            elif kind == "bool":
                assert bool(g) == v
            elif kind == "int":
                # all-None-except columns may round-trip as float (pandas
                # inference); the VALUE must be exact either way
                assert g == v
            else:
                assert g == str(v)


# -- jpeg --------------------------------------------------------------------


@given(
    st.integers(min_value=1, max_value=33),
    st.integers(min_value=1, max_value=33),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=30, deadline=None)
def test_jpeg_gray_roundtrip_property(h, w, seed):
    """Any size (including non-multiples of 8 and 1-pixel edges), any
    content: encode at quant=1 -> decode recovers within DCT rounding."""
    from tab2neo_spark.operators.jpeg import decode_jpeg, encode_jpeg_gray

    img = np.random.RandomState(seed).randint(0, 256, (h, w), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_gray(img, 1))
    assert out.shape == (h, w)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1
