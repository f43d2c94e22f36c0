"""Property-based tests (hypothesis) for the round-5 pure-Python
codecs/parsers: xlsx write->read, TTL method-graph round-trip, and the
pigeonhole-complete simhash blocking. Each has an in-repo encoder, so
random round-trips explore the space fixed examples can't."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

# -- xlsx --------------------------------------------------------------------

_NAME = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"), blacklist_characters="\r\n\t"
    ),
    min_size=1,
    max_size=12,
)


@st.composite
def _xlsx_frames(draw):
    n_rows = draw(st.integers(min_value=1, max_value=6))
    names = draw(
        st.lists(_NAME, min_size=1, max_size=4, unique=True)
    )
    cols = {}
    for name in names:
        kind = draw(st.sampled_from(["int", "float", "str", "bool"]))
        if kind == "int":
            vals = draw(st.lists(st.integers(-(2**53), 2**53),
                                 min_size=n_rows, max_size=n_rows))
        elif kind == "float":
            vals = draw(st.lists(
                st.floats(allow_nan=False, allow_infinity=False, width=64),
                min_size=n_rows, max_size=n_rows))
        elif kind == "bool":
            vals = draw(st.lists(st.booleans(),
                                 min_size=n_rows, max_size=n_rows))
        else:
            vals = draw(st.lists(
                st.text(alphabet=st.characters(
                    blacklist_categories=("Cs", "Cc")), max_size=20),
                min_size=n_rows, max_size=n_rows))
        cols[name] = vals
    return pd.DataFrame(cols)


@settings(max_examples=40, deadline=None)
@given(_xlsx_frames())
def test_xlsx_roundtrip_property(tmp_path_factory, df):
    from tab2neo_spark.sources.xlsx import read_xlsx, write_xlsx

    p = str(tmp_path_factory.mktemp("xl") / "t.xlsx")
    write_xlsx(p, {"S": df})
    got = read_xlsx(p)
    assert list(got.columns) == [str(c) for c in df.columns]
    for c in df.columns:
        exp = df[c].tolist()
        act = got[c].tolist()
        for e, a in zip(exp, act):
            if isinstance(e, bool):
                assert a is True or a is False
                assert a == e
            elif isinstance(e, str):
                # every string (incl. '') round-trips via shared strings
                assert a == e
            elif isinstance(e, int):
                assert int(a) == e
            else:
                assert a == e or abs(a - e) < 1e-9 * max(1.0, abs(e))


# -- TTL method round-trip ----------------------------------------------------

_KEY = st.from_regex(r"[a-z][a-z0-9_]{0,9}", fullmatch=True)
_SCALAR = st.one_of(
    st.integers(-(2**31), 2**31 - 1),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.booleans(),
    st.text(alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
            max_size=20),
    st.text(alphabet='"\\\n\t #;,.<>', max_size=8),  # escaping stress
)
_PARAM = st.one_of(
    _SCALAR,
    st.lists(_SCALAR, max_size=3),
    st.dictionaries(_KEY, _SCALAR, max_size=3),
)


@st.composite
def _methods(draw):
    n = draw(st.integers(min_value=1, max_value=4))
    actions = []
    for _ in range(n):
        a = {"type": "get_data"}
        for k in draw(st.lists(_KEY, max_size=3, unique=True)):
            # 'id' == type is the reference's display form from_ttl strips
            if k not in ("type", "id"):
                a[k] = draw(_PARAM)
        actions.append(a)
    return {"name": draw(_KEY), "actions": actions}


@settings(max_examples=30, deadline=None)
@given(_methods())
def test_ttl_method_roundtrip_property(spark, spec):
    from tab2neo_spark.pipeline.runner import DerivationMethod

    td = spark.createDataFrame([("S1", 1)], "Subject string, Age int")
    m = DerivationMethod(spark, spec, source_df=td)
    m2 = DerivationMethod.from_ttl(spark, m.to_ttl(), source_df=td)
    assert m2.name == m.name
    assert m2.actions == m.actions


# -- simhash blocking completeness -------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(0, 2**16 - 1), min_size=2, max_size=25, unique=True),
    st.integers(min_value=1, max_value=3),
)
def test_simhash_blocking_complete_property(spark, fps_vals, d):
    import warnings

    from tab2neo_spark.operators.dedup import simhash_pairs_from_fps

    fps = spark.createDataFrame(
        [(i, v) for i, v in enumerate(fps_vals)], "doc_id long, simhash long"
    )
    exp = sorted(
        (a, b, bin(fps_vals[a] ^ fps_vals[b]).count("1"))
        for a in range(len(fps_vals))
        for b in range(a + 1, len(fps_vals))
        if bin(fps_vals[a] ^ fps_vals[b]).count("1") <= d
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # narrow-block warning expected
        got = sorted(
            map(
                tuple,
                simhash_pairs_from_fps(
                    fps, "doc_id", bits=16, max_hamming=d
                ).collect(),
            )
        )
    assert got == exp
