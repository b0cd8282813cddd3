"""Property tests (hypothesis) for the two r9 byte codecs: the Avro
object-container-file codec and the deletion-vector payload. Both are
pure Python — no Spark session — so these run wide and fast."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from lakehouse_poc_spark.sources.avro import (
    read_avro_file,
    write_avro_file,
)
from lakehouse_poc_spark.sources.deltalog import _dv_decode, _dv_encode

_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "raw", "type": ["null", "bytes"]},
    ],
}

_rows = st.lists(
    st.fixed_dictionaries(
        {
            "i": st.integers(min_value=-(2**63), max_value=2**63 - 1),
            "s": st.none() | st.text(max_size=40),
            "d": st.floats(allow_nan=False),  # NaN != NaN breaks eq
            "b": st.booleans(),
            "raw": st.none() | st.binary(max_size=40),
        }
    ),
    max_size=50,
)


@settings(max_examples=150, deadline=None)
@given(rows=_rows, codec=st.sampled_from(["null", "deflate"]))
def test_avro_roundtrip_property(tmp_path_factory, rows, codec):
    p = tmp_path_factory.mktemp("avro") / "t.avro"
    n = write_avro_file(p, rows, _SCHEMA, codec=codec, block_rows=7)
    assert n == len(rows)
    got = list(read_avro_file(p))
    assert got == [
        (r["i"], r["s"], r["d"], r["b"], r["raw"]) for r in rows
    ]


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**63 - 1),
        unique=True,
        max_size=200,
    )
)
def test_dv_payload_roundtrip_property(positions):
    pos = sorted(positions)
    assert _dv_decode(_dv_encode(pos)) == pos


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_dv_decode_never_crashes_on_garbage(data):
    """Arbitrary bytes either decode to a valid position list (only
    when they happen to be a valid payload) or raise DeltaLogError —
    never an unhandled struct/index error."""
    from lakehouse_poc_spark.sources.deltalog import DeltaLogError

    try:
        out = _dv_decode(data)
    except DeltaLogError:
        return
    assert isinstance(out, list)
