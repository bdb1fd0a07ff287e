"""Wire-level tests for streaming._tws_fastpath (r14, guide §4).

The fast path replaces pure-Python protobuf message *builds* with
precomputed/hand-rolled wire bytes. Its safety story is byte equality
with the pb2 serializer — asserted here explicitly for every encoder and
the response parser, beyond the runtime self-check (which gates the whole
path off on any mismatch). The end-to-end behavior (same drained results)
is covered by the stream gate parities and test_streaming.py.
"""

from __future__ import annotations

import pytest

from timedb_spark.streaming.state_v2 import _HAVE_TWS

pytestmark = pytest.mark.skipif(not _HAVE_TWS, reason="state API v2 unavailable")


@pytest.fixture(scope="module")
def codec():
    from timedb_spark.streaming._tws_fastpath import _Codec

    return _Codec()


def _pb2():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as SM

    return SM


def test_codec_self_verification_passes(codec):
    assert codec.verify() is True


def test_value_get_clear_bytes_match_pb2(codec):
    SM = _pb2()
    for name in ("latest", "anom", "open_session", "s" * 120):
        ref = SM.StateRequest(
            stateVariableRequest=SM.StateVariableRequest(
                valueStateCall=SM.ValueStateCall(stateName=name, get=SM.Get())
            )
        ).SerializeToString()
        assert codec.enc_value_get(name) == ref
        ref = SM.StateRequest(
            stateVariableRequest=SM.StateVariableRequest(
                valueStateCall=SM.ValueStateCall(stateName=name, clear=SM.Clear())
            )
        ).SerializeToString()
        assert codec.enc_value_clear(name) == ref


def test_value_update_bytes_match_pb2_across_lengths(codec):
    SM = _pb2()
    # spans the 1- and 2-byte varint-length boundaries (127/128, 16383/16384)
    for n in (0, 1, 126, 127, 128, 300, 16383, 16384, 70000):
        payload = b"v" * n
        ref = SM.StateRequest(
            stateVariableRequest=SM.StateVariableRequest(
                valueStateCall=SM.ValueStateCall(
                    stateName="latest", valueStateUpdate=SM.ValueStateUpdate(value=payload)
                )
            )
        ).SerializeToString()
        assert codec.enc_value_update("latest", payload) == ref


def test_implicit_key_bytes_match_pb2(codec):
    SM = _pb2()
    for n in (0, 1, 40, 127, 128, 5000):
        payload = b"k" * n
        ref = SM.StateRequest(
            implicitGroupingKeyRequest=SM.ImplicitGroupingKeyRequest(
                setImplicitKey=SM.SetImplicitKey(key=payload)
            )
        ).SerializeToString()
        assert codec.enc_set_key(payload) == ref
    ref = SM.StateRequest(
        implicitGroupingKeyRequest=SM.ImplicitGroupingKeyRequest(
            removeImplicitKey=SM.RemoveImplicitKey()
        )
    ).SerializeToString()
    assert codec.enc_remove_key() == ref


def test_response_parser_round_trips_pb2(codec):
    SM = _pb2()
    cases = [
        (0, "", b""),
        (2, "", b""),
        (1, "state does not exist", b""),
        (0, "", b"\x80\x05K\x01."),
        (0, "", b"v" * 40000),
        (7, "unicode érror", b"\x00"),
    ]
    for status, err, value in cases:
        buf = SM.StateResponse(
            statusCode=status, errorMessage=err, value=value
        ).SerializeToString()
        assert codec.parse_response(buf) == (status, err, value)


def test_wrap_value_state_falls_back_on_alien_object(codec):
    from timedb_spark.streaming._tws_fastpath import wrap_value_state

    sentinel = object()
    assert wrap_value_state(sentinel) is sentinel


# ---------------------------------------------------------------------------
# Input-boundary fast path (vectorized load_stream). Safety story mirrors
# the wire codec's: chunk-for-chunk equality with the stock pyspark
# deserializer, asserted here on adversarial streams beyond the runtime
# battery (which gates the patch off on any mismatch).
# ---------------------------------------------------------------------------


def _stock_load_stream():
    from pyspark.sql.pandas.serializers import TransformWithStateInPandasSerializer as S

    return getattr(S, "_tws_stock_load_stream", S.load_stream)


def _ipc_bytes(schema, batches):
    import io

    import pyarrow as pa

    buf = io.BytesIO()
    with pa.ipc.new_stream(buf, schema) as w:
        for b in batches:
            w.write_batch(b)
    return buf.getvalue()


def _mk_ser(key_offsets, max_records=10_000, max_bytes=2**31 - 1):
    from pyspark.sql.pandas.serializers import TransformWithStateInPandasSerializer as S

    s = S("UTC", False, True, max_records, max_bytes, False)
    s.key_offsets = key_offsets
    return s


def _assert_streams_identical(ipc, key_offsets, max_records=10_000, max_bytes=2**31 - 1):
    import pandas as pd

    from timedb_spark.streaming._tws_fastpath import _drain_modes, _fast_load_stream

    s_stock = _mk_ser(key_offsets, max_records, max_bytes)
    s_fast = _mk_ser(key_offsets, max_records, max_bytes)
    ref = _drain_modes(_stock_load_stream(), s_stock, ipc)
    got = _drain_modes(_fast_load_stream, s_fast, ipc)
    assert len(ref) == len(got)
    for (m1, k1, c1), (m2, k2, c2) in zip(ref, got):
        assert m1 == m2
        assert k1 == k2
        if k1 is not None:
            # scalar TYPES too: the key feeds _serialize_to_bytes and the
            # outer groupby's equality
            assert tuple(map(type, k1)) == tuple(map(type, k2))
        assert (c1 is None) == (c2 is None)
        if c1 is None:
            continue
        assert [len(p) for p in c1] == [len(p) for p in c2]  # chunk boundaries
        for p1, p2 in zip(c1, c2):
            pd.testing.assert_frame_equal(p1, p2, check_exact=True)
    # cumulative byte accounting must evolve identically (it feeds the
    # NEXT batch's chunk threshold)
    assert (s_stock.total_bytes, s_stock.total_rows, s_stock.average_arrow_row_size) == (
        s_fast.total_bytes,
        s_fast.total_rows,
        s_fast.average_arrow_row_size,
    )


def test_input_fastpath_patch_engages_from_state_v2_import():
    import os

    if os.environ.get("TIMEDB_SPARK_NO_TWS_INPUT_FASTPATH"):
        pytest.skip("input fast path disabled via env")
    from pyspark.sql.pandas.serializers import TransformWithStateInPandasSerializer as S

    import timedb_spark.streaming.state_v2  # noqa: F401  (import applies the patch)

    assert getattr(S, "_tws_fast_input", False) is True
    assert S.load_stream is not S._tws_stock_load_stream
    # the init-state subclass keeps its own stock load_stream
    from pyspark.sql.pandas.serializers import (
        TransformWithStateInPandasInitStateSerializer as S2,
    )

    assert "load_stream" in vars(S2)


def test_input_fastpath_runtime_battery_passes():
    from pyspark.sql.pandas.serializers import TransformWithStateInPandasSerializer as S

    from timedb_spark.streaming._tws_fastpath import _verify_input_fastpath

    assert _verify_input_fastpath(_stock_load_stream(), S) is True


def test_input_fastpath_straddling_key_with_record_chunking():
    import pyarrow as pa

    sch = pa.schema([("k", pa.int64()), ("v", pa.float64())])
    b1 = pa.record_batch(
        [pa.array([1, 2, 2, 2, 2, 3, 3]), pa.array([0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5])],
        schema=sch,
    )
    b2 = pa.record_batch(
        [pa.array([3, 3, 3, 3, 4]), pa.array([4.0, 4.5, 5.0, 5.5, 6.0])], schema=sch
    )
    _assert_streams_identical(_ipc_bytes(sch, [b1, b2]), [0], max_records=3)
    # and with a chunk emitted exactly at the batch boundary (key 3 has 2+4
    # rows, max_records=2: pending empties right at the boundary)
    _assert_streams_identical(_ipc_bytes(sch, [b1, b2]), [0], max_records=2)


def test_input_fastpath_byte_budget_chunking_with_width_change():
    import pyarrow as pa

    # row width drops between batches, so the cumulative average (and the
    # effective chunk length) changes MID-KEY — the trickiest stock behavior
    sch = pa.schema([("k", pa.int64()), ("s", pa.string())])
    b1 = pa.record_batch([pa.array([1] * 6), pa.array(["x" * 40] * 6)], schema=sch)
    b2 = pa.record_batch([pa.array([1] * 5 + [2]), pa.array(["y"] * 6)], schema=sch)
    _assert_streams_identical(_ipc_bytes(sch, [b1, b2]), [0], max_bytes=200)
    _assert_streams_identical(_ipc_bytes(sch, [b1, b2]), [0], max_bytes=90)


def test_input_fastpath_renamed_and_duplicate_columns():
    import pyarrow as pa

    # itertuples renames keyword / leading-underscore / duplicate columns
    # positionally; the fast path must reproduce that exactly
    sch = pa.schema(
        [("k", pa.int64()), ("class", pa.int64()), ("_v", pa.float64()), ("k", pa.int64())]
    )
    b = pa.record_batch(
        [
            pa.array([1, 1, 2]),
            pa.array([9, 8, 7]),
            pa.array([0.1, 0.2, 0.3]),
            pa.array([5, 6, 7]),
        ],
        schema=sch,
    )
    _assert_streams_identical(_ipc_bytes(sch, [b]), [0], max_records=2)


# ---------------------------------------------------------------------------
# Output-boundary fast path (coalescing dump_stream). Equivalence is
# row-level by design: batch framing is the thing being amortized, so the
# assertions decode both IPC streams and compare (schema, row sequence).
# ---------------------------------------------------------------------------


def _out_atype():
    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import to_arrow_type

    return to_arrow_type(
        T.StructType(
            [
                T.StructField("sid", T.LongType()),
                T.StructField("vt", T.TimestampType()),
                T.StructField("v", T.DoubleType()),
            ]
        )
    )


def _out_frame(i, rows=1, as_float=False):
    import numpy as np
    import pandas as pd

    vals = np.arange(rows, dtype="int64") + i
    return pd.DataFrame(
        {
            "sid": vals.astype("float64") if as_float else vals,
            "vt": np.array(["2024-01-01"] * rows, dtype="datetime64[us]"),
            "v": np.full(rows, 0.5),
        },
        copy=False,
    )


def _assert_dumps_identical(entries, max_records=10_000):
    import io

    import pandas as pd
    from pyspark.sql.pandas.serializers import TransformWithStateInPandasSerializer as S

    from timedb_spark.streaming._tws_fastpath import (
        _decode_arrow_stream,
        _fast_dump_stream,
    )

    stock = getattr(S, "_tws_stock_dump_stream", S.dump_stream)

    def packed():
        for frames, t in entries:
            yield [(iter(frames), t)]

    s1 = S("UTC", False, True, max_records, 2**31 - 1, False)
    s2 = S("UTC", False, True, max_records, 2**31 - 1, False)
    b1, b2 = io.BytesIO(), io.BytesIO()
    stock(s1, packed(), b1)
    _fast_dump_stream(s2, packed(), b2)
    ref = _decode_arrow_stream(b1.getvalue())
    got = _decode_arrow_stream(b2.getvalue())
    assert (ref is None) == (got is None)
    if ref is not None:
        assert ref[0] == got[0]  # arrow schema
        pd.testing.assert_frame_equal(ref[1], got[1], check_exact=True)
    return b1.getvalue(), b2.getvalue()


def test_output_fastpath_patch_engages_and_battery_passes():
    import os

    from pyspark.sql.pandas.serializers import TransformWithStateInPandasSerializer as S

    from timedb_spark.streaming._tws_fastpath import _verify_output_fastpath

    import timedb_spark.streaming.state_v2  # noqa: F401  (import applies the patch)

    if not os.environ.get("TIMEDB_SPARK_NO_TWS_OUTPUT_FASTPATH"):
        assert getattr(S, "_tws_fast_output", False) is True
        assert S.dump_stream is not S._tws_stock_dump_stream
    assert (
        _verify_output_fastpath(getattr(S, "_tws_stock_dump_stream", S.dump_stream), S) is True
    )


def test_output_fastpath_coalesces_per_key_emissions():
    atype = _out_atype()
    raw_stock, raw_fast = _assert_dumps_identical(
        [([_out_frame(i)], atype) for i in range(300)]
    )
    # the point of the patch: far fewer, far smaller wire bytes
    assert len(raw_fast) < len(raw_stock) / 4


def test_output_fastpath_dtype_flip_never_promotes_big_ints():
    import numpy as np
    import pandas as pd

    atype = _out_atype()
    big = 2**60  # would round through float64 promotion
    big_frame = pd.DataFrame(
        {
            "sid": np.array([big, big + 1], dtype="int64"),
            "vt": np.array(["2024-01-01"] * 2, dtype="datetime64[us]"),
            "v": np.array([1.0, 2.0]),
        }
    )
    _assert_dumps_identical(
        [([big_frame], atype), ([_out_frame(3, as_float=True)], atype), ([big_frame], atype)]
    )


def test_output_fastpath_column_reorder_and_sizes():
    atype = _out_atype()
    reordered = _out_frame(7)[["v", "vt", "sid"]]
    _assert_dumps_identical(
        [
            ([_out_frame(0), _out_frame(1)], atype),
            ([reordered], atype),
            ([_out_frame(2, rows=15_000)], atype),  # oversized: no split, like stock
            ([_out_frame(3, rows=0)], atype),  # empty frame
            ([], atype),  # UDF call emitting nothing
            ([_out_frame(4, rows=3)], atype),
        ],
        max_records=1_000,
    )


def test_input_fastpath_timestamp_key_nulls_and_empty_batches():
    import pyarrow as pa

    ts = [1_700_000_000_000_000 + i * 3_600_000_000 for i in range(3)]
    sch = pa.schema([("sid", pa.int64()), ("vt", pa.timestamp("us")), ("x", pa.int64())])
    b1 = pa.record_batch(
        [
            pa.array([7, 7, 7, 8]),
            pa.array([ts[0], ts[0], ts[1], None], type=pa.timestamp("us")),
            pa.array([1, None, 3, 4]),
        ],
        schema=sch,
    )
    b_empty = pa.record_batch(
        [
            pa.array([], type=pa.int64()),
            pa.array([], type=pa.timestamp("us")),
            pa.array([], type=pa.int64()),
        ],
        schema=sch,
    )
    b2 = pa.record_batch(
        [
            pa.array([8, 9]),
            pa.array([ts[2]] * 2, type=pa.timestamp("us")),
            pa.array([5, 6]),
        ],
        schema=sch,
    )
    _assert_streams_identical(_ipc_bytes(sch, [b1, b_empty, b2]), [0, 1])
