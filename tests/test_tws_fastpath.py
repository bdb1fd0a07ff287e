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
