"""Hand-rolled wire fast path for the v2 state API's hot RPCs (guide §4:
shrink the Python boundary's per-call constant).

``transformWithStateInPandas`` pays one protobuf round-trip to the JVM
state server per state access per grouping key, plus one implicit-key
set/remove pair per key. With only a pure-Python protobuf runtime
available (no compiled ``_message``), *building* each request costs more
than the socket round-trip itself — measured r14 on this host:

====================================  ==========
message-object build + serialize       ~cost/call
====================================  ==========
ValueStateCall get                      ~123 µs
ValueStateCall update                   ~136 µs
SetImplicitKey                           ~57 µs
StateResponse parse                       ~8 µs
====================================  ==========

The hot-path messages are tiny and fixed-shape, so this module encodes
them directly as wire bytes (plain varint framing) and parses
``StateResponse`` with a 30-line field walk. Field numbers are read from
the generated descriptors — nothing is hard-coded — and every encoder is
**byte-verified against the pb2 serializer for representative payloads at
wrap time**; any mismatch (a future pyspark/proto change) silently leaves
the stock client in place. Results cannot change: the bytes on the wire
are identical by construction, only the Python time to produce them
drops (~10×).

Two integration points, both applied from the processors' ``init()``
(i.e. inside the Spark Python worker, after pyspark is fully imported):

- :func:`wrap_value_state` — returns a drop-in ``get``/``update``/
  ``clear``/``exists`` handle for a ``ValueState``;
- :func:`patch_implicit_key` — rebinds the *instance* methods
  ``set_implicit_key`` / ``remove_implicit_key`` of one
  ``StatefulProcessorApiClient`` (called by the pyspark runner once per
  key, for every state-v2 operator).
"""

from __future__ import annotations

import struct
from typing import Any, Optional, Tuple


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _len_frame(field_no: int, payload: bytes) -> bytes:
    """LEN-wiretype field: tag + varint(len) + payload (field_no < 16)."""
    return bytes([(field_no << 3) | 2]) + _varint(len(payload)) + payload


def _bytes_field(field_no: int, payload: bytes) -> bytes:
    """A scalar ``bytes`` field: proto3 OMITS default-valued scalars, so an
    empty payload serializes to nothing (message-typed fields, by
    contrast, keep their empty frame — they carry presence)."""
    return _len_frame(field_no, payload) if payload else b""


class _Codec:
    """Field numbers + verified encoders for one api-client's hot calls."""

    def __init__(self) -> None:
        import pyspark.sql.streaming.proto.StateMessage_pb2 as SM

        self.SM = SM
        f = SM.StateRequest.DESCRIPTOR.fields_by_name
        self.f_svr = f["stateVariableRequest"].number
        self.f_igk = f["implicitGroupingKeyRequest"].number
        g = SM.StateVariableRequest.DESCRIPTOR.fields_by_name
        self.f_vsc = g["valueStateCall"].number
        v = SM.ValueStateCall.DESCRIPTOR.fields_by_name
        self.f_name = v["stateName"].number
        self.f_get = v["get"].number
        self.f_upd = v["valueStateUpdate"].number
        self.f_clear = v["clear"].number
        u = SM.ValueStateUpdate.DESCRIPTOR.fields_by_name
        self.f_upd_value = u["value"].number
        self.f_msc = g["mapStateCall"].number
        m = SM.MapStateCall.DESCRIPTOR.fields_by_name
        self.f_m_name = m["stateName"].number
        self.f_m_getv = m["getValue"].number
        self.f_m_updv = m["updateValue"].number
        gv = SM.GetValue.DESCRIPTOR.fields_by_name
        self.f_gv_key = gv["userKey"].number
        uv = SM.UpdateValue.DESCRIPTOR.fields_by_name
        self.f_uv_key = uv["userKey"].number
        self.f_uv_value = uv["value"].number
        i = SM.ImplicitGroupingKeyRequest.DESCRIPTOR.fields_by_name
        self.f_setkey = i["setImplicitKey"].number
        self.f_rmkey = i["removeImplicitKey"].number
        s = SM.SetImplicitKey.DESCRIPTOR.fields_by_name
        self.f_key = s["key"].number
        r = SM.StateResponse.DESCRIPTOR.fields_by_name
        self.r_status = r["statusCode"].number
        self.r_err = r["errorMessage"].number
        self.r_value = r["value"].number

    # ---- encoders ------------------------------------------------------
    def enc_value_get(self, state_name: str) -> bytes:
        inner = _len_frame(self.f_name, state_name.encode()) + _len_frame(self.f_get, b"")
        return _len_frame(self.f_svr, _len_frame(self.f_vsc, inner))

    def enc_value_clear(self, state_name: str) -> bytes:
        inner = _len_frame(self.f_name, state_name.encode()) + _len_frame(self.f_clear, b"")
        return _len_frame(self.f_svr, _len_frame(self.f_vsc, inner))

    def enc_value_update(self, state_name: str, value: bytes) -> bytes:
        inner = _len_frame(self.f_name, state_name.encode()) + _len_frame(
            self.f_upd, _bytes_field(self.f_upd_value, value)
        )
        return _len_frame(self.f_svr, _len_frame(self.f_vsc, inner))

    def enc_set_key(self, key: bytes) -> bytes:
        return _len_frame(self.f_igk, _len_frame(self.f_setkey, _bytes_field(self.f_key, key)))

    def enc_remove_key(self) -> bytes:
        return _len_frame(self.f_igk, _len_frame(self.f_rmkey, b""))

    def enc_map_get(self, state_name: str, user_key: bytes) -> bytes:
        inner = _len_frame(self.f_m_name, state_name.encode()) + _len_frame(
            self.f_m_getv, _bytes_field(self.f_gv_key, user_key)
        )
        return _len_frame(self.f_svr, _len_frame(self.f_msc, inner))

    def enc_map_update(self, state_name: str, user_key: bytes, value: bytes) -> bytes:
        inner = _len_frame(self.f_m_name, state_name.encode()) + _len_frame(
            self.f_m_updv,
            _bytes_field(self.f_uv_key, user_key) + _bytes_field(self.f_uv_value, value),
        )
        return _len_frame(self.f_svr, _len_frame(self.f_msc, inner))

    # ---- response parser ----------------------------------------------
    def parse_response(self, buf: bytes) -> Tuple[int, str, bytes]:
        status, err, value = 0, "", b""
        pos, n = 0, len(buf)
        while pos < n:
            tag = buf[pos]
            pos += 1
            field, wire = tag >> 3, tag & 7
            if wire == 0:  # varint
                val, shift = 0, 0
                while True:
                    b = buf[pos]
                    pos += 1
                    val |= (b & 0x7F) << shift
                    if not b & 0x80:
                        break
                    shift += 7
                if field == self.r_status:
                    status = val
            elif wire == 2:  # LEN
                ln, shift = 0, 0
                while True:
                    b = buf[pos]
                    pos += 1
                    ln |= (b & 0x7F) << shift
                    if not b & 0x80:
                        break
                    shift += 7
                payload = buf[pos : pos + ln]
                pos += ln
                if field == self.r_err:
                    err = payload.decode("utf-8", "replace")
                elif field == self.r_value:
                    value = payload
            else:  # unexpected wiretype: bail to a full pb2 parse
                msg = self.SM.StateResponse()
                msg.ParseFromString(buf)
                return msg.statusCode, msg.errorMessage, msg.value
        return status, err, value

    # ---- self-verification --------------------------------------------
    def verify(self) -> bool:
        """Byte-compare every encoder against pb2 and round-trip the
        parser on representative payloads. False ⇒ caller must keep the
        stock client."""
        SM = self.SM
        try:
            for name in ("latest", "cusum", "open_session", "x" * 40):
                ref = SM.StateRequest(
                    stateVariableRequest=SM.StateVariableRequest(
                        valueStateCall=SM.ValueStateCall(stateName=name, get=SM.Get())
                    )
                ).SerializeToString()
                if self.enc_value_get(name) != ref:
                    return False
                ref = SM.StateRequest(
                    stateVariableRequest=SM.StateVariableRequest(
                        valueStateCall=SM.ValueStateCall(stateName=name, clear=SM.Clear())
                    )
                ).SerializeToString()
                if self.enc_value_clear(name) != ref:
                    return False
            for payload in (b"", b"a", b"x" * 40, b"y" * 300, b"z" * 20000):
                ref = SM.StateRequest(
                    stateVariableRequest=SM.StateVariableRequest(
                        valueStateCall=SM.ValueStateCall(
                            stateName="latest",
                            valueStateUpdate=SM.ValueStateUpdate(value=payload),
                        )
                    )
                ).SerializeToString()
                if self.enc_value_update("latest", payload) != ref:
                    return False
                ref = SM.StateRequest(
                    implicitGroupingKeyRequest=SM.ImplicitGroupingKeyRequest(
                        setImplicitKey=SM.SetImplicitKey(key=payload)
                    )
                ).SerializeToString()
                if self.enc_set_key(payload) != ref:
                    return False
            ref = SM.StateRequest(
                implicitGroupingKeyRequest=SM.ImplicitGroupingKeyRequest(
                    removeImplicitKey=SM.RemoveImplicitKey()
                )
            ).SerializeToString()
            if self.enc_remove_key() != ref:
                return False
            for key in (b"", b"k", b"k" * 200):
                ref = SM.StateRequest(
                    stateVariableRequest=SM.StateVariableRequest(
                        mapStateCall=SM.MapStateCall(
                            stateName="counts", getValue=SM.GetValue(userKey=key)
                        )
                    )
                ).SerializeToString()
                if self.enc_map_get("counts", key) != ref:
                    return False
                for value in (b"", b"v" * 40, b"v" * 300):
                    ref = SM.StateRequest(
                        stateVariableRequest=SM.StateVariableRequest(
                            mapStateCall=SM.MapStateCall(
                                stateName="counts",
                                updateValue=SM.UpdateValue(userKey=key, value=value),
                            )
                        )
                    ).SerializeToString()
                    if self.enc_map_update("counts", key, value) != ref:
                        return False
            for status, err, value in ((0, "", b""), (2, "", b""), (1, "boom", b"\x01\x02"), (0, "", b"v" * 300)):
                resp = SM.StateResponse(
                    statusCode=status, errorMessage=err, value=value
                ).SerializeToString()
                if self.parse_response(resp) != (status, err, value):
                    return False
            return True
        except Exception:
            return False


_codec: Optional[_Codec] = None
_codec_ok: Optional[bool] = None


def _get_codec() -> Optional[_Codec]:
    global _codec, _codec_ok
    if _codec_ok is None:
        try:
            c = _Codec()
            _codec_ok = c.verify()
            _codec = c if _codec_ok else None
        except Exception:
            _codec_ok, _codec = False, None
    return _codec


def _roundtrip(api: Any, msg: bytes, codec: _Codec) -> Tuple[int, str, bytes]:
    """One framed request/response on the api client's socket — the same
    frames _send_proto_message/_receive_proto_message produce, in two
    writes and one read."""
    sockfile = api.sockfile
    sockfile.write(struct.pack(">ii", 0, len(msg)))
    sockfile.write(msg)
    sockfile.flush()
    (length,) = struct.unpack(">i", sockfile.read(4))
    return codec.parse_response(sockfile.read(length))


class _Pipeline:
    """Request pipelining over the state-server socket (one instance per
    api client). The server handles requests strictly in order and sends
    exactly one response per request, so ops whose response carries only a
    status (set/remove implicit key, value update/clear) can be WRITTEN
    without immediately reading — the next response-bearing op (get)
    drains the queue first: statuses are still checked, in order, and a
    non-zero status still fails the query (just one op later). Effective
    round-trips per grouping key drop from 4 (set, get, update, remove) to
    ~1. MUST only be enabled when every RPC on the socket goes through
    this object — i.e. timer-less ValueState processors; any stock client
    call interleaved with a non-empty queue would read the wrong response
    (the reason :func:`patch_implicit_key` drains in the stock-called
    ``set_handle_state`` before delegating)."""

    __slots__ = ("api", "codec", "pending")

    def __init__(self, api: Any, codec: _Codec) -> None:
        self.api = api
        self.codec = codec
        self.pending: list[str] = []

    def send(self, msg: bytes, op: str, defer: bool) -> Optional[Tuple[int, str, bytes]]:
        sockfile = self.api.sockfile
        sockfile.write(struct.pack(">ii", 0, len(msg)))
        sockfile.write(msg)
        if defer:
            # no flush: the buffered writes ride along until a read needs
            # the server to have seen them
            self.pending.append(op)
            return None
        sockfile.flush()
        self.drain()
        (length,) = struct.unpack(">i", sockfile.read(4))
        return self.codec.parse_response(sockfile.read(length))

    def drain(self) -> None:
        if not self.pending:
            return
        sockfile = self.api.sockfile
        sockfile.flush()
        from pyspark.errors import PySparkRuntimeError

        for op in self.pending:
            (length,) = struct.unpack(">i", sockfile.read(4))
            status, err, _ = self.codec.parse_response(sockfile.read(length))
            if status != 0:
                self.pending.clear()
                raise PySparkRuntimeError(f"Error in pipelined {op}: {err}")
        self.pending.clear()


class FastValueState:
    """Drop-in for ``pyspark...ValueState`` with precomputed request
    frames. Identical bytes on the wire; only the Python-side message
    build cost changes — plus, when the api client carries a
    :class:`_Pipeline`, status-only ops (update/clear) are written
    deferred and get() drains the queue first."""

    __slots__ = ("_api", "_codec", "_schema", "_get_msg", "_clear_msg", "_name", "_pipe")

    def __init__(self, api: Any, codec: _Codec, state_name: str, schema: Any) -> None:
        self._api = api
        self._codec = codec
        self._schema = schema
        self._name = state_name
        self._get_msg = codec.enc_value_get(state_name)
        self._clear_msg = codec.enc_value_clear(state_name)
        self._pipe = getattr(api, "_tws_pipe", None)

    def get(self) -> Optional[Tuple]:
        if self._pipe is not None:
            status, err, value = self._pipe.send(self._get_msg, "value get", defer=False)
        else:
            status, err, value = _roundtrip(self._api, self._get_msg, self._codec)
        if status == 0:
            if not value:
                return None
            return tuple(self._api._deserialize_from_bytes(value))
        from pyspark.errors import PySparkRuntimeError

        raise PySparkRuntimeError(f"Error getting value state: {err}")

    def exists(self) -> bool:
        return self.get() is not None

    def update(self, new_value: Tuple) -> None:
        value = self._api._serialize_to_bytes(self._schema, new_value)
        msg = self._codec.enc_value_update(self._name, value)
        if self._pipe is not None:
            self._pipe.send(msg, "value update", defer=True)
            return
        status, err, _ = _roundtrip(self._api, msg, self._codec)
        if status != 0:
            from pyspark.errors import PySparkRuntimeError

            raise PySparkRuntimeError(f"Error updating value state: {err}")

    def clear(self) -> None:
        if self._pipe is not None:
            self._pipe.send(self._clear_msg, "value clear", defer=True)
            return
        status, err, _ = _roundtrip(self._api, self._clear_msg, self._codec)
        if status != 0:
            from pyspark.errors import PySparkRuntimeError

            raise PySparkRuntimeError(f"Error clearing value state: {err}")


class FastMapState:
    """Drop-in for ``pyspark...MapState``: hand-framed getValue/updateValue
    (the per-touched-user hot path); every other call drains any pipeline
    queue and delegates to the stock object — so the stock iterator/keys/
    values paging never interleaves with deferred responses."""

    __slots__ = ("_stock", "_api", "_codec", "_name", "_key_schema", "_value_schema", "_pipe")

    def __init__(self, stock: Any, api: Any, codec: _Codec) -> None:
        self._stock = stock
        self._api = api
        self._codec = codec
        self._name = stock._stateName
        client = stock._mapStateClient
        self._key_schema = client.user_key_schema
        self._value_schema = client.value_schema
        self._pipe = getattr(api, "_tws_pipe", None)

    def getValue(self, key: Tuple) -> Optional[Any]:
        key_bytes = self._api._serialize_to_bytes(self._key_schema, key)
        msg = self._codec.enc_map_get(self._name, key_bytes)
        if self._pipe is not None:
            status, err, value = self._pipe.send(msg, "map getValue", defer=False)
        else:
            status, err, value = _roundtrip(self._api, msg, self._codec)
        if status == 0:
            if not value:
                return None
            return self._api._deserialize_from_bytes(value)
        from pyspark.errors import PySparkRuntimeError

        raise PySparkRuntimeError(f"Error getting value: {err}")

    def updateValue(self, key: Tuple, value: Tuple) -> None:
        key_bytes = self._api._serialize_to_bytes(self._key_schema, key)
        value_bytes = self._api._serialize_to_bytes(self._value_schema, value)
        msg = self._codec.enc_map_update(self._name, key_bytes, value_bytes)
        if self._pipe is not None:
            self._pipe.send(msg, "map updateValue", defer=True)
            return
        status, err, _ = _roundtrip(self._api, msg, self._codec)
        if status != 0:
            from pyspark.errors import PySparkRuntimeError

            raise PySparkRuntimeError(f"Error updating map state value: {err}")

    def _delegate(self, method: str, *args: Any) -> Any:
        if self._pipe is not None:
            self._pipe.drain()
        return getattr(self._stock, method)(*args)

    def exists(self) -> bool:
        return self._delegate("exists")

    def containsKey(self, key: Tuple) -> bool:
        return self._delegate("containsKey", key)

    def iterator(self) -> Any:
        return self._delegate("iterator")

    def keys(self) -> Any:
        return self._delegate("keys")

    def values(self) -> Any:
        return self._delegate("values")

    def removeKey(self, key: Tuple) -> None:
        return self._delegate("removeKey", key)

    def clear(self) -> None:
        return self._delegate("clear")


def wrap_map_state(map_state: Any) -> Any:
    """Return a fast handle for a stock ``MapState`` when the byte-level
    self-check passes; the stock object itself otherwise."""
    codec = _get_codec()
    if codec is None:
        return map_state
    try:
        client = map_state._mapStateClient
        api = client._stateful_processor_api_client
        if not hasattr(api, "sockfile"):
            return map_state
        return FastMapState(map_state, api, codec)
    except Exception:
        return map_state


def wrap_value_state(value_state: Any) -> Any:
    """Return a fast handle for a stock ``ValueState`` when the byte-level
    self-check passes; the stock object itself otherwise."""
    codec = _get_codec()
    if codec is None:
        return value_state
    try:
        client = value_state._valueStateClient
        api = client._stateful_processor_api_client
        schema = client.schema
        name = value_state._stateName
        if not hasattr(api, "sockfile"):
            return value_state
        return FastValueState(api, codec, name, schema)
    except Exception:
        return value_state


def patch_implicit_key(handle: Any, pipeline: bool = False) -> None:
    """Rebind ``set_implicit_key``/``remove_implicit_key`` on the ONE
    api-client instance behind ``handle`` with precomputed framing —
    these run once per grouping key for every state-v2 operator. No-op
    unless the codec self-check passes.

    ``pipeline=True`` additionally defers their response reads (see
    :class:`_Pipeline`) — ONLY legal for processors whose every RPC flows
    through this module's fast paths, i.e. timer-less ValueState
    processors; the runner's stock ``set_handle_state`` is wrapped to
    drain the queue before it reads."""
    codec = _get_codec()
    if codec is None:
        return
    try:
        api = handle._statefulProcessorApiClient
        if not hasattr(api, "sockfile") or getattr(api, "_tws_fastpath", False):
            return
        remove_msg = codec.enc_remove_key()
        from pyspark.errors import PySparkRuntimeError

        if pipeline:
            pipe = _Pipeline(api, codec)
            api._tws_pipe = pipe

            def set_implicit_key(key: Tuple) -> None:
                key_bytes = api._serialize_to_bytes(api.key_schema, key)
                pipe.send(codec.enc_set_key(key_bytes), "set_implicit_key", defer=True)

            def remove_implicit_key() -> None:
                pipe.send(remove_msg, "remove_implicit_key", defer=True)

            stock_set_handle_state = api.set_handle_state

            def set_handle_state(state: Any) -> None:
                pipe.drain()
                stock_set_handle_state(state)

            api.set_handle_state = set_handle_state
        else:

            def set_implicit_key(key: Tuple) -> None:
                key_bytes = api._serialize_to_bytes(api.key_schema, key)
                status, err, _ = _roundtrip(api, codec.enc_set_key(key_bytes), codec)
                if status != 0:
                    raise PySparkRuntimeError(f"Error setting implicit key: {err}")

            def remove_implicit_key() -> None:
                status, err, _ = _roundtrip(api, remove_msg, codec)
                if status != 0:
                    raise PySparkRuntimeError(f"Error removing implicit key: {err}")

        api.set_implicit_key = set_implicit_key
        api.remove_implicit_key = remove_implicit_key
        api._tws_fastpath = True
    except Exception:
        pass
