"""Worker-side protobuf shim for the Spark 4 state API v2.

``transformWithStateInPandas`` talks a protobuf-framed protocol between the
Python worker and the JVM state server, so every Spark Python process needs
``google.protobuf`` importable. In environments without the pip package but
with a vendorable pure-Python runtime on disk (e.g. a public SDK bundle),
``timedb_spark.streaming._proto_compat.ensure_protobuf`` discovers the
runtime, exports its directory as ``TIMEDB_PROTOBUF_DIR``, and puts THIS
directory on ``PYTHONPATH`` before the JVM (and hence every Python worker it
forks) starts. Python imports ``sitecustomize`` automatically at interpreter
startup, which makes this the one hook that runs in the TWS "driver worker"
and the regular task workers alike — processes ``addPyFile`` does not reach
early enough (the pb2 modules import during worker bootstrap).

Two actions, both no-ops when not needed:

1. Append ``TIMEDB_PROTOBUF_DIR`` to ``sys.path`` (APPEND, not prepend: a
   real site-packages protobuf always wins).
2. Make the protobuf gencode/runtime version check lenient WITHIN a major
   version: PySpark's generated ``StateMessage_pb2`` is built by a protoc
   one minor ahead of the vendorable runtime (e.g. gencode 6.33 vs runtime
   6.32) and ``ValidateProtobufRuntimeVersion`` rejects that formally even
   though the generated code only uses the stable builder API. Cross-MAJOR
   mismatches still raise.
"""

import os
import sys

_d = os.environ.get("TIMEDB_PROTOBUF_DIR")
if _d and os.path.isdir(os.path.join(_d, "google", "protobuf")) and _d not in sys.path:
    sys.path.append(_d)

try:
    from google.protobuf import runtime_version as _rv

    _orig_validate = _rv.ValidateProtobufRuntimeVersion

    def _lenient_validate(domain, major, minor, patch, suffix, location):
        try:
            _orig_validate(domain, major, minor, patch, suffix, location)
        except _rv.VersionError:
            if major != _rv.MAJOR:
                raise

    _rv.ValidateProtobufRuntimeVersion = _lenient_validate
except Exception:  # pragma: no cover - no protobuf at all; probe reports it
    pass
