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

    # Leniency is SCOPED to PySpark-generated pb2 modules via the proto-file
    # location argument; every other protobuf user in the process keeps the
    # strict upstream check (keep in sync with _proto_compat.
    # LENIENT_PROTO_LOCATIONS — this file runs standalone and cannot import
    # the package).
    _LENIENT_LOCATIONS = ("org/apache/spark/", "spark/connect/")

    def _lenient_validate(domain, major, minor, patch, suffix, location):
        try:
            _orig_validate(domain, major, minor, patch, suffix, location)
        except _rv.VersionError:
            if major != _rv.MAJOR or not str(location).startswith(_LENIENT_LOCATIONS):
                raise

    _rv.ValidateProtobufRuntimeVersion = _lenient_validate
except Exception:  # pragma: no cover - no protobuf at all; probe reports it
    pass

# Chain-load the sitecustomize this shim shadows, if any: Python imports
# only ONE sitecustomize module, and this directory sits first on
# PYTHONPATH — without chaining, an environment that relies on its own
# sitecustomize (coverage subprocess hooks, cert/proxy setup) would
# silently lose it in every process that inherits our env.
try:
    import runpy

    _here = os.path.dirname(os.path.abspath(__file__))
    for _p in sys.path:
        if not _p or os.path.abspath(_p) == _here:
            continue
        _cand = os.path.join(_p, "sitecustomize.py")
        if os.path.isfile(_cand):
            runpy.run_path(_cand, run_name="sitecustomize_chained")
            break
except Exception:  # pragma: no cover - a broken foreign hook must not kill us
    pass
