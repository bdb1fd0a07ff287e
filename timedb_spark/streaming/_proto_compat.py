"""Discover a usable ``google.protobuf`` runtime for the state API v2.

The v2 stateful API (``transformWithStateInPandas``) requires protobuf in
every Spark Python process. This environment has no pip ``protobuf`` and no
network, but public SDK bundles on disk ship a pure-Python runtime that is
wire-compatible with PySpark's generated ``StateMessage_pb2`` (same major
version, one minor behind). ``ensure_protobuf()``:

1. Returns "" immediately if ``google.protobuf`` already imports (normal
   install — nothing to do, workers have it too).
2. Otherwise scans ``TIMEDB_PROTOBUF_DIR`` (user override) then a short
   list of known public-SDK locations for a ``google/protobuf`` tree,
   appends the first importable one to ``sys.path``, applies the lenient
   same-major version check (see ``_protoshim/sitecustomize.py``), and
   exports ``TIMEDB_PROTOBUF_DIR`` + prepends the shim directory to
   ``PYTHONPATH`` so Python workers forked by a LATER-started JVM pick the
   runtime up via ``sitecustomize`` (the one import hook that runs during
   worker bootstrap, before the pb2 modules load).
3. Returns a precise failure string when no runtime works — surfaced
   verbatim in test-skip messages and the ``NotImplementedError`` gate so
   every probe records WHY the gate is closed.

Call it BEFORE ``SparkSession`` creation (``session.get_spark`` does):
worker environments are frozen when the JVM launches.
"""

from __future__ import annotations

import glob
import os
import sys

#: known public locations of a vendorable pure-Python protobuf runtime
_CANDIDATE_DIRS = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
    "/usr/lib64/google-cloud-sdk/platform/google_appengine",
    "/opt/google-cloud-sdk/platform/google_appengine",
]

_SHIM_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_protoshim")

#: proto-file location prefixes of PySpark-generated pb2 modules — the ONLY
#: gencode the lenient version check applies to. Any other protobuf user in
#: the process keeps the strict upstream validation (keep in sync with
#: _protoshim/sitecustomize.py, which cannot import this module).
LENIENT_PROTO_LOCATIONS = ("org/apache/spark/", "spark/connect/")

_probed: str | None = None


def _patch_validator() -> None:
    """Same-major leniency for gencode newer than runtime (minor skew),
    SCOPED to PySpark's own pb2 modules via the proto-file ``location``
    argument (e.g. ``org/apache/spark/.../StateMessage.proto``) — every
    other protobuf consumer in the process still gets the strict check.

    Guarded: runtime_version only exists from protobuf 5.27 — an older
    vendored runtime simply has nothing to patch (and will fail the pb2
    probe with its own precise error, which state_v2 records); it must not
    crash ``import timedb_spark``."""
    try:
        from google.protobuf import runtime_version as _rv
    except ImportError:
        return

    _orig = _rv.ValidateProtobufRuntimeVersion

    def _lenient(domain, major, minor, patch, suffix, location):
        try:
            _orig(domain, major, minor, patch, suffix, location)
        except _rv.VersionError:
            if major != _rv.MAJOR or not str(location).startswith(LENIENT_PROTO_LOCATIONS):
                raise

    _rv.ValidateProtobufRuntimeVersion = _lenient


def ensure_protobuf() -> str:
    """Make ``google.protobuf`` importable here and in future Spark workers.

    Returns "" on success, else the exact unmet precondition. Idempotent;
    the result is cached (path/env mutations only ever happen once).
    """
    global _probed
    if _probed is not None:
        return _probed

    try:
        import google.protobuf  # noqa: F401

        _probed = ""
        return _probed
    except ImportError:
        pass

    if os.environ.get("TIMEDB_NO_PROTOBUF_PROBE"):
        # Explicit opt-out for hosts that must not have their environment
        # touched by a library import (ADVICE r5): no sys.path / PYTHONPATH
        # mutation, no validator patch; the v2 gate stays closed with this
        # exact reason. NOT cached in _probed — unsetting the var re-enables
        # the probe on the next call. (The import check above is
        # side-effect-free, so a pip-installed protobuf still counts.)
        return (
            "TIMEDB_NO_PROTOBUF_PROBE is set: vendored-runtime discovery "
            "disabled; install the 'protobuf' package to use the state API v2"
        )

    candidates = []
    if os.environ.get("TIMEDB_PROTOBUF_DIR"):
        candidates.append(os.environ["TIMEDB_PROTOBUF_DIR"])
    candidates += _CANDIDATE_DIRS

    tried: list[str] = []
    for d in candidates:
        if not os.path.isfile(os.path.join(d, "google", "protobuf", "__init__.py")):
            tried.append(f"{d} (no google/protobuf tree)")
            continue
        sys.path.append(d)
        try:
            import google.protobuf  # noqa: F401
        except ImportError as e:
            sys.path.remove(d)
            tried.append(f"{d} (import failed: {e})")
            continue
        _patch_validator()
        os.environ["TIMEDB_PROTOBUF_DIR"] = d
        # Prepend the shim dir so sitecustomize runs in every worker the
        # (not-yet-started) JVM forks. Harmless if the JVM already runs —
        # the v1 API stays the default and tests re-probe per process.
        prev = os.environ.get("PYTHONPATH", "")
        if _SHIM_DIR not in prev.split(os.pathsep):
            os.environ["PYTHONPATH"] = _SHIM_DIR + (os.pathsep + prev if prev else "")
        _probed = ""
        return _probed

    _probed = (
        "python package 'protobuf' (import google.protobuf) not installed and no "
        "vendorable runtime found; tried: " + "; ".join(tried)
    )
    return _probed
