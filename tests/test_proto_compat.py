"""The protobuf discovery/shim layer behind the v2 state API
(streaming/_proto_compat.py + _protoshim/sitecustomize.py).

These tests pin the CONTRACT, not the environment: whatever this machine
has, (a) the probe's answer must agree with whether google.protobuf
actually imports afterwards, (b) a successful vendored probe must leave
the worker-side breadcrumbs (TIMEDB_PROTOBUF_DIR + the shim on
PYTHONPATH), and (c) the failure message must name every candidate tried
so a closed gate is always diagnosable from the skip text alone.
"""

from __future__ import annotations

import os
import subprocess
import sys

from timedb_spark.streaming import _proto_compat


def test_probe_result_matches_importability():
    got = _proto_compat.ensure_protobuf()
    try:
        import google.protobuf  # noqa: F401

        importable = True
    except ImportError:
        importable = False
    assert (got == "") == importable


def test_success_exports_worker_breadcrumbs():
    if _proto_compat.ensure_protobuf() != "":
        return  # covered by the failure-path test below
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        raise AssertionError("probe returned success but import fails")
    # a pip-installed protobuf needs no env; a vendored one must leave both
    # breadcrumbs so workers forked by a later JVM pick it up
    import importlib.util

    spec = importlib.util.find_spec("google.protobuf")
    vendored = "site-packages" not in (spec.origin or "")
    if vendored:
        d = os.environ.get("TIMEDB_PROTOBUF_DIR")
        assert d and os.path.isdir(os.path.join(d, "google", "protobuf"))
        assert _proto_compat._SHIM_DIR in os.environ.get("PYTHONPATH", "").split(os.pathsep)


def test_failure_message_names_every_candidate_tried():
    """Run the probe in a clean subprocess with discovery pointed at a
    bogus dir and the real candidates masked — the message must be precise
    (names the tried paths and why each failed)."""
    code = """
import os, sys
sys.path.insert(0, "/root/repo")
from timedb_spark.streaming import _proto_compat as pc
pc._probed = None
pc._CANDIDATE_DIRS[:] = ["/nonexistent/sdk"]
os.environ.pop("TIMEDB_PROTOBUF_DIR", None)
# mask a pip-installed protobuf if present so the fallback path runs
import importlib.util
if importlib.util.find_spec("google.protobuf") is not None:
    print("PIPINSTALLED")
else:
    msg = pc.ensure_protobuf()
    assert "not installed" in msg and "/nonexistent/sdk" in msg, msg
    print("OK:" + msg[:80])
"""
    env = {k: v for k, v in os.environ.items() if k not in ("PYTHONPATH", "TIMEDB_PROTOBUF_DIR")}
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, env=env)
    assert out.returncode == 0, out.stderr[-500:]
    assert out.stdout.startswith(("OK:", "PIPINSTALLED"))


def test_shim_is_noop_safe_without_env():
    """sitecustomize must never break an interpreter that lacks the env
    vars (every python process on a machine with our PYTHONPATH runs it)."""
    shim = os.path.join(_proto_compat._SHIM_DIR, "sitecustomize.py")
    env = {k: v for k, v in os.environ.items() if k not in ("PYTHONPATH", "TIMEDB_PROTOBUF_DIR")}
    out = subprocess.run(
        [sys.executable, shim], capture_output=True, text=True, env=env
    )
    assert out.returncode == 0, out.stderr[-500:]
