"""Best-effort ``google.protobuf`` discovery for transformWithState.

The TWS state protocol (JVM <-> Python state server) serializes with
protobuf (``pyspark/sql/streaming/proto/StateMessage_pb2.py``).  Some
containers — including this harness — ship no ``protobuf`` pip package,
which previously degraded the TWS e2e test to plan-build-only wiring
assertions.

This module looks for a pure-Python protobuf runtime that is already on
the machine (the Google Cloud SDK vendors one under
``platform/google_appengine/google/protobuf``) and, when found, makes it
importable for BOTH the driver and Spark's Python workers:

- appends the vendored root to ``sys.path`` (driver) and to
  ``$PYTHONPATH`` (inherited by worker processes — must happen BEFORE
  the JVM launches, so :func:`ensure_protobuf` is called from
  ``session.get_spark``);
- sets protobuf's own official escape hatch
  ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK=true`` when the vendored
  runtime is one minor version behind the gencode (6.32 runtime vs 6.33
  gencode here — wire-compatible; the strict gate only enforces release
  hygiene).

Nothing is installed and nothing outside the process environment is
modified.  When no runtime is found anywhere, callers see the same
``ImportError`` as before and the TWS e2e test skips loudly.
"""

from __future__ import annotations

import os
import sys

#: Known locations of a vendored pure-Python protobuf runtime (the
#: directory CONTAINING the ``google/`` namespace package).
_VENDOR_ROOTS = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable if any runtime exists.

    Returns True when ``import google.protobuf`` will succeed (either it
    already did, or a vendored runtime was wired in), False otherwise.
    Idempotent; safe to call before every session build.
    """
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    for root in _VENDOR_ROOTS:
        if not os.path.isdir(os.path.join(root, "google", "protobuf")):
            continue
        if root not in sys.path:
            sys.path.append(root)
        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            continue
        # workers inherit the environment of the JVM, which inherits
        # ours — both vars must be exported before getOrCreate()
        pypath = os.environ.get("PYTHONPATH", "")
        if root not in pypath.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                f"{pypath}{os.pathsep}{root}" if pypath else root
            )
        # minor-version skew (runtime 6.32 vs gencode 6.33) trips the
        # strict release-hygiene gate; protobuf's own documented
        # escape hatch accepts it
        os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
        return True
    return False
