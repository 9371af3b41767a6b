"""Environment compatibility shims.

``ensure_protobuf()`` makes ``google.protobuf`` importable in BOTH the
driver and the JVM-spawned Python worker processes:

- driver: insert ``_vendor/`` into ``sys.path``;
- workers: prepend ``_vendor/`` to the ``PYTHONPATH`` environment variable
  *before* the Py4J gateway (and therefore the worker daemon) is launched,
  so forked workers inherit it.

Called at ``sparkstreaming_spark.session`` import time — i.e. before any
SparkSession exists — because a JVM started with the old environment would
spawn workers that cannot import the shim. A real installed protobuf always
wins: the vendor path is only added when the import fails.
"""

from __future__ import annotations

import os
import sys

_VENDOR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_vendor")


def ensure_protobuf() -> bool:
    """Return True if ``google.protobuf`` is importable after this call."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    if _VENDOR not in sys.path:
        sys.path.insert(0, _VENDOR)
    existing = os.environ.get("PYTHONPATH", "")
    if _VENDOR not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _VENDOR + os.pathsep + existing if existing else _VENDOR
        )
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False
