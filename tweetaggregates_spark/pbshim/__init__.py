"""Pure-Python ``google.protobuf`` fallback runtime (VERDICT r5 #5).

Spark 4's ``transformWithState`` talks to the JVM state server over a
protobuf protocol: the Python worker imports the GENERATED module
``pyspark.sql.streaming.proto.StateMessage_pb2``, which needs the
``google.protobuf`` runtime at import time. This container ships no
protobuf and has no network, so the e2e was environment-gated for two
rounds. This package removes the gate: a minimal, original
implementation of the protobuf wire format (a public, stable spec —
https://protobuf.dev/programming-guides/encoding/) sufficient for
generated *_pb2 modules of this shape:

* ``descriptor_pool.Default().AddSerializedFile`` parses the embedded
  serialized FileDescriptorProto (descriptor.proto field numbers are
  part of the same public spec) into message/enum/field descriptors;
* ``internal.builder`` materializes message classes (kwargs init,
  attribute access with proto3 defaults, SerializeToString,
  ParseFromString) and module-level enum constants;
* scalar types: double/float/int32/int64/uint32/uint64/bool/string/
  bytes/enum, submessages, repeated fields (packed + unpacked decode),
  oneofs and proto3 ``optional`` presence.

``ensure_protobuf()`` activates the shim ONLY when the real library is
absent: it prepends the shim dir to ``sys.path`` (driver) and
``PYTHONPATH`` (inherited by the JVM and its Python workers — call it
BEFORE building the SparkSession). With real protobuf installed it is
a no-op, so environments that have the genuine runtime keep it.
"""

from __future__ import annotations

import os
import sys


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable, via the real library if
    present, else the shim. Returns True when the SHIM was activated.
    Must run before the SparkSession/JVM starts so worker processes
    inherit the path."""
    try:
        import google.protobuf as _gp

        # already importable: the real library (False), or the shim a
        # prior call put on the path (True) — idempotent either way
        return "pbshim" in (getattr(_gp, "__file__", "") or "")
    except ImportError:
        pass
    shim_root = os.path.dirname(os.path.abspath(__file__))
    if shim_root not in sys.path:
        sys.path.insert(0, shim_root)
    existing = os.environ.get("PYTHONPATH", "")
    parts = existing.split(os.pathsep) if existing else []
    if shim_root not in parts:
        os.environ["PYTHONPATH"] = (
            shim_root + (os.pathsep + existing if existing else "")
        )
    import google.protobuf  # noqa: F401  (now resolves to the shim)

    return True
