"""Descriptor types for the shim. Generated modules read
``_USE_C_DESCRIPTORS`` and then assign bookkeeping attributes
(_loaded_options, _serialized_start/...) onto the descriptor objects —
plain Python objects accept those."""

from .internal.runtime import (  # noqa: F401
    Descriptor,
    EnumDescriptor,
    FieldDescriptor,
    FileDescriptor,
)

_USE_C_DESCRIPTORS = False
