"""Message base class export (type-checking / isinstance uses)."""

from .internal.runtime import ShimMessage as Message  # noqa: F401


class DecodeError(Exception):
    pass


class EncodeError(Exception):
    pass
