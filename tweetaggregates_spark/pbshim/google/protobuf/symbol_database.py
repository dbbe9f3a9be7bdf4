"""Symbol database stub: generated modules obtain it but the shim's
builder wires classes directly."""

from __future__ import annotations


class SymbolDatabase:
    def RegisterMessage(self, cls):
        return cls

    def RegisterFileDescriptor(self, fd):
        return fd


_DEFAULT = SymbolDatabase()


def Default() -> SymbolDatabase:
    return _DEFAULT
