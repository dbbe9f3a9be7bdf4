"""Descriptor pool: parses serialized FileDescriptorProtos embedded in
generated modules (the descriptor.proto schema is public)."""

from __future__ import annotations

from .internal import runtime


class DescriptorPool:
    def __init__(self) -> None:
        self._files: dict[str, runtime.FileDescriptor] = {}
        self.messages: dict[str, runtime.Descriptor] = {}
        self.enums: dict[str, runtime.EnumDescriptor] = {}

    def AddSerializedFile(self, data: bytes) -> runtime.FileDescriptor:
        fd = runtime.parse_file_descriptor(data)
        self._files[fd.name] = fd
        runtime.resolve_types(fd, self.messages, self.enums)
        return fd

    def FindMessageTypeByName(self, full_name: str) -> runtime.Descriptor:
        return self.messages[f".{full_name}"]


_DEFAULT = DescriptorPool()


def Default() -> DescriptorPool:
    return _DEFAULT
