"""Builder hooks called by generated *_pb2 modules.

``BuildMessageAndEnumDescriptors`` injects the per-type descriptor
globals (``_MESSAGENAME`` / ``_ENUMNAME`` — including nested, joined
with underscores) the generated module then annotates with
_serialized_start/_serialized_end. ``BuildTopDescriptorsAndMessages``
creates the message classes and module-level enum value constants."""

from __future__ import annotations

from .runtime import (
    Descriptor,
    EnumDescriptor,
    FileDescriptor,
    make_message_class,
)


def _walk(fd: FileDescriptor):
    def _msg(d: Descriptor, prefix: str):
        key = f"{prefix}_{d.name.upper()}" if prefix else f"_{d.name.upper()}"
        yield key, d
        for e in d.enum_types:
            yield f"{key}_{e.name.upper()}", e
        for n in d.nested_types:
            yield from _msg(n, key)

    for d in fd.message_types:
        yield from _msg(d, "")
    for e in fd.enum_types:
        yield f"_{e.name.upper()}", e


def BuildMessageAndEnumDescriptors(fd: FileDescriptor, globals_dict) -> None:
    for key, desc in _walk(fd):
        globals_dict[key] = desc


def BuildTopDescriptorsAndMessages(
    fd: FileDescriptor, module_name: str, globals_dict
) -> None:
    for d in fd.message_types:
        cls = make_message_class(d)
        cls.__module__ = module_name
        globals_dict[d.name] = cls
    for e in fd.enum_types:
        # expose the enum type name AND each value as module constants
        # (generated-code convention: stateMessage.PRE_INIT etc.)
        globals_dict[e.name] = e
        for vname, vnum in e.values_by_name.items():
            globals_dict[vname] = vnum
