"""Core of the pure-Python protobuf shim: wire-format codec,
FileDescriptorProto parsing, and message-class construction.

Everything here implements the PUBLIC protobuf encoding spec
(https://protobuf.dev/programming-guides/encoding/) and the public
descriptor.proto schema field numbers. Scope: the subset generated
*_pb2 modules need at runtime — no services, groups, maps, extensions,
or options.
"""

from __future__ import annotations

import struct

# FieldDescriptorProto.Type values (descriptor.proto, public)
T_DOUBLE = 1
T_FLOAT = 2
T_INT64 = 3
T_UINT64 = 4
T_INT32 = 5
T_FIXED64 = 6
T_FIXED32 = 7
T_BOOL = 8
T_STRING = 9
T_MESSAGE = 11
T_BYTES = 12
T_UINT32 = 13
T_ENUM = 14
T_SINT32 = 17
T_SINT64 = 18

LABEL_REPEATED = 3

_VARINT_TYPES = {
    T_INT64, T_UINT64, T_INT32, T_BOOL, T_UINT32, T_ENUM, T_SINT32,
    T_SINT64,
}
_LEN_TYPES = {T_STRING, T_BYTES, T_MESSAGE}

# wire types
WT_VARINT = 0
WT_I64 = 1
WT_LEN = 2
WT_I32 = 5


def _wire_type(ftype: int) -> int:
    if ftype in _VARINT_TYPES:
        return WT_VARINT
    if ftype in _LEN_TYPES:
        return WT_LEN
    if ftype in (T_DOUBLE, T_FIXED64):
        return WT_I64
    if ftype in (T_FLOAT, T_FIXED32):
        return WT_I32
    raise ValueError(f"unsupported field type {ftype}")


# -- varint / tag primitives -------------------------------------------------


def write_varint(out: bytearray, value: int) -> None:
    if value < 0:
        value += 1 << 64  # two's complement 64-bit
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _write_tag(out: bytearray, number: int, wt: int) -> None:
    write_varint(out, (number << 3) | wt)


def skip_field(buf: bytes, pos: int, wt: int) -> int:
    if wt == WT_VARINT:
        _, pos = read_varint(buf, pos)
        return pos
    if wt == WT_I64:
        return pos + 8
    if wt == WT_LEN:
        n, pos = read_varint(buf, pos)
        return pos + n
    if wt == WT_I32:
        return pos + 4
    raise ValueError(f"cannot skip wire type {wt}")


# -- descriptors -------------------------------------------------------------


class FieldDescriptor:
    def __init__(self) -> None:
        self.name = ""
        self.number = 0
        self.type = 0
        self.label = 1
        self.type_name = ""
        self.oneof_index: int | None = None
        self.proto3_optional = False
        self.message_type: Descriptor | None = None
        self.enum_type: EnumDescriptor | None = None

    @property
    def is_repeated(self) -> bool:
        return self.label == LABEL_REPEATED

    @property
    def has_presence(self) -> bool:
        # oneof members (incl. the synthetic oneof of proto3 optional)
        # and submessages track explicit presence
        return self.oneof_index is not None or self.type == T_MESSAGE

    def default(self):
        if self.is_repeated:
            return []
        if self.type in (T_STRING,):
            return ""
        if self.type == T_BYTES:
            return b""
        if self.type == T_BOOL:
            return False
        if self.type in (T_DOUBLE, T_FLOAT):
            return 0.0
        return 0


class Descriptor:
    def __init__(self, name: str, full_name: str) -> None:
        self.name = name
        self.full_name = full_name
        self.fields: list[FieldDescriptor] = []
        self.fields_by_number: dict[int, FieldDescriptor] = {}
        self.fields_by_name: dict[str, FieldDescriptor] = {}
        self.nested_types: list[Descriptor] = []
        self.enum_types: list[EnumDescriptor] = []
        self.oneofs: list[str] = []
        self._message_class = None


class EnumDescriptor:
    def __init__(self, name: str, full_name: str) -> None:
        self.name = name
        self.full_name = full_name
        self.values_by_name: dict[str, int] = {}


class FileDescriptor:
    def __init__(self) -> None:
        self.name = ""
        self.package = ""
        self.message_types: list[Descriptor] = []
        self.enum_types: list[EnumDescriptor] = []
        self.serialized_pb = b""


# descriptor.proto field numbers (public schema)
# FileDescriptorProto: name=1 package=2 message_type=4 enum_type=5
# DescriptorProto: name=1 field=2 nested_type=3 enum_type=4 oneof_decl=8
# FieldDescriptorProto: name=1 number=3 label=4 type=5 type_name=6
#                       oneof_index=9 proto3_optional=17
# OneofDescriptorProto: name=1
# EnumDescriptorProto: name=1 value=2
# EnumValueDescriptorProto: name=1 number=2


def _iter_fields(buf: bytes):
    pos = 0
    while pos < len(buf):
        tag, pos = read_varint(buf, pos)
        number, wt = tag >> 3, tag & 7
        if wt == WT_VARINT:
            val, pos = read_varint(buf, pos)
        elif wt == WT_LEN:
            n, pos = read_varint(buf, pos)
            val = buf[pos : pos + n]
            pos += n
        else:
            start = pos
            pos = skip_field(buf, pos, wt)
            val = buf[start:pos]
        yield number, wt, val


def _parse_field_descriptor(buf: bytes) -> FieldDescriptor:
    f = FieldDescriptor()
    for number, _wt, val in _iter_fields(buf):
        if number == 1:
            f.name = val.decode("utf-8")
        elif number == 3:
            f.number = val
        elif number == 4:
            f.label = val
        elif number == 5:
            f.type = val
        elif number == 6:
            f.type_name = val.decode("utf-8")
        elif number == 9:
            f.oneof_index = val
        elif number == 17:
            f.proto3_optional = bool(val)
    return f


def _parse_enum_descriptor(buf: bytes, prefix: str) -> EnumDescriptor:
    name = ""
    values: list[tuple[str, int]] = []
    for number, _wt, val in _iter_fields(buf):
        if number == 1:
            name = val.decode("utf-8")
        elif number == 2:
            vname, vnum = "", 0
            for n2, _w2, v2 in _iter_fields(val):
                if n2 == 1:
                    vname = v2.decode("utf-8")
                elif n2 == 2:
                    vnum = v2
            values.append((vname, vnum))
    e = EnumDescriptor(name, f"{prefix}.{name}")
    for vname, vnum in values:
        e.values_by_name[vname] = vnum
    return e


def _parse_message_descriptor(buf: bytes, prefix: str) -> Descriptor:
    name = ""
    raw_fields: list[bytes] = []
    raw_nested: list[bytes] = []
    raw_enums: list[bytes] = []
    oneofs: list[str] = []
    for number, _wt, val in _iter_fields(buf):
        if number == 1:
            name = val.decode("utf-8")
        elif number == 2:
            raw_fields.append(val)
        elif number == 3:
            raw_nested.append(val)
        elif number == 4:
            raw_enums.append(val)
        elif number == 8:
            oname = ""
            for n2, _w2, v2 in _iter_fields(val):
                if n2 == 1:
                    oname = v2.decode("utf-8")
            oneofs.append(oname)
    full = f"{prefix}.{name}"
    d = Descriptor(name, full)
    d.oneofs = oneofs
    for rf in raw_fields:
        f = _parse_field_descriptor(rf)
        d.fields.append(f)
        d.fields_by_number[f.number] = f
        d.fields_by_name[f.name] = f
    for rn in raw_nested:
        d.nested_types.append(_parse_message_descriptor(rn, full))
    for re_ in raw_enums:
        d.enum_types.append(_parse_enum_descriptor(re_, full))
    return d


def parse_file_descriptor(data: bytes) -> FileDescriptor:
    fd = FileDescriptor()
    fd.serialized_pb = data
    raw_msgs: list[bytes] = []
    raw_enums: list[bytes] = []
    for number, _wt, val in _iter_fields(data):
        if number == 1:
            fd.name = val.decode("utf-8")
        elif number == 2:
            fd.package = val.decode("utf-8")
        elif number == 4:
            raw_msgs.append(val)
        elif number == 5:
            raw_enums.append(val)
    prefix = f".{fd.package}" if fd.package else ""
    for rm in raw_msgs:
        fd.message_types.append(_parse_message_descriptor(rm, prefix))
    for re_ in raw_enums:
        fd.enum_types.append(_parse_enum_descriptor(re_, prefix))
    return fd


def resolve_types(
    fd: FileDescriptor,
    msg_registry: dict[str, Descriptor],
    enum_registry: dict[str, EnumDescriptor],
) -> None:
    """Register all (nested incl.) message/enum descriptors by full
    name, then point each message/enum field at its descriptor."""

    def _register(d: Descriptor) -> None:
        msg_registry[d.full_name] = d
        for e in d.enum_types:
            enum_registry[e.full_name] = e
        for n in d.nested_types:
            _register(n)

    for d in fd.message_types:
        _register(d)
    for e in fd.enum_types:
        enum_registry[e.full_name] = e
    for d in list(msg_registry.values()):
        for f in d.fields:
            if f.type == T_MESSAGE:
                f.message_type = msg_registry[f.type_name]
            elif f.type == T_ENUM:
                f.enum_type = enum_registry[f.type_name]


# -- message runtime ---------------------------------------------------------


class ShimMessage:
    """Base class for generated messages: kwargs init, proto3-default
    attribute reads, SerializeToString / ParseFromString."""

    DESCRIPTOR: Descriptor = None  # set per subclass

    def __init__(self, **kwargs) -> None:
        object.__setattr__(self, "_values", {})
        for k, v in kwargs.items():
            if v is None:
                continue
            setattr(self, k, v)

    def __setattr__(self, name: str, value) -> None:
        d = self.DESCRIPTOR
        f = d.fields_by_name.get(name)
        if f is None:
            raise AttributeError(
                f"{d.full_name} has no field {name!r}"
            )
        if f.is_repeated:
            value = list(value)
        self._values[name] = value

    def __getattr__(self, name: str):
        # only called when normal lookup fails (i.e. not a method)
        d = object.__getattribute__(self, "DESCRIPTOR")
        values = object.__getattribute__(self, "_values")
        f = d.fields_by_name.get(name)
        if f is None:
            raise AttributeError(
                f"{d.full_name} has no field {name!r}"
            )
        if name in values:
            return values[name]
        if f.type == T_MESSAGE and not f.is_repeated:
            return f.message_type._message_class()  # empty default view
        return f.default()

    def HasField(self, name: str) -> bool:
        return name in self._values

    def WhichOneof(self, oneof_name: str):
        d = self.DESCRIPTOR
        idx = d.oneofs.index(oneof_name)
        for f in d.fields:
            if f.oneof_index == idx and f.name in self._values:
                return f.name
        return None

    def CopyFrom(self, other: "ShimMessage") -> None:
        assert other.DESCRIPTOR is self.DESCRIPTOR
        self._values.clear()
        self._values.update(other._values)

    # -- encode --

    def SerializeToString(self) -> bytes:
        out = bytearray()
        for f in sorted(self.DESCRIPTOR.fields, key=lambda x: x.number):
            if f.name not in self._values:
                continue
            v = self._values[f.name]
            if f.is_repeated:
                for item in v:
                    self._encode_one(out, f, item)
            else:
                # proto3: non-presence scalars equal to their default
                # are omitted; oneof/optional/message fields emit when
                # explicitly set
                if not f.has_presence and v == f.default():
                    continue
                self._encode_one(out, f, v)
        return bytes(out)

    @staticmethod
    def _encode_one(out: bytearray, f: FieldDescriptor, v) -> None:
        wt = _wire_type(f.type)
        _write_tag(out, f.number, wt)
        t = f.type
        if wt == WT_VARINT:
            if t == T_BOOL:
                write_varint(out, 1 if v else 0)
            elif t == T_SINT32 or t == T_SINT64:
                u = (v << 1) ^ (v >> 63 if t == T_SINT64 else v >> 31)
                write_varint(out, u & ((1 << 64) - 1))
            else:
                write_varint(out, int(v))
        elif wt == WT_LEN:
            if t == T_STRING:
                payload = v.encode("utf-8")
            elif t == T_BYTES:
                payload = bytes(v)
            else:  # message
                payload = v.SerializeToString()
            write_varint(out, len(payload))
            out.extend(payload)
        elif wt == WT_I64:
            out.extend(struct.pack("<d", float(v)))
        else:  # WT_I32
            out.extend(struct.pack("<f", float(v)))

    # -- decode --

    def ParseFromString(self, data: bytes) -> int:
        self._values.clear()
        self.MergeFromString(data)
        return len(data)

    def MergeFromString(self, data: bytes) -> int:
        d = self.DESCRIPTOR
        pos = 0
        buf = bytes(data)
        while pos < len(buf):
            tag, pos = read_varint(buf, pos)
            number, wt = tag >> 3, tag & 7
            f = d.fields_by_number.get(number)
            if f is None:
                pos = skip_field(buf, pos, wt)
                continue
            expected = _wire_type(f.type)
            if wt == WT_LEN and expected != WT_LEN:
                # packed repeated scalars
                n, pos = read_varint(buf, pos)
                end = pos + n
                items = self._values.setdefault(f.name, [])
                while pos < end:
                    val, pos = self._decode_scalar(f, buf, pos, expected)
                    items.append(val)
                continue
            if wt != expected:
                pos = skip_field(buf, pos, wt)
                continue
            if wt == WT_LEN:
                n, pos = read_varint(buf, pos)
                payload = buf[pos : pos + n]
                pos += n
                if f.type == T_STRING:
                    val = payload.decode("utf-8")
                elif f.type == T_BYTES:
                    val = payload
                else:
                    val = f.message_type._message_class()
                    val.MergeFromString(payload)
            else:
                val, pos = self._decode_scalar(f, buf, pos, wt)
            if f.is_repeated:
                self._values.setdefault(f.name, []).append(val)
            else:
                self._values[f.name] = val
        return len(buf)

    @staticmethod
    def _decode_scalar(f: FieldDescriptor, buf: bytes, pos: int, wt: int):
        t = f.type
        if wt == WT_VARINT:
            u, pos = read_varint(buf, pos)
            if t == T_BOOL:
                return bool(u), pos
            if t in (T_SINT32, T_SINT64):
                return (u >> 1) ^ -(u & 1), pos
            if t in (T_INT32, T_INT64):
                if u >= 1 << 63:
                    u -= 1 << 64
                return u, pos
            return u, pos  # uint32/uint64/enum
        if wt == WT_I64:
            if t == T_DOUBLE:
                return struct.unpack_from("<d", buf, pos)[0], pos + 8
            return struct.unpack_from("<Q", buf, pos)[0], pos + 8
        if wt == WT_I32:
            if t == T_FLOAT:
                return struct.unpack_from("<f", buf, pos)[0], pos + 4
            return struct.unpack_from("<I", buf, pos)[0], pos + 4
        raise ValueError(f"unexpected wire type {wt}")

    def ByteSize(self) -> int:
        return len(self.SerializeToString())

    def __repr__(self) -> str:  # debugging aid
        return f"<{self.DESCRIPTOR.full_name} {self._values!r}>"

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, ShimMessage)
            and other.DESCRIPTOR is self.DESCRIPTOR
            and other._values == self._values
        )


def make_message_class(d: Descriptor) -> type:
    if d._message_class is not None:
        return d._message_class
    attrs = {"DESCRIPTOR": d}
    # nested enums' values become class attributes (generated-code
    # convention), as do nested message classes
    for e in d.enum_types:
        for vname, vnum in e.values_by_name.items():
            attrs[vname] = vnum
    cls = type(d.name, (ShimMessage,), attrs)
    d._message_class = cls
    for n in d.nested_types:
        setattr(cls, n.name, make_message_class(n))
    return cls
