"""Runtime-version validation: the shim accepts any generated code of
the wire-format subset it implements."""


class Domain:
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


class VersionError(Exception):
    pass


def ValidateProtobufRuntimeVersion(*_args, **_kwargs) -> None:
    return None
