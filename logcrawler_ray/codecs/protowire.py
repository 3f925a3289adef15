"""Minimal protobuf wire-format codec + representation parser registry.

The reference parses NaoTH representation payloads with generated protobuf
classes (``parser.parse("FrameInfo", bytes)`` -> ``message.frameNumber`` /
``message.time``, reference: 07_input_cognition_data_rust.py:90-96, and
``MessageToDict`` normalization at 07:126-145). No protobuf wheel exists in
this container, so this module implements the public protobuf *wire format*
(varint / 64-bit / length-delimited / 32-bit groups, little-endian) from the
spec, driven by small schema dicts — enough to round-trip the representation
shapes the pipelines need, with unknown fields skipped exactly like a real
decoder.

Schemas are ``{field_no: (name, kind)}`` where kind is one of the scalar
kinds below, ``("message", subschema)`` for nested messages, or
``("repeated", kind)`` for repeated fields. Scalars decode last-one-wins;
repeated fields accumulate — the spec's merge rules.

The ``PARSERS`` registry + ``register_alias`` mirror the reference's
``Parser.register(alias, base)`` name aliasing
(07_input_cognition_data_rust.py:217-221, 06_extract_images.py:368-370):
``ImageTop`` parses with the ``Image`` schema, etc.
"""

from __future__ import annotations

import struct

_WIRE_VARINT = 0
_WIRE_I64 = 1
_WIRE_LEN = 2
_WIRE_I32 = 5

SCALAR_KINDS = {"uint32", "uint64", "int32", "int64", "sint32", "sint64",
                "bool", "string", "bytes", "float", "double",
                "fixed32", "fixed64", "sfixed32", "sfixed64"}


class WireError(ValueError):
    pass


# ---------------------------------------------------------------- varint
def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise WireError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise WireError("varint too long")


def encode_varint(v: int) -> bytes:
    if v < 0:
        v &= (1 << 64) - 1  # negative int32/int64 go out as 10-byte varints
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _zigzag_encode(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _to_signed(v: int, bits: int) -> int:
    v &= (1 << bits) - 1
    return v - (1 << bits) if v >= 1 << (bits - 1) else v


# ---------------------------------------------------------------- fields
def iter_fields(buf: bytes):
    """Yield (field_no, wire_type, raw) — raw is int for varint/i32/i64,
    bytes for length-delimited. Unknown fields are the caller's to skip."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = read_varint(buf, pos)
        field_no, wire = tag >> 3, tag & 0x7
        if wire == _WIRE_VARINT:
            val, pos = read_varint(buf, pos)
        elif wire == _WIRE_I64:
            if pos + 8 > n:
                raise WireError("truncated i64")
            (val,) = struct.unpack_from("<Q", buf, pos)
            pos += 8
        elif wire == _WIRE_LEN:
            ln, pos = read_varint(buf, pos)
            if pos + ln > n:
                raise WireError("truncated length-delimited")
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == _WIRE_I32:
            if pos + 4 > n:
                raise WireError("truncated i32")
            (val,) = struct.unpack_from("<I", buf, pos)
            pos += 4
        else:
            raise WireError(f"unsupported wire type {wire}")
        yield field_no, wire, val


# declared kind -> the only wire type a conforming encoder may use for it
# (packed repeated scalars arrive as LEN and are re-dispatched per element)
_KIND_WIRE = {
    "uint32": _WIRE_VARINT, "uint64": _WIRE_VARINT, "int32": _WIRE_VARINT,
    "int64": _WIRE_VARINT, "sint32": _WIRE_VARINT, "sint64": _WIRE_VARINT,
    "bool": _WIRE_VARINT, "string": _WIRE_LEN, "bytes": _WIRE_LEN,
    "float": _WIRE_I32, "fixed32": _WIRE_I32, "sfixed32": _WIRE_I32,
    "double": _WIRE_I64, "fixed64": _WIRE_I64, "sfixed64": _WIRE_I64,
}


def _decode_scalar(kind: str, wire: int, raw):
    # wire-type-vs-schema validation: a varint where a string is declared
    # (or any other mismatch) must surface as WireError so the parse sites'
    # "skip corrupt payload" handlers catch it — never TypeError/
    # AttributeError crashing the whole task
    exp = _KIND_WIRE.get(kind)
    if exp is None:
        raise WireError(f"unknown scalar kind {kind}")
    if wire != exp:
        raise WireError(f"wire type {wire} for {kind} field (expected {exp})")
    if kind == "uint32" or kind == "uint64":
        return int(raw)
    if kind in ("int32", "int64"):
        # negative int32/int64 are sign-extended 64-bit varints on the wire
        return _to_signed(raw, 64)
    if kind == "sint32" or kind == "sint64":
        return _zigzag_decode(raw)
    if kind == "bool":
        return bool(raw)
    if kind == "string":
        try:
            return raw.decode("utf-8")
        except UnicodeDecodeError as e:
            raise WireError(f"invalid utf-8 in string field: {e}") from None
    if kind == "bytes":
        return bytes(raw)
    if kind == "float":
        return struct.unpack("<f", struct.pack("<I", raw))[0]
    if kind == "double":
        return struct.unpack("<d", struct.pack("<Q", raw))[0]
    if kind == "fixed32":
        return int(raw)
    if kind == "fixed64":
        return int(raw)
    if kind == "sfixed32":
        return _to_signed(raw, 32)
    if kind == "sfixed64":
        return _to_signed(raw, 64)
    raise WireError(f"unknown scalar kind {kind}")


def decode_message(buf: bytes, schema: dict) -> dict:
    """Wire bytes -> plain dict (the MessageToDict analog, 07:133-135).
    Unknown field numbers are skipped; missing fields are absent."""
    out: dict = {}
    for field_no, wire, raw in iter_fields(buf):
        spec = schema.get(field_no)
        if spec is None:
            continue  # unknown field: skipped, like a real decoder
        name, kind = spec
        if isinstance(kind, tuple) and kind[0] == "repeated":
            inner = kind[1]
            if isinstance(inner, tuple) and inner[0] == "message":
                if wire != _WIRE_LEN:
                    raise WireError(
                        f"wire type {wire} for repeated message field")
                out.setdefault(name, []).append(decode_message(raw, inner[1]))
            elif wire == _WIRE_LEN and inner not in ("string", "bytes"):
                # packed repeated scalars: fixed-width kinds step 4/8 bytes,
                # everything else is varint-packed (per the wire spec)
                lst = out.setdefault(name, [])
                if inner in ("float", "fixed32", "sfixed32"):
                    if len(raw) % 4:
                        raise WireError("packed 32-bit field not 4-byte aligned")
                    for i in range(0, len(raw), 4):
                        (v,) = struct.unpack_from("<I", raw, i)
                        lst.append(_decode_scalar(inner, _WIRE_I32, v))
                elif inner in ("double", "fixed64", "sfixed64"):
                    if len(raw) % 8:
                        raise WireError("packed 64-bit field not 8-byte aligned")
                    for i in range(0, len(raw), 8):
                        (v,) = struct.unpack_from("<Q", raw, i)
                        lst.append(_decode_scalar(inner, _WIRE_I64, v))
                else:
                    pos = 0
                    while pos < len(raw):
                        v, pos = read_varint(raw, pos)
                        lst.append(_decode_scalar(inner, _WIRE_VARINT, v))
            else:
                out.setdefault(name, []).append(_decode_scalar(inner, wire, raw))
        elif isinstance(kind, tuple) and kind[0] == "message":
            if wire != _WIRE_LEN:
                raise WireError(f"wire type {wire} for message field")
            out[name] = decode_message(raw, kind[1])
        else:
            out[name] = _decode_scalar(kind, wire, raw)
    return out


# ---------------------------------------------------------------- encode
def _encode_scalar(field_no: int, kind: str, v) -> bytes:
    if kind in ("uint32", "uint64", "int32", "int64", "bool"):
        return encode_varint(field_no << 3 | _WIRE_VARINT) + encode_varint(int(v))
    if kind in ("sint32", "sint64"):
        return encode_varint(field_no << 3 | _WIRE_VARINT) + encode_varint(_zigzag_encode(int(v)))
    if kind == "string":
        b = v.encode("utf-8")
        return encode_varint(field_no << 3 | _WIRE_LEN) + encode_varint(len(b)) + b
    if kind == "bytes":
        return encode_varint(field_no << 3 | _WIRE_LEN) + encode_varint(len(v)) + bytes(v)
    if kind == "float":
        return encode_varint(field_no << 3 | _WIRE_I32) + struct.pack("<f", v)
    if kind == "double":
        return encode_varint(field_no << 3 | _WIRE_I64) + struct.pack("<d", v)
    if kind in ("fixed32", "sfixed32"):
        return encode_varint(field_no << 3 | _WIRE_I32) + struct.pack(
            "<I" if kind == "fixed32" else "<i", v)
    if kind in ("fixed64", "sfixed64"):
        return encode_varint(field_no << 3 | _WIRE_I64) + struct.pack(
            "<Q" if kind == "fixed64" else "<q", v)
    raise WireError(f"unknown scalar kind {kind}")


def encode_message(values: dict, schema: dict) -> bytes:
    """Fixture/round-trip helper: dict -> wire bytes (fields in field order)."""
    by_name = {spec[0]: (no, spec[1]) for no, spec in schema.items()}
    out = bytearray()
    for name in sorted(by_name, key=lambda n: by_name[n][0]):
        if name not in values:
            continue
        field_no, kind = by_name[name]
        v = values[name]
        if isinstance(kind, tuple) and kind[0] == "repeated":
            inner = kind[1]
            for item in v:
                if isinstance(inner, tuple) and inner[0] == "message":
                    sub = encode_message(item, inner[1])
                    out += encode_varint(field_no << 3 | _WIRE_LEN)
                    out += encode_varint(len(sub)) + sub
                else:
                    out += _encode_scalar(field_no, inner, item)
        elif isinstance(kind, tuple) and kind[0] == "message":
            sub = encode_message(v, kind[1])
            out += encode_varint(field_no << 3 | _WIRE_LEN)
            out += encode_varint(len(sub)) + sub
        else:
            out += _encode_scalar(field_no, kind, v)
    return bytes(out)


# ------------------------------------------------- representation schemas
# Shaped after the fields the reference actually reads:
# FrameInfo.frameNumber / FrameInfo.time (07:92-96).
FRAMEINFO = {1: ("frame_number", "uint32"), 2: ("frame_time", "uint32")}

# Image: width/height/payload bytes (06_extract_images.py image access).
IMAGE = {1: ("width", "uint32"), 2: ("height", "uint32"),
         3: ("format", "uint32"), 4: ("data", "bytes")}

# BallCandidates: repeated patches with a data blob that the reference
# STRIPS before storing (del patch["data"], 07:138-141).
PATCH = {1: ("min_x", "int32"), 2: ("min_y", "int32"),
         3: ("max_x", "int32"), 4: ("max_y", "int32"), 5: ("data", "bytes")}
BALLCANDIDATES = {1: ("patches", ("repeated", ("message", PATCH)))}

PARSERS: dict[str, dict] = {
    "FrameInfo": FRAMEINFO,
    "Image": IMAGE,
    "BallCandidates": BALLCANDIDATES,
}


def register_parser(name: str, schema: dict) -> None:
    PARSERS[name] = schema


def register_alias(alias: str, base: str) -> None:
    """The reference's Parser.register(alias, base) (07:217-221)."""
    PARSERS[alias] = PARSERS[base]


# ImageTop/BallCandidatesTop parse with the bottom-camera schemas — the
# exact aliases the reference registers (07:217-221, 06:368-370).
register_alias("ImageTop", "Image")
register_alias("BallCandidatesTop", "BallCandidates")


def parse(name: str, data: bytes) -> dict:
    """parser.parse(name, bytes) analog; raises KeyError on unknown name."""
    return decode_message(data, PARSERS[name])


def strip_blobs(name: str, message: dict) -> dict:
    """The reference's MessageToDict post-processing: BallCandidates patches
    lose their pixel blob before storage (07:138-141)."""
    if name in ("BallCandidates", "BallCandidatesTop"):
        patches = [{k: v for k, v in p.items() if k != "data"}
                   for p in message.get("patches", [])]
        return {"patches": patches}
    return message
