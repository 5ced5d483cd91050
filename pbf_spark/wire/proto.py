"""Minimal proto2 wire scanner / builder.

Just enough of the public protobuf wire format to read and write the OSM
PBF messages (BlobHeader, Blob, HeaderBlock, PrimitiveBlock and friends —
see the public osmformat/fileformat spec; field layout mirrored from
/root/reference/internal/pb/osm.proto). We deliberately do NOT depend on
``google.protobuf``: blocks are scanned field-by-field in Python (cheap —
a handful of fields per 8000-entity block) and all packed numeric
payloads are handed to the vectorized decoders in ``varint.py``.
"""

from __future__ import annotations

from .varint import decode_varint, encode_varint

WT_VARINT = 0
WT_I64 = 1
WT_LEN = 2
WT_I32 = 5


def scan_fields(buf: bytes | memoryview):
    """Yield (field_number, wire_type, value) over a serialized message.

    value is an int for WT_VARINT and a memoryview for WT_LEN / WT_I64 /
    WT_I32 (fixed widths returned as raw bytes; caller interprets).
    """
    mv = memoryview(buf)
    pos = 0
    end = len(mv)
    while pos < end:
        key, pos = decode_varint(mv, pos)
        field, wt = key >> 3, key & 7
        if wt == WT_VARINT:
            val, pos = decode_varint(mv, pos)
            yield field, wt, val
        elif wt == WT_LEN:
            ln, pos = decode_varint(mv, pos)
            yield field, wt, mv[pos : pos + ln]
            pos += ln
        elif wt == WT_I64:
            yield field, wt, mv[pos : pos + 8]
            pos += 8
        elif wt == WT_I32:
            yield field, wt, mv[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt} for field {field}")


def parse_message(buf: bytes | memoryview) -> dict[int, list]:
    """Collect all fields of a message: field number → list of values."""
    out: dict[int, list] = {}
    for field, _wt, val in scan_fields(buf):
        out.setdefault(field, []).append(val)
    return out


class MessageBuilder:
    """Append-only proto2 message writer."""

    __slots__ = ("_parts",)

    def __init__(self) -> None:
        self._parts: list[bytes] = []

    def varint(self, field: int, value: int) -> "MessageBuilder":
        self._parts.append(encode_varint(field << 3 | WT_VARINT))
        self._parts.append(encode_varint(value))
        return self

    def svarint(self, field: int, value: int) -> "MessageBuilder":
        return self.varint(field, ((value << 1) ^ (value >> 63)) & (2**64 - 1))

    def bytes_field(self, field: int, payload: bytes) -> "MessageBuilder":
        self._parts.append(encode_varint(field << 3 | WT_LEN))
        self._parts.append(encode_varint(len(payload)))
        self._parts.append(bytes(payload))
        return self

    def string(self, field: int, value: str) -> "MessageBuilder":
        return self.bytes_field(field, value.encode("utf-8"))

    def message(self, field: int, builder: "MessageBuilder") -> "MessageBuilder":
        return self.bytes_field(field, builder.tobytes())

    def tobytes(self) -> bytes:
        return b"".join(self._parts)
