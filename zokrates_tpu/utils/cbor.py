"""Minimal CBOR (RFC 8949) encoder/decoder.

Covers the subset serde_cbor emits for the reference IR types: unsigned /
negative ints, byte strings, text strings, arrays, maps, null, bool.
Supports streaming decode (concatenated top-level items), which is how the
constraints section is written (one CBOR item per statement).
"""

from __future__ import annotations

import io
import struct
from typing import Any, Iterator, List, Tuple


def _head(major: int, arg: int) -> bytes:
    if arg < 24:
        return bytes([(major << 5) | arg])
    if arg < 0x100:
        return bytes([(major << 5) | 24, arg])
    if arg < 0x10000:
        return bytes([(major << 5) | 25]) + arg.to_bytes(2, "big")
    if arg < 0x100000000:
        return bytes([(major << 5) | 26]) + arg.to_bytes(4, "big")
    return bytes([(major << 5) | 27]) + arg.to_bytes(8, "big")


def encode(obj: Any) -> bytes:
    out = io.BytesIO()
    _encode(obj, out)
    return out.getvalue()


def _encode(obj: Any, out: io.BytesIO):
    if obj is None:
        out.write(b"\xf6")
    elif obj is True:
        out.write(b"\xf5")
    elif obj is False:
        out.write(b"\xf4")
    elif isinstance(obj, int):
        if obj >= 0:
            out.write(_head(0, obj))
        else:
            out.write(_head(1, -1 - obj))
    elif isinstance(obj, bytes):
        out.write(_head(2, len(obj)))
        out.write(obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        out.write(_head(3, len(b)))
        out.write(b)
    elif isinstance(obj, (list, tuple)):
        out.write(_head(4, len(obj)))
        for item in obj:
            _encode(item, out)
    elif isinstance(obj, dict):
        out.write(_head(5, len(obj)))
        for k, v in obj.items():
            _encode(k, out)
            _encode(v, out)
    elif isinstance(obj, float):
        out.write(b"\xfb" + struct.pack(">d", obj))
    else:
        raise TypeError(f"cannot CBOR-encode {type(obj)}")


class Decoder:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def eof(self) -> bool:
        return self.pos >= len(self.data)

    def _read(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated CBOR")
        self.pos += n
        return b

    def _arg(self, info: int) -> int:
        if info < 24:
            return info
        if info == 24:
            return self._read(1)[0]
        if info == 25:
            return int.from_bytes(self._read(2), "big")
        if info == 26:
            return int.from_bytes(self._read(4), "big")
        if info == 27:
            return int.from_bytes(self._read(8), "big")
        raise ValueError(f"unsupported additional info {info}")

    def decode(self) -> Any:
        ib = self._read(1)[0]
        major, info = ib >> 5, ib & 0x1F
        if major == 0:
            return self._arg(info)
        if major == 1:
            return -1 - self._arg(info)
        if major == 2:
            return self._read(self._arg(info))
        if major == 3:
            return self._read(self._arg(info)).decode("utf-8")
        if major == 4:
            if info == 31:  # indefinite
                out = []
                while self.data[self.pos] != 0xFF:
                    out.append(self.decode())
                self.pos += 1
                return out
            return [self.decode() for _ in range(self._arg(info))]
        if major == 5:
            if info == 31:
                out = {}
                while self.data[self.pos] != 0xFF:
                    k = self.decode()
                    out[k] = self.decode()
                self.pos += 1
                return out
            n = self._arg(info)
            out = {}
            for _ in range(n):
                k = self.decode()
                out[k] = self.decode()
            return out
        if major == 6:  # tag: decode and ignore the tag
            self._arg(info)
            return self.decode()
        if major == 7:
            if info == 20:
                return False
            if info == 21:
                return True
            if info == 22 or info == 23:
                return None
            if info == 26:
                return struct.unpack(">f", self._read(4))[0]
            if info == 27:
                return struct.unpack(">d", self._read(8))[0]
        raise ValueError(f"unsupported CBOR item major={major} info={info}")


def decode(data: bytes) -> Any:
    return Decoder(data).decode()


def decode_stream(data: bytes) -> Iterator[Any]:
    dec = Decoder(data)
    while not dec.eof():
        yield dec.decode()
