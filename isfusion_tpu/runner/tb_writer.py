"""Dependency-free TensorBoard event-file writer.

Parity: the reference config registers a ``TensorboardLoggerHook``
(`/root/reference/configs/isfusion/isfusion_0075voxel.py:423-428`) whose
mmcv implementation streams scalars through tensorboardX. For
deployments without tensorboardX this module emits the same on-disk
artifact directly: a ``events.out.tfevents.*`` file in TensorBoard's native
TFRecord format, hand-encoding the two tiny protos involved
(``Event`` and ``Summary``) so real TensorBoard can read the result
with zero extra dependencies here.

Wire format (TFRecord): for each record,
``uint64 len (LE) | uint32 masked_crc32c(len) | data | uint32
masked_crc32c(data)`` where ``masked_crc = rotr15(crc32c(x)) +
0xa282ead8``. The first record is the ``file_version`` handshake event
(``brain.Event:2``); each scalar is an ``Event{wall_time, step,
summary=Summary{value=[{tag, simple_value}]}}``.
"""
from __future__ import annotations

import os
import socket
import struct
import time

# --- CRC32C (Castagnoli, poly 0x1EDC6F41 reflected = 0x82F63B78) -------

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ (0x82F63B78 if (_c & 1) else 0)
    _CRC_TABLE.append(_c)


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# --- minimal protobuf wire encoding ------------------------------------

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        byte = n & 0x7F
        n >>= 7
        if n:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _f64(field: int, v: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", v)


def _f32(field: int, v: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", v)


def _int64(field: int, v: int) -> bytes:
    return _key(field, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _bytes(field: int, v: bytes) -> bytes:
    return _key(field, 2) + _varint(len(v)) + v


def _scalar_event(tag: str, value: float, step: int,
                  wall_time: float) -> bytes:
    # Summary.Value: tag=1 (string), simple_value=2 (float)
    sv = _bytes(1, tag.encode("utf-8")) + _f32(2, float(value))
    summary = _bytes(1, sv)                       # Summary.value = 1
    # Event: wall_time=1 (double), step=2 (int64), summary=5 (message)
    return _f64(1, wall_time) + _int64(2, int(step)) + _bytes(5, summary)


def _version_event(wall_time: float) -> bytes:
    # Event.file_version = 3 (string)
    return _f64(1, wall_time) + _bytes(3, b"brain.Event:2")


class SummaryWriter:
    """add_scalar/flush/close subset of tensorboardX.SummaryWriter."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        fname = "events.out.tfevents.%010d.%s" % (
            int(time.time()), socket.gethostname())
        self._path = os.path.join(log_dir, fname)
        self._f = open(self._path, "ab")
        self._write_record(_version_event(time.time()))

    def _write_record(self, data: bytes) -> None:
        header = struct.pack("<Q", len(data))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(data)
        self._f.write(struct.pack("<I", _masked_crc(data)))

    def add_scalar(self, tag: str, value: float, global_step: int = 0,
                   walltime: float | None = None) -> None:
        self._write_record(_scalar_event(
            tag, value, global_step,
            time.time() if walltime is None else walltime))

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        if not self._f.closed:
            self._f.flush()
            self._f.close()


def read_scalars(path: str):
    """Parse an event file back into [(tag, value, step)] — test helper
    and `tools/analysis_tools/analyze_logs.py` input path."""
    out = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            if hcrc != _masked_crc(header):
                raise ValueError("corrupt record header CRC")
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            if dcrc != _masked_crc(data):
                raise ValueError("corrupt record data CRC")
            out.extend(_parse_event(data))
    return out


def _read_varint(buf: bytes, i: int):
    shift = n = 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def _fields(buf: bytes):
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
        elif wire == 1:
            v, i = buf[i:i + 8], i + 8
        elif wire == 5:
            v, i = buf[i:i + 4], i + 4
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            v, i = buf[i:i + ln], i + ln
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v


def _parse_event(data: bytes):
    step, summary = 0, None
    for field, _w, v in _fields(data):
        if field == 2:
            # int64 step arrives as an unsigned varint; restore the sign
            # (two's complement) so negative steps round-trip.
            step = v - (1 << 64) if v >= (1 << 63) else v
        elif field == 5:
            summary = v
    if summary is None:
        return []
    out = []
    for field, _w, v in _fields(summary):
        if field != 1:
            continue
        tag, value = None, None
        for f2, _w2, v2 in _fields(v):
            if f2 == 1:
                tag = v2.decode("utf-8")
            elif f2 == 2:
                (value,) = struct.unpack("<f", v2)
        if tag is not None and value is not None:
            out.append((tag, value, step))
    return out
