"""Dependency-free TensorBoard event-file writer.

The reference records training scalars and images through tensorboardX
(`lib/train/recorder.py:49-51,82-100`); this image has no tensorboard
package, so the recorder writes the same streams as native TFRecord event
files that `tensorboard --logdir` reads directly.  The format is small and
stable:

* file: `events.out.tfevents.<wall_time>.<hostname>` containing TFRecords —
  each record is `uint64 len | uint32 masked_crc32c(len) | bytes data |
  uint32 masked_crc32c(data)`.
* record payload: an `Event` protobuf (wall_time=1 double, step=2 int64,
  file_version=3 string, summary=5 message); `Summary` holds repeated
  `Value` (tag=1 string, simple_value=2 float, image=4 message); the image
  message is height/width/colorspace varints + PNG bytes (field 4).

Both the protobuf encoding (varint/fixed-width, hand-rolled below — the
schema is 4 tiny messages) and CRC32C (Castagnoli, table-driven) are
implemented here so nothing outside the stdlib + imageio (PNG bytes) is
needed.  Verified structurally by tests/test_tb_writer.py's independent
decoder.
"""

from __future__ import annotations

import os
import socket
import struct
import time
from typing import Optional

# ---------------------------------------------------------------- crc32c

_CRC_TABLE = []
_CRC_NATIVE = 0  # 0 = untried, None = unbuildable, else the ctypes fn


def _crc_table():
    global _CRC_TABLE
    if not _CRC_TABLE:
        poly = 0x82F63B78  # Castagnoli, reflected
        tab = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            tab.append(c)
        _CRC_TABLE = tab
    return _CRC_TABLE


def _crc_native():
    """ctypes handle to native/crc32c.cc (SSE4.2 CRC32 instruction where
    -march=native allows, slicing-by-8 otherwise): image records are
    hundreds of KB and the pure-Python per-byte loop costs tens of ms per
    add_image on a 1-core host.  None when g++ is unavailable — the Python
    loop below stays the fallback (bit-identical, cross-tested)."""
    global _CRC_NATIVE
    if _CRC_NATIVE == 0:
        import ctypes

        try:
            from ..native import load_library

            lib = load_library("crc32c")
        except Exception:
            lib = None
        if lib is None:
            _CRC_NATIVE = None
        else:
            fn = lib.crc32c_raw
            fn.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
            fn.restype = ctypes.c_uint32
            _CRC_NATIVE = fn
    return _CRC_NATIVE


def crc32c(data: bytes) -> int:
    fn = _crc_native()
    if fn is not None:
        return int(fn(data, len(data)))
    tab = _crc_table()
    c = 0xFFFFFFFF
    for b in data:
        c = tab[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    """TFRecord CRC masking (kMaskDelta rotation)."""
    c = crc32c(data)
    return ((c >> 15) | (c << 17)) + 0xA282EAD8 & 0xFFFFFFFF


# ------------------------------------------------------------- protobuf

def _varint(n: int) -> bytes:
    if n < 0:
        # protobuf encodes negative int64 as 10-byte two's complement; the
        # unsigned loop below would never terminate (-1 >> 7 == -1)
        n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _pb_bytes(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _pb_varint(field: int, value: int) -> bytes:
    return _key(field, 0) + _varint(value)


def _pb_double(field: int, value: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", value)


def _pb_float(field: int, value: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", value)


def _encode_image(arr) -> bytes:
    """Summary.Image message from an (H, W[, C]) uint8/float array."""
    import imageio.v2 as imageio
    import numpy as np

    a = np.asarray(arr)
    if a.dtype != np.uint8:
        a = (np.clip(a, 0.0, 1.0) * 255).astype(np.uint8)
    if a.ndim == 2:
        # keep the 2-D shape for the encoder: pillow rejects (H, W, 1)
        # ("can't write images with one color channel") but writes plain
        # 2-D grayscale fine; the proto records colorspace=1 either way
        h, w, c = a.shape + (1,)
    else:
        h, w, c = a.shape
    png = imageio.imwrite("<bytes>", a, format="png")
    return (
        _pb_varint(1, h)
        + _pb_varint(2, w)
        + _pb_varint(3, c)  # colorspace: 1=gray, 3=rgb, 4=rgba
        + _pb_bytes(4, png)
    )


def _event(step: int, summary: bytes = b"", file_version: str = "") -> bytes:
    msg = _pb_double(1, time.time()) + _pb_varint(2, step)
    if file_version:
        msg += _pb_bytes(3, file_version.encode())
    if summary:
        msg += _pb_bytes(5, summary)
    return msg


# --------------------------------------------------------------- writer

class TBWriter:
    """Append-only scalar/image event stream (tensorboardX SummaryWriter
    analog for the two calls the reference makes: add_scalar, add_image)."""

    _uid = 0  # per-process counter (see filename note below)

    def __init__(self, log_dir: str, filename_suffix: str = ""):
        os.makedirs(log_dir, exist_ok=True)
        # pid + per-process uid in the name, like TF's own writer: two
        # writers created in the same SECOND in the same log_dir (train
        # loop + validate(), fast tests) would otherwise append-interleave
        # into one file and split TFRecords across flush boundaries
        TBWriter._uid += 1
        name = "events.out.tfevents.%010d.%s.%d.%d%s" % (
            int(time.time()), socket.gethostname(), os.getpid(),
            TBWriter._uid, filename_suffix,
        )
        self.path = os.path.join(log_dir, name)
        self._fh: Optional[object] = open(self.path, "ab")
        self._write_record(_event(0, file_version="brain.Event:2"))

    def _write_record(self, payload: bytes):
        header = struct.pack("<Q", len(payload))
        self._fh.write(header)
        self._fh.write(struct.pack("<I", masked_crc32c(header)))
        self._fh.write(payload)
        self._fh.write(struct.pack("<I", masked_crc32c(payload)))

    # -- public API ----------------------------------------------------
    def add_scalar(self, tag: str, value: float, step: int):
        v = _pb_bytes(1, tag.encode()) + _pb_float(2, float(value))
        self._write_record(_event(step, summary=_pb_bytes(1, v)))

    def add_scalars(self, scalars: dict, step: int):
        summary = b"".join(
            _pb_bytes(1, _pb_bytes(1, t.encode()) + _pb_float(2, float(v)))
            for t, v in scalars.items()
        )
        self._write_record(_event(step, summary=summary))

    def add_image(self, tag: str, image, step: int):
        v = _pb_bytes(1, tag.encode()) + _pb_bytes(4, _encode_image(image))
        self._write_record(_event(step, summary=_pb_bytes(1, v)))

    def flush(self):
        if self._fh:
            self._fh.flush()

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None
