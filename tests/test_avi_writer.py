"""viz/avi.py MJPG/AVI writer, verified by an independent RIFF parser (no
video libraries in the image): container structure, header fields, idx1
offsets, and a JPEG roundtrip of the stored frames."""

import os
import struct

import pytest

import imageio.v2 as imageio
import numpy as np

from transhuman_tpu.viz.avi import MJPGWriter
from transhuman_tpu.viz.video import frames_to_video


# --------------------------------------------------------- RIFF parser

def _chunks(buf, off, end):
    """Yield (fourcc, payload_start, payload_size) top-level chunks."""
    out = []
    while off + 8 <= end:
        fcc = buf[off:off + 4]
        (size,) = struct.unpack("<I", buf[off + 4:off + 8])
        out.append((fcc, off + 8, size))
        off += 8 + size + (size & 1)  # chunks are 2-byte aligned
    assert off == end, f"chunk walk overran: {off} != {end}"
    return out


def parse_avi(path):
    buf = open(path, "rb").read()
    assert buf[:4] == b"RIFF" and buf[8:12] == b"AVI "
    (riff_size,) = struct.unpack("<I", buf[4:8])
    assert riff_size == len(buf) - 8, (riff_size, len(buf))

    lists = {}
    plain = {}
    for fcc, start, size in _chunks(buf, 12, len(buf)):
        if fcc == b"LIST":
            lists[buf[start:start + 4]] = (start + 4, size - 4)
        else:
            plain[fcc] = (start, size)

    # headers
    hstart, hsize = lists[b"hdrl"]
    hdr = dict(
        (fcc, (s, sz)) for fcc, s, sz in _chunks(buf, hstart, hstart + hsize)
        if fcc != b"LIST"
    )
    strl = [
        (s, sz) for fcc, s, sz in _chunks(buf, hstart, hstart + hsize)
        if fcc == b"LIST" and buf[s:s + 4] == b"strl"
    ]
    avih = struct.unpack("<14I", buf[slice(*[hdr[b"avih"][0],
                                             hdr[b"avih"][0] + 56])])
    ss, ssz = strl[0]
    sub = dict((fcc, (s, sz)) for fcc, s, sz in _chunks(buf, ss + 4, ss + ssz))
    strh = struct.unpack("<4s4sIHH8I4H", buf[sub[b"strh"][0]:
                                             sub[b"strh"][0] + 56])
    strf = struct.unpack("<IiiHH4sIiiII", buf[sub[b"strf"][0]:
                                              sub[b"strf"][0] + 40])

    # movi frames (lists[] start already skips the 'movi' fourcc)
    mstart, msize = lists[b"movi"]
    frames = [
        (s, sz) for fcc, s, sz in _chunks(buf, mstart, mstart + msize)
        if fcc == b"00dc"
    ]
    # idx1
    istart, isize = plain[b"idx1"]
    idx = [
        struct.unpack("<4sIII", buf[istart + 16 * i:istart + 16 * (i + 1)])
        for i in range(isize // 16)
    ]
    return dict(buf=buf, avih=avih, strh=strh, strf=strf, frames=frames,
                idx=idx, movi_fourcc_pos=mstart - 4)


# -------------------------------------------------------------- tests

def _frames(n=5, h=24, w=32):
    rng = np.random.default_rng(0)
    # smooth gradients, not noise: JPEG roundtrip must stay close
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    return [
        np.stack([x / w, y / h, np.full_like(x, i / n)], -1)
        for i in range(n)
    ]


def test_avi_structure(tmp_path):
    path = str(tmp_path / "out.avi")
    frames = _frames()
    with MJPGWriter(path, 32, 24, fps=10) as w:
        for f in frames:
            w.append(f)
    p = parse_avi(path)

    musec, _, _, flags, total, _, nstreams, sugbuf, width, height = p["avih"][:10]
    assert musec == 100000 and total == 5 and nstreams == 1
    assert (width, height) == (32, 24)
    assert flags & 0x10  # AVIF_HASINDEX

    fcc_type, handler, _, _, _, _, scale, rate, start, length = p["strh"][:10]
    assert fcc_type == b"vids" and handler == b"MJPG"
    assert (scale, rate) == (1, 10) and length == 5
    bisize, bw, bh, planes, bits, comp = p["strf"][:6]
    assert (bisize, bw, bh, planes, bits, comp) == (40, 32, 24, 1, 24, b"MJPG")

    assert len(p["frames"]) == 5 and len(p["idx"]) == 5
    assert sugbuf == max(sz for _, sz in p["frames"])
    for (s, sz), (fcc, fl, off, isz) in zip(p["frames"], p["idx"]):
        assert fcc == b"00dc" and fl == 0x10 and isz == sz
        # offset is relative to the 'movi' fourcc: chunk fourcc sits there
        cpos = p["movi_fourcc_pos"] + off
        assert p["buf"][cpos:cpos + 4] == b"00dc"
        assert p["buf"][s:s + 2] == b"\xff\xd8"  # JPEG SOI


def test_avi_frames_roundtrip(tmp_path):
    path = str(tmp_path / "out.avi")
    frames = _frames()
    with MJPGWriter(path, 32, 24, fps=10) as w:
        for f in frames:
            w.append(f)
    p = parse_avi(path)
    for f, (s, sz) in zip(frames, p["frames"]):
        dec = imageio.imread(p["buf"][s:s + sz]).astype(np.float32) / 255.0
        assert dec.shape == (24, 32, 3)
        assert np.abs(dec - np.clip(f, 0, 1)).mean() < 0.03


def test_frames_to_video_fallback(tmp_path, monkeypatch):
    fdir = tmp_path / "frames"
    fdir.mkdir()
    for i, f in enumerate(_frames()):
        imageio.imwrite(str(fdir / f"{i:04d}.png"),
                        (np.clip(f, 0, 1) * 255).astype(np.uint8))
    # force the no-ffmpeg path even if an encoder exists
    import imageio.v2 as iio2

    def boom(*a, **k):
        raise RuntimeError("no encoder")

    monkeypatch.setattr(iio2, "get_writer", boom)
    out = frames_to_video(str(fdir), str(tmp_path / "vid.mp4"), fps=10)
    assert out.endswith(".avi") and os.path.exists(out)
    p = parse_avi(out)
    assert len(p["frames"]) == 5


def test_encode_jpeg_uint16_and_bad_dtype():
    """Dtype-aware scaling (a blanket float path mapped every uint16 pixel
    >= 1 to 255 — near-solid-white output); unsupported ints reject."""
    from transhuman_tpu.viz.avi import encode_jpeg

    a16 = (np.linspace(0, 65535, 24 * 32 * 3).reshape(24, 32, 3)
           .astype(np.uint16))
    dec = imageio.imread(encode_jpeg(a16)).astype(np.float32)
    ref = (a16 >> 8).astype(np.float32)
    assert np.abs(dec - ref).mean() < 8.0  # jpeg-lossy but tracks the ramp
    with pytest.raises(ValueError, match="unsupported frame dtype"):
        encode_jpeg(np.zeros((4, 4, 3), np.int32))


def test_append_rejects_mismatched_frame_size(tmp_path):
    from transhuman_tpu.viz.avi import MJPGWriter

    with MJPGWriter(str(tmp_path / "v.avi"), 32, 24, 10) as w:
        w.append(np.zeros((24, 32, 3), np.uint8))
        with pytest.raises(ValueError, match="fixed-size"):
            w.append(np.zeros((16, 32, 3), np.uint8))


def test_frame_sort_is_numeric(tmp_path, monkeypatch):
    """'frame10000' must sort after 'frame9999' (lexical order spliced
    long sequences)."""
    from transhuman_tpu.viz.video import _numeric_key

    names = [f"frame{i:04d}.png" for i in (9998, 9999, 10000, 10001)]
    shuffled = sorted(names, reverse=True)
    assert sorted(shuffled, key=_numeric_key) == names
