"""TensorBoard event-file writer: structural verification with an
independent TFRecord/protobuf decoder (no tensorboard package in the image,
so the test decodes the wire format itself — framing CRCs, Event/Summary
message structure, scalar values, PNG image payloads)."""

import io
import struct

import numpy as np
import pytest

from transhuman_tpu.utils.recorder import Recorder
from transhuman_tpu.utils.tb_writer import TBWriter, crc32c, masked_crc32c


# ------------------------------------------------ independent decoder

def _read_varint(buf, off):
    n = shift = 0
    while True:
        b = buf[off]
        off += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, off
        shift += 7


def _decode_message(buf):
    """-> list of (field, wire, value) — values: varint int, 8/4-byte raw,
    or bytes for length-delimited."""
    out, off = [], 0
    while off < len(buf):
        key, off = _read_varint(buf, off)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, off = _read_varint(buf, off)
        elif wire == 1:
            v, off = buf[off:off + 8], off + 8
        elif wire == 5:
            v, off = buf[off:off + 4], off + 4
        elif wire == 2:
            ln, off = _read_varint(buf, off)
            v, off = buf[off:off + ln], off + ln
        else:
            raise AssertionError(f"unexpected wire type {wire}")
        out.append((field, wire, v))
    return out


def _read_records(path):
    raw = open(path, "rb").read()
    off, records = 0, []
    while off < len(raw):
        header = raw[off:off + 8]
        (ln,) = struct.unpack("<Q", header)
        (hc,) = struct.unpack("<I", raw[off + 8:off + 12])
        assert hc == masked_crc32c(header), "header CRC mismatch"
        data = raw[off + 12:off + 12 + ln]
        (dc,) = struct.unpack("<I", raw[off + 12 + ln:off + 16 + ln])
        assert dc == masked_crc32c(data), "payload CRC mismatch"
        records.append(data)
        off += 16 + ln
    return records


def _events(path):
    """-> list of (step, {tag: scalar}, {tag: image_fields}) per event."""
    evs = []
    for rec in _read_records(path):
        fields = _decode_message(rec)
        step = next((v for f, w, v in fields if f == 2 and w == 0), 0)
        version = next((v for f, w, v in fields if f == 3), None)
        scalars, images = {}, {}
        for f, w, v in fields:
            if f != 5:
                continue
            for vf, vw, vv in _decode_message(v):
                assert vf == 1  # Summary.value
                tag = value = img = None
                for sf, sw, sv in _decode_message(vv):
                    if sf == 1:
                        tag = sv.decode()
                    elif sf == 2:
                        (value,) = struct.unpack("<f", sv)
                    elif sf == 4:
                        img = dict(
                            (imf, imv)
                            for imf, imw, imv in _decode_message(sv)
                        )
                if value is not None:
                    scalars[tag] = value
                if img is not None:
                    images[tag] = img
        evs.append((step, scalars, images, version))
    return evs


# ------------------------------------------------------------- tests

def test_crc32c_known_answer():
    # RFC 3720 test vector
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_writer_stream_roundtrip(tmp_path):
    w = TBWriter(str(tmp_path))
    w.add_scalar("loss", 0.25, step=7)
    w.add_scalars({"psnr": 31.5, "lr": 7e-4}, step=8)
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    w.add_image("pred", img, step=9)
    w.close()

    evs = _events(w.path)
    assert evs[0][3] == b"brain.Event:2"  # file_version header event
    step, scalars, _, _ = evs[1]
    assert step == 7 and scalars == {"loss": pytest.approx(0.25)}
    step, scalars, _, _ = evs[2]
    assert step == 8
    assert scalars["psnr"] == pytest.approx(31.5)
    assert scalars["lr"] == pytest.approx(7e-4)
    step, _, images, _ = evs[3]
    assert step == 9 and set(images) == {"pred"}
    im = images["pred"]
    assert im[1] == 4 and im[2] == 6 and im[3] == 3  # h, w, colorspace
    # field 4 is real PNG bytes that decode back to the input
    import imageio.v2 as imageio

    back = imageio.imread(io.BytesIO(im[4]))
    np.testing.assert_array_equal(back, img)


def test_recorder_writes_both_streams(tmp_path):
    rec = Recorder(record_dir=str(tmp_path), record_interval=2, enabled=True)
    for step in range(4):
        rec.step = step
        rec.update({"loss": float(step)})
        rec.record(prefix="train", extra={"lr": 1e-3})
    rec.record_image("patch", np.zeros((8, 8, 3), np.uint8))
    rec.close()

    jsonl = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    assert len(jsonl) == 2  # steps 0 and 2 at record_interval=2

    event_files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(event_files) == 1
    evs = _events(str(event_files[0]))
    scalar_evs = [e for e in evs if e[1]]
    assert len(scalar_evs) == 2
    assert "train/loss" in scalar_evs[0][1]
    assert "train/lr" in scalar_evs[0][1]
    image_evs = [e for e in evs if e[2]]
    assert len(image_evs) == 1 and "train/patch" in image_evs[0][2]


def test_recorder_disabled_writes_nothing(tmp_path):
    rec = Recorder(record_dir=str(tmp_path), enabled=False)
    rec.update({"loss": 1.0})
    rec.record()
    rec.record_image("x", np.zeros((2, 2), np.uint8))
    rec.close()
    assert not list(tmp_path.iterdir())


def test_crc32c_native_matches_python(monkeypatch):
    """native/crc32c.cc (SSE4.2 / slicing-by-8) must be bit-identical to
    the pure-Python table loop on arbitrary buffers incl. NUL bytes."""
    import transhuman_tpu.utils.tb_writer as tbw

    fn = tbw._crc_native()
    if fn is None:
        pytest.skip("native crc32c not buildable here")

    def py_crc(data):
        tab = tbw._crc_table()
        c = 0xFFFFFFFF
        for b in data:
            c = tab[(c ^ b) & 0xFF] ^ (c >> 8)
        return c ^ 0xFFFFFFFF

    rng = np.random.default_rng(0)
    for n in (0, 1, 7, 8, 9, 63, 1024, 100_003):
        buf = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert int(fn(buf, len(buf))) == py_crc(buf)


def test_add_image_grayscale(tmp_path):
    """Regression: a 2-D image crashed _encode_image (pillow rejects
    (H, W, 1)); grayscale must encode with colorspace=1."""
    w = TBWriter(str(tmp_path))
    img = np.arange(4 * 6, dtype=np.uint8).reshape(4, 6)
    w.add_image("depth", img, step=1)
    w.close()
    evs = _events(w.path)
    im = evs[1][2]["depth"]
    assert im[1] == 4 and im[2] == 6 and im[3] == 1
    import imageio.v2 as imageio

    back = imageio.imread(io.BytesIO(im[4]))
    np.testing.assert_array_equal(np.asarray(back).reshape(4, 6), img)


def test_two_writers_same_second_distinct_files(tmp_path):
    """Regression: the filename had 1-second resolution and no pid/uid —
    two writers in the same second append-interleaved into ONE file."""
    w1 = TBWriter(str(tmp_path))
    w2 = TBWriter(str(tmp_path))
    assert w1.path != w2.path
    w1.add_scalar("a", 1.0, 0)
    w2.add_scalar("b", 2.0, 0)
    w1.close()
    w2.close()
    assert _events(w1.path)[1][1] == {"a": pytest.approx(1.0)}
    assert _events(w2.path)[1][1] == {"b": pytest.approx(2.0)}
