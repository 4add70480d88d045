"""TensorBoard event-writer round trip: the hand-encoded TFRecord/protobuf
scalar events must parse back exactly (utils/tensorboard.py — the
TensorboardLoggerHook replacement, vocc.py:286-291)."""

import struct

import numpy as np

from vln_ver_tpu.utils.tensorboard import (SummaryWriter, _crc32c,
                                           read_scalars)


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert _crc32c(b"") == 0x00000000
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(bytes(32)) == 0x8A9136AA


def test_scalar_events_round_trip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.5, 10)
    w.add_scalar("train/loss", 0.75, 20)
    w.add_scalars({"val/miou": 42.0, "val/skipme": "nan-string"}, 30)
    w.close()

    events = read_scalars(w.path)
    assert events == [
        (10, "train/loss", 1.5),
        (20, "train/loss", 0.75),
        (30, "val/miou", 42.0),
    ]


def test_tfrecord_framing_crcs_valid(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("a", 1.0, 1)
    w.close()
    with open(w.path, "rb") as f:
        data = f.read()
    pos = 0
    n_records = 0
    from vln_ver_tpu.utils.tensorboard import _masked_crc
    while pos < len(data):
        header = data[pos:pos + 8]
        (length,) = struct.unpack("<Q", header)
        (hcrc,) = struct.unpack_from("<I", data, pos + 8)
        assert hcrc == _masked_crc(header)
        record = data[pos + 12:pos + 12 + length]
        (rcrc,) = struct.unpack_from("<I", data, pos + 12 + length)
        assert rcrc == _masked_crc(record)
        pos += 12 + length + 4
        n_records += 1
    assert n_records == 2  # file_version + one scalar
    assert np.isclose(read_scalars(w.path)[0][2], 1.0)


def test_long_tag_roundtrips(tmp_path):
    """Tags long enough to need multi-byte varint lengths (>= ~119 chars
    pushes the Value submessage past 127 bytes) must round-trip —
    regression: read_scalars decoded lengths as single bytes."""
    from vln_ver_tpu.utils.tensorboard import SummaryWriter, read_scalars

    tag = "train/" + "very_long_metric_name_" * 8   # ~182 chars
    w = SummaryWriter(str(tmp_path))
    w.add_scalar(tag, 0.125, 7)
    w.close()
    import glob
    (path,) = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    rows = [r for r in read_scalars(path) if r[1] == tag]
    assert rows == [(7, tag, 0.125)]
