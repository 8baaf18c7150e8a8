"""BMP encode/parse path (operators/multimodal.py, round-5 upgrade of
the image decode from md5-fake to real byte-level parsing): header
field exactness, row padding, bottom-up layout, and empty payloads —
pure-python checks, no Spark session needed."""

from __future__ import annotations

from kafkastreamer_spark.operators.multimodal import (
    _BMP_ROW,
    _BMP_W,
    _parse_bmp,
    _text_to_bmp,
)


def test_header_is_spec_valid():
    data = b"x" * 100  # 100 bytes -> 3 rows of 48, padded to 144
    bmp = _text_to_bmp(data)
    assert bmp[:2] == b"BM"
    assert int.from_bytes(bmp[2:6], "little") == len(bmp) == 54 + 144
    assert int.from_bytes(bmp[10:14], "little") == 54
    assert int.from_bytes(bmp[14:18], "little") == 40
    assert int.from_bytes(bmp[18:22], "little") == _BMP_W
    assert int.from_bytes(bmp[22:26], "little") == 3
    assert int.from_bytes(bmp[28:30], "little") == 24
    assert int.from_bytes(bmp[30:34], "little") == 0  # BI_RGB


def test_round_trip_stats_and_padding():
    data = bytes(range(1, 101))  # sum = 5050, 100 bytes -> h=3
    w, h, total, top, npx = _parse_bmp(_text_to_bmp(data))
    assert (w, h, npx) == (_BMP_W, 3, 144)
    assert total == 5050  # zero padding adds nothing
    # bottom-up: image TOP row is the LAST 48-byte stride = bytes 97..100
    assert top == 97 + 98 + 99 + 100


def test_exact_multiple_of_row():
    data = b"\x01" * (2 * _BMP_ROW)
    w, h, total, top, npx = _parse_bmp(_text_to_bmp(data))
    assert (h, npx) == (2, 96)
    assert total == 96
    assert top == _BMP_ROW  # full second row of 0x01


def test_empty_payload_is_one_blank_row():
    w, h, total, top, npx = _parse_bmp(_text_to_bmp(b""))
    assert (w, h, total, top, npx) == (_BMP_W, 1, 0, 0, _BMP_ROW)


def test_parser_rejects_non_bmp():
    import pytest

    with pytest.raises(ValueError):
        _parse_bmp(b"GIF89a not a bmp")
