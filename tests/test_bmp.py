"""Native BMP decoder tests: layout traps — 4-byte row padding,
bottom-up vs top-down row order, BGR channel order, BGRA palette,
sub-byte (4-bit) index unpacking."""

from __future__ import annotations

import struct

import numpy as np

from etl_knlp_spark.operators.multimodal import (
    _decode_bmp,
    _encode_bmp_gray8,
    decode_media,
)


def _wrap_bmp(w, h, bpp, pal, pixel_rows, top_down=False):
    stride = ((w * bpp + 7) // 8 + 3) & ~3
    body = b"".join(r + b"\x00" * (stride - len(r)) for r in pixel_rows)
    data_off = 14 + 40 + len(pal)
    out = b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
    out += struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bpp, 0,
        len(body), 0, 0, len(pal) // 4, 0,
    )
    return out + pal + body


def test_bottom_up_rows_and_padding():
    """3×2 8-bit image stored bottom-up with 1-byte row padding: the
    decoder must flip rows and drop pad bytes."""
    pal = b"".join(bytes([i, i, i, 0]) for i in range(256))
    # storage order: LAST logical row first (bottom-up)
    rows_storage = [bytes([4, 5, 6]), bytes([1, 2, 3])]
    arr = _decode_bmp(_wrap_bmp(3, 2, 8, pal, rows_storage))
    assert bytes(arr[0, :, 0]) == bytes([1, 2, 3])
    assert bytes(arr[1, :, 0]) == bytes([4, 5, 6])


def test_top_down_negative_height():
    pal = b"".join(bytes([i, i, i, 0]) for i in range(256))
    rows_storage = [bytes([1, 2, 3]), bytes([4, 5, 6])]
    arr = _decode_bmp(_wrap_bmp(3, 2, 8, pal, rows_storage, top_down=True))
    assert bytes(arr[0, :, 0]) == bytes([1, 2, 3])


def test_24bit_bgr_to_rgb():
    # one pixel stored B,G,R = 10,20,30 -> RGB (30,20,10)
    arr = _decode_bmp(_wrap_bmp(1, 1, 24, b"", [bytes([10, 20, 30])]))
    assert tuple(arr[0, 0]) == (30, 20, 10)


def test_4bit_palette_unpacking():
    """Width 3 at 4bpp: two bytes per row, high nibble first, the
    final nibble is padding."""
    pal = b"".join(bytes([i * 16, 0, 0, 0]) for i in range(16))  # B channel
    row = bytes([(1 << 4) | 2, (3 << 4)])
    arr = _decode_bmp(_wrap_bmp(3, 1, 4, pal, [row]))
    # palette stores blue channel -> RGB index 2
    assert list(arr[0, :, 2]) == [16, 32, 48]


def test_decode_media_routes_bmp():
    payload = _encode_bmp_gray8(b"route bmp")
    arr = decode_media(payload, "image/bmp")
    assert bytes(arr[0, :, 0]) == b"route bmp"
    arr2 = decode_media(payload, "image/unknown")
    assert (arr2 == arr).all()


def test_malformed_inputs_raise_cleanly():
    import struct

    import pytest

    good = _encode_bmp_gray8(b"abc")
    with pytest.raises(ValueError, match="not a BMP"):
        _decode_bmp(b"XX" + good[2:])
    # RLE8 compression flag -> explicit refusal
    bad = bytearray(good)
    struct.pack_into("<I", bad, 30, 1)
    with pytest.raises(NotImplementedError, match="compression"):
        _decode_bmp(bytes(bad))


def test_small_os2_coreheader_is_named_not_called_truncated():
    """r10 ADVICE: an OS/2 BITMAPCOREHEADER file is legal at < 50
    bytes (14-byte file header + 12-byte core header), so it must get
    the accurate NotImplementedError naming the header family — not
    the generic 'truncated' ValueError the length guard emits."""
    import pytest

    # minimal complete OS/2 v1 BMP: file header + 12-byte core header
    core = struct.pack("<IHHHH", 12, 1, 1, 1, 8)  # size,w,h,planes,bpp
    payload = b"BM" + struct.pack("<IHHI", 14 + 12, 0, 0, 14 + 12) + core
    assert len(payload) < 50
    with pytest.raises(NotImplementedError, match="BITMAPCOREHEADER"):
        _decode_bmp(payload)
    # a genuinely truncated BI_RGB header (hdr_size 40 readable, body
    # cut) still takes the truncation ValueError
    full = _encode_bmp_gray8(b"abc")
    with pytest.raises(ValueError, match="truncated BMP"):
        _decode_bmp(full[:30])


def test_pixel_index_past_short_palette_raises_valueerror():
    """r9 ADVICE #2: a pixel index beyond the declared color-table
    length must be the documented ValueError (the PNG palette-index
    guard), not numpy IndexError from pal[idx]. Shrink the declared
    biClrUsed to 8 entries while the pixels index 'a'..'c' (97..99)."""
    import struct

    import pytest

    bad = bytearray(_encode_bmp_gray8(b"abc"))
    struct.pack_into("<I", bad, 46, 8)  # biClrUsed: 256 -> 8
    with pytest.raises(ValueError, match="exceeds the 8-entry color table"):
        _decode_bmp(bytes(bad))


def test_truncated_palette_and_pixels_raise_valueerror():
    """Truncation at the color table or the pixel array stays inside
    the ValueError contract with a message naming the cut."""
    import pytest

    good = _encode_bmp_gray8(b"abcdef")
    # cut inside the 1024-byte palette
    with pytest.raises(ValueError, match="color table cut off"):
        _decode_bmp(good[: 14 + 40 + 100])
    # cut inside the pixel rows (keep palette intact)
    with pytest.raises(ValueError, match="pixel array cut off"):
        _decode_bmp(good[:-3])
