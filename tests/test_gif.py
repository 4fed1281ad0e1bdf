"""Native GIF/LZW codec tests: roundtrips across dictionary regimes,
an encoder-INDEPENDENT hand-packed uncompressed-style fixture (pins
LSB-first bit order, clear/EOI handling, and sub-block framing without
trusting the dual encoder), interlace reorder, and a pillow
cross-check where PIL is installed."""

from __future__ import annotations

import random

import numpy as np
import pytest

from etl_knlp_spark.operators.multimodal import (
    _decode_gif,
    _encode_gif_gray,
    _lzw_decode,
    _lzw_encode,
    decode_media,
)


def _pack_codes(codes, width_of):
    """Tiny independent LSB-first packer (no shared code with the
    production encoder)."""
    acc = nbits = 0
    out = bytearray()
    for i, c in enumerate(codes):
        w = width_of(i)
        acc |= c << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _wrap_gif(lzw: bytes, w: int, h: int, interlaced: bool = False) -> bytes:
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0xF7, 0, 0])
    for i in range(256):
        out += bytes([i, i, i])
    out += b"\x2c\x00\x00\x00\x00"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlaced else 0x00, 8])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_hand_packed_uncompressed_stream_decodes():
    """CLEAR, literals 'A','B','C', EOI at 9 bits, packed by an
    independent packer AND pinned as literal bytes — catches any
    bit-order or control-code drift in the decoder alone."""
    codes = [256, 65, 66, 67, 257]
    lzw = _pack_codes(codes, lambda i: 9)
    assert lzw == bytes([0x00, 0x83, 0x08, 0x19, 0x12, 0x10])
    arr = _decode_gif(_wrap_gif(lzw, 3, 1))
    assert bytes(arr[0, :, 0]) == b"ABC"
    assert arr.shape == (1, 3, 3)


def test_roundtrip_regimes():
    """Greedy-LZW roundtrip through width growth (9->10->11->12) and
    the dictionary-full clear-and-reset, on a small alphabet that
    forces deep dictionary chains."""
    rng = random.Random(11)
    for n in (1, 7, 300, 5000, 40000):
        data = bytes(rng.randrange(17) for _ in range(n))
        assert _lzw_decode(_lzw_encode(data, 8), 8) == data
        arr = _decode_gif(_encode_gif_gray(data))
        assert bytes(arr[0, :, 0]) == data


def test_cscsc_self_reference():
    """Runs of one symbol generate the code==next_code case on the
    decoder's very next read — the classic LZW edge."""
    data = b"\x05" * 257
    assert _lzw_decode(_lzw_encode(data, 8), 8) == data


def test_interlaced_rows_reorder():
    """4-row interlaced GIF stores rows as [0, 2, 1, 3]; the decoder
    must hand back logical order."""
    rows_logical = [bytes([10, 11]), bytes([20, 21]),
                    bytes([30, 31]), bytes([40, 41])]
    storage = rows_logical[0] + rows_logical[2] + rows_logical[1] + rows_logical[3]
    payload = _wrap_gif(_lzw_encode(storage, 8), 2, 4, interlaced=True)
    arr = _decode_gif(payload)
    for r, want in enumerate(rows_logical):
        assert bytes(arr[r, :, 0]) == want


def test_extension_blocks_are_skipped():
    """A GCE extension before the image descriptor must be walked
    over, not decoded."""
    data = b"hello gif"
    body = _encode_gif_gray(data)
    # splice a Graphic Control Extension right before the image
    # descriptor (0x2C after header + LSD + 256-entry GCT)
    idx = 6 + 7 + 768
    assert body[idx] == 0x2C
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    spliced = body[:idx] + gce + body[idx:]
    assert bytes(_decode_gif(spliced)[0, :, 0]) == data


def test_decode_media_routes_gif():
    payload = _encode_gif_gray(b"route me")
    arr = decode_media(payload, "image/gif")
    assert bytes(arr[0, :, 0]) == b"route me"
    # sniffing path: generic image/* with GIF magic
    arr2 = decode_media(payload, "image/unknown")
    assert (arr2 == arr).all()


def test_pillow_conformance_if_available():
    """External-implementation check (the BPE both-wrong lesson):
    where pillow exists, its independent LZW decoder must read our
    encoder's output identically. Skips cleanly in containers
    without PIL."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    rng = random.Random(3)
    data = bytes(rng.randrange(256) for _ in range(4096))
    img = PIL.open(io.BytesIO(_encode_gif_gray(data)))
    got = np.asarray(img.convert("RGB"))
    assert bytes(got[0, :, 0]) == data


def test_hand_packed_width_growth_timing():
    """Width must grow 9→10 exactly when the decoder's dictionary
    reaches 512 entries — hand-constructed with the independent
    packer: CLEAR + literals 0..255 (dictionary reaches 512 after
    literal #255) + one 10-bit literal + 10-bit EOI. Pins the
    'late change' (giflib) convention against the decoder without
    trusting the production encoder."""
    codes = [256] + list(range(256)) + [10, 257]
    # decoder adds entries from the 2nd literal on: after literal k
    # (0-indexed), next = 258 + k; k=254 -> 512 => codes after index
    # 255 (the 256th literal) read at 10 bits
    lzw = _pack_codes(codes, lambda i: 9 if i <= 255 else 10)
    out = _lzw_decode(lzw, 8)
    assert out == bytes(range(256)) + b"\x0a"


def test_malformed_inputs_raise_cleanly():
    """Corrupt payloads raise ValueError/NotImplementedError with a
    diagnosable message — NEVER an IndexError deep in the walk (r9
    ADVICE #1 hardened the sub-block/extension reads to the PNG
    decoder's truncation contract, so this pins plain ValueError)."""
    import pytest

    good = _encode_gif_gray(b"abc")
    with pytest.raises(ValueError, match="not a GIF"):
        _decode_gif(b"NOPE" + good[4:])
    # unknown block type where the image descriptor should be
    bad = bytearray(good)
    bad[6 + 7 + 768] = 0x7F
    with pytest.raises(ValueError, match="unknown GIF block"):
        _decode_gif(bytes(bad))
    # LZW stream truncated mid-image: the first sub-block's declared
    # length overruns the remaining bytes -> ValueError, not IndexError
    idx = good.index(b"\x2c")
    trunc = good[: idx + 9 + 1 + 2]  # descriptor + mcs + 1 byte of data
    with pytest.raises(ValueError, match="truncated GIF"):
        _decode_gif(bytes(trunc) + b"\x00\x3b")


def test_truncation_raises_valueerror_at_every_walk_stage():
    """Cutting the payload at each structural stage (header, color
    table, extension walk, image data) stays inside the ValueError
    contract — the exact r9 ADVICE #1 finding (payload[pos] reads in
    the extension/sub-block walk used to escape as IndexError)."""
    import pytest

    good = _encode_gif_gray(b"hello world")
    # 1. header cut before the LSD packed byte
    with pytest.raises(ValueError, match="truncated GIF"):
        _decode_gif(good[:8])
    # 2. global color table cut off mid-way
    with pytest.raises(ValueError, match="truncated GIF"):
        _decode_gif(good[: 6 + 7 + 100])
    # 3. extension introducer then EOF: the label/sub-block walk runs
    # off the end (the ADVICE's exact repro shape)
    hdr_no_gct = b"GIF89a" + (1).to_bytes(2, "little") * 2 + bytes([0x00, 0, 0])
    with pytest.raises(ValueError, match="truncated GIF"):
        _decode_gif(hdr_no_gct + b"\x21\xf9")
    # 4. extension sub-block declares 200 bytes, payload ends first
    with pytest.raises(ValueError, match="truncated GIF"):
        _decode_gif(hdr_no_gct + b"\x21\xf9\xc8" + b"\x00" * 10)
    # 5. image descriptor cut off after the separator
    idx = good.index(b"\x2c")
    with pytest.raises(ValueError, match="truncated GIF"):
        _decode_gif(good[: idx + 3])
    # and an UNCUT payload still decodes (the guards are inert on
    # well-formed input)
    assert _decode_gif(good).shape == (1, 11, 3)
