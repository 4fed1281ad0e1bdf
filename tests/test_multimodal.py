"""Multimodal plumbing: binary columns, mapInPandas feature extraction,
stubbed decode (SURVEY.md §2.12)."""

from __future__ import annotations

import pytest

from etl_knlp_spark.catalog import load_table
from etl_knlp_spark.operators.multimodal import (
    decode_media,
    documents_as_media,
    extract_features,
    sample_frames,
)


def test_frame_sampling_expands_rows_deterministically(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    frames = sample_frames(media, every_n_bytes=64, max_frames=8)
    pdf = frames.toPandas()
    # every payload ≥ 64 bytes yields >1 frame; counts bounded by 8
    per_media = pdf.groupby("media_id").size()
    assert per_media.max() <= 8
    assert (per_media >= 1).all()
    assert per_media.sum() == len(pdf) and len(pdf) > media.count()
    # frame indices are dense from 0
    first = pdf[pdf.media_id == pdf.media_id.iloc[0]]
    assert sorted(first.frame_idx) == list(range(len(first)))
    # deterministic across runs
    again = sample_frames(media, every_n_bytes=64, max_frames=8).toPandas()
    assert pdf.sort_values(["media_id", "frame_idx"]).reset_index(drop=True).equals(
        again.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    )


def _encode_png(pixels, color_type, filters):
    """Minimal PNG encoder for test vectors: applies the FORWARD
    scanline filters (the decoder must invert them), so the round-trip
    is a genuine two-sided check, not the decoder testing itself."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w = arr.shape[:2]
    ch = 1 if arr.ndim == 2 else arr.shape[2]
    flat = arr.reshape(h, w * ch).astype(np.int32)
    bpp = ch

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    raster = b""
    for y, ftype in enumerate(filters):
        row = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros_like(row)
        out = np.zeros_like(row)
        for x in range(len(row)):
            a = row[x - bpp] if x >= bpp else 0
            c = prev[x - bpp] if x >= bpp else 0
            b = prev[x]
            if ftype == 0:
                out[x] = row[x]
            elif ftype == 1:
                out[x] = (row[x] - a) & 0xFF
            elif ftype == 2:
                out[x] = (row[x] - b) & 0xFF
            elif ftype == 3:
                out[x] = (row[x] - ((a + b) >> 1)) & 0xFF
            else:
                out[x] = (row[x] - paeth(int(a), int(b), int(c))) & 0xFF
        raster += bytes([ftype]) + bytes(out.astype(np.uint8))

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raster))
        + chunk(b"IEND", b"")
    )


def test_native_png_decode_roundtrips_every_filter():
    """The pure-python PNG path (no pillow needed): pixel-exact
    round-trip through all five scanline filters, grayscale and RGB."""
    import numpy as np

    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, size=(5, 6), dtype=np.uint8)
    png = _encode_png(gray, color_type=0, filters=[0, 1, 2, 3, 4])
    got = decode_media(png, "image/png")
    assert got.shape == (5, 6, 1)
    assert (got[:, :, 0] == gray).all()

    rgb = rng.randint(0, 256, size=(4, 3, 3), dtype=np.uint8)
    png_rgb = _encode_png(rgb, color_type=2, filters=[4, 3, 2, 1])
    got_rgb = decode_media(png_rgb, "image/png")
    assert (got_rgb == rgb).all()


def test_native_png_decodes_a_real_world_file():
    """A PNG from the OS image (not authored by this repo's encoder)
    decodes to the dimensions its IHDR declares."""
    import os
    import struct

    import pytest as _pytest

    path = "/usr/share/doc/python3/_static/file.png"
    if not os.path.exists(path):
        _pytest.skip("no system PNG available")
    payload = open(path, "rb").read()
    w, h, depth, color, _, _, interlace = struct.unpack(
        ">IIBBBBB", payload[16:29]
    )
    if depth != 8 or interlace != 0:
        _pytest.skip("system PNG outside the native decoder's contract")
    arr = decode_media(payload, "image/png")
    assert arr.shape[0] == h and arr.shape[1] == w
    assert arr.dtype.name == "uint8"


def test_decode_raises_for_formats_without_codec():
    from etl_knlp_spark.operators import multimodal

    if multimodal._HAS_PIL:
        pytest.skip("PIL installed — lossy webp decodes for real")
    # lossy VP8 webp: VP8L lossless now decodes natively (see
    # tests/test_webp.py), but the DCT lossy codec is a documented
    # boundary — a well-formed container with a VP8 chunk raises the
    # codec-specific NotImplementedError, not the generic dispatcher one
    import struct

    body = b"\x00" * 8
    payload = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(body))
        + b"WEBP"
        + b"VP8 "
        + struct.pack("<I", len(body))
        + body
    )
    with pytest.raises(NotImplementedError, match="lossy VP8"):
        decode_media(payload, "image/webp")


def test_media_feature_falls_back_deterministically():
    from etl_knlp_spark.operators.multimodal import _fake_feature, media_feature

    payload = b"not decodable compressed audio" * 4
    # compressed audio has no decoder in this environment → fake kernel
    # (PCM WAV now decodes natively; see test_wav_decode below)
    assert media_feature(payload, "audio/mpeg") == _fake_feature(payload)


def test_media_table_schema(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    assert media.schema.simpleString() == (
        "struct<media_id:bigint,payload:binary,media_type:string,n_bytes:bigint>"
    )
    row = media.first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["n_bytes"] == len(row["payload"])


def test_feature_extraction_schema_and_determinism(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    f1 = extract_features(media)
    assert f1.schema["feature"].dataType.simpleString() == "array<double>"
    a = {r["media_id"]: r["feature"] for r in f1.collect()}
    b = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert a == b
    assert all(len(v) == 8 for v in a.values())
    # payloads never shuffle: plan is scan → project → mapInPandas only
    plan = f1._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_resize_media_stride_samples_bytes(spark):
    from etl_knlp_spark.operators.multimodal import resize_media

    payload = bytes(range(100))  # 100 bytes → stride ceil(100/32)=4
    media = spark.createDataFrame(
        [(1, payload, "application/octet-stream", 100)],
        "media_id LONG, payload BINARY, media_type STRING, n_bytes LONG",
    )
    r = resize_media(media, target=32).first()
    assert r["orig_bytes"] == 100
    assert r["stride"] == 4
    assert bytes(r["resized_payload"]) == payload[::4]
    assert r["resized_bytes"] == len(payload[::4]) == 25
    # already-small payloads pass through untouched (stride 1)
    small = spark.createDataFrame(
        [(2, b"tiny", "application/octet-stream", 4)],
        "media_id LONG, payload BINARY, media_type STRING, n_bytes LONG",
    )
    r2 = resize_media(small, target=32).first()
    assert r2["stride"] == 1 and bytes(r2["resized_payload"]) == b"tiny"


def _ppm(w, h, pixels):
    # binary P6 with a header comment, 8-bit
    return b"P6\n# test image\n%d %d\n255\n" % (w, h) + bytes(pixels)


def test_pnm_decode_is_real_without_any_codec_library(spark):
    import numpy as np

    from etl_knlp_spark.operators.multimodal import (
        decode_media,
        extract_features,
        media_feature,
    )

    # 2x2 RGB: red, green, blue, white
    payload = _ppm(2, 2, [255,0,0, 0,255,0, 0,0,255, 255,255,255])
    arr = decode_media(payload, "image/x-portable-pixmap")
    assert arr.shape == (2, 2, 3)
    assert arr.dtype == np.uint8
    assert list(arr[0, 0]) == [255, 0, 0] and list(arr[1, 1]) == [255, 255, 255]
    # grayscale P5 with comment handling
    p5 = b"P5\n2 1\n255\n" + bytes([7, 200])
    g = decode_media(p5, "image/x-portable-graymap")
    assert g.shape == (1, 2, 1) and list(g.reshape(-1)) == [7, 200]
    # media_feature now returns REAL pixel statistics for PNM (means of
    # stride slices over the decoded raster, /255) — not the byte fake
    feat = media_feature(payload, "image/x-portable-pixmap", dim=2)
    flat = arr.reshape(-1).astype("float64")
    assert feat == [float(flat[0::2].mean()) / 255.0, float(flat[1::2].mean()) / 255.0]
    # and the distributed mapInPandas path carries the real features
    df = spark.createDataFrame(
        [(1, payload, "image/x-portable-pixmap", len(payload))],
        "media_id long, payload binary, media_type string, n_bytes long",
    )
    row = extract_features(df).collect()[0]
    assert row["feature"][:2] == feat[:2] or len(row["feature"]) >= 2


def test_resize_media_does_a_real_2d_downsample_for_pnm(spark):
    import numpy as np

    from etl_knlp_spark.operators.multimodal import (
        _decode_pnm,
        resize_media,
    )

    # 4x4 RGB gradient
    px = [v for i in range(16) for v in (i * 16, 255 - i * 16, i)]
    payload = _ppm(4, 4, px)
    df = spark.createDataFrame(
        [(9, payload, "image/x-portable-pixmap", len(payload))],
        "media_id long, payload binary, media_type string, n_bytes long",
    )
    row = resize_media(df, target=2).collect()[0]
    out = _decode_pnm(bytes(row["resized_payload"]))
    assert row["stride"] == 2
    src = _decode_pnm(payload)
    assert out.shape == (2, 2, 3)
    assert np.array_equal(out, src[::2, ::2])
    # text payloads keep the oracled byte-stride accounting
    tdf = spark.createDataFrame(
        [(1, b"0123456789", "text/plain", 10)],
        "media_id long, payload binary, media_type string, n_bytes long",
    )
    trow = resize_media(tdf, target=5).collect()[0]
    assert bytes(trow["resized_payload"]) == b"02468"


def test_wav_decode_is_real_without_any_codec_library():
    import struct

    import numpy as np

    from etl_knlp_spark.operators.multimodal import decode_media, media_feature

    # minimal PCM16 stereo WAV: fmt + data chunks, 4 frames
    samples = np.array(
        [[1000, -1000], [32767, -32768], [0, 0], [-555, 555]], dtype="<i2"
    )
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    arr = decode_media(wav, "audio/wav")
    assert arr.shape == (4, 2) and np.array_equal(arr, samples)
    # features are true normalized sample statistics, not the byte fake
    feat = media_feature(wav, "audio/wav", dim=2)
    flat = samples.reshape(-1).astype("float64")
    assert feat == [float(flat[0::2].mean()) / 32768.0, float(flat[1::2].mean()) / 32768.0]
    # compressed (non-PCM) WAV refuses loudly instead of fake-decoding
    bad_fmt = struct.pack("<HHIIHH", 85, 2, 8000, 8000 * 4, 4, 16)  # MP3-in-WAV
    body2 = b"WAVE" + b"fmt " + struct.pack("<I", len(bad_fmt)) + bad_fmt
    body2 += b"data" + struct.pack("<I", len(data)) + data
    wav2 = b"RIFF" + struct.pack("<I", len(body2)) + body2
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="PCM16"):
        decode_media(wav2, "audio/wav")


def test_y4m_decode_and_real_frame_sampling(spark):
    import numpy as np

    from etl_knlp_spark.operators.multimodal import decode_media, sample_frames

    # 4x2, 4:2:0, two frames: Y plane 8 bytes + U,V 2 bytes each
    y0, y1 = bytes(range(8)), bytes(range(100, 108))
    uv = bytes([128, 128])
    payload = (
        b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420jpeg\n"
        + b"FRAME\n" + y0 + uv + uv
        + b"FRAME\n" + y1 + uv + uv
    )
    arr = decode_media(payload, "video/x-y4m")
    assert arr.shape == (2, 2, 4)
    assert arr[0].tobytes() == y0 and arr[1].tobytes() == y1
    # the distributed frame sampler emits the true luma planes
    df = spark.createDataFrame(
        [(3, payload, "video/x-y4m", len(payload))],
        "media_id long, payload binary, media_type string, n_bytes long",
    )
    rows = sorted(sample_frames(df).collect(), key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in rows] == [0, 1]
    assert bytes(rows[0]["frame_bytes"]) == y0
    assert bytes(rows[1]["frame_bytes"]) == y1
    assert all(r["n_bytes"] == 8 for r in rows)


def test_png_corrupt_inputs_raise_contract_errors_only():
    """ADVICE r6 #4: every corrupt-payload failure mode must surface as
    ValueError (or NotImplementedError), never KeyError / IndexError /
    struct.error — decode_media's batch error handling only catches the
    contract types."""
    import struct
    import zlib

    from etl_knlp_spark.operators.multimodal import _decode_png

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"

    # 1. invalid IHDR color type (5 is not a PNG color type)
    ihdr_bad_color = struct.pack(">IIBBBBB", 2, 2, 8, 5, 0, 0, 0)
    raster = zlib.compress(b"\x00\x01\x02" * 2)
    bad_color = (
        sig
        + chunk(b"IHDR", ihdr_bad_color)
        + chunk(b"IDAT", raster)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="color type"):
        _decode_png(bad_color)

    # 2. palette index beyond PLTE length
    ihdr_pal = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    plte = bytes([10, 20, 30])  # a single palette entry (index 0 only)
    idx_raster = zlib.compress(b"\x00" + bytes([0, 5]))  # index 5 invalid
    bad_palette = (
        sig
        + chunk(b"IHDR", ihdr_pal)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", idx_raster)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette index"):
        _decode_png(bad_palette)

    # 3. truncated chunk: declared length overruns the payload, so the
    # CRC slice would be short — must be ValueError, not struct.error
    ihdr_gray2 = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    trunc = (
        sig
        + chunk(b"IHDR", ihdr_gray2)
        + struct.pack(">I", 100)  # claims 100 bytes...
        + b"IDAT"
        + b"x" * 20  # ...but only 20 follow
    )
    with pytest.raises(ValueError, match="truncated"):
        _decode_png(trunc)

    # 4. malformed IHDR (wrong length)
    short_ihdr = sig + chunk(b"IHDR", b"\x00" * 8) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IHDR"):
        _decode_png(short_ihdr)

    # 5. corrupt IDAT deflate stream (valid CRC, garbage zlib payload)
    ihdr_gray = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bad_idat = (
        sig
        + chunk(b"IHDR", ihdr_gray)
        + chunk(b"IDAT", b"not deflate data")
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IDAT"):
        _decode_png(bad_idat)


def _encode_jpeg(img, subsample=False):
    """Minimal test-side baseline JPEG encoder (independent of the
    decoder's entropy path): forward DCT, all-ones quantization (≈
    lossless up to DCT rounding), per-scan canonical Huffman tables
    built from the actual symbol set, 4:4:4 (or 4:2:0 luma-only check
    when subsample=True on grayscale). Gray (h,w) or RGB (h,w,3)."""
    import struct
    import zlib  # noqa: F401  (parity with other encoders' imports)

    import numpy as np

    ZZ = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    u = np.arange(8)
    C = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16) * np.sqrt(2 / 8)
    C[0] /= np.sqrt(2)

    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    if gray:
        planes = [img]
    else:  # RGB -> YCbCr, 4:4:4
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    h, w = planes[0].shape

    def pad8(p):
        H = -(-p.shape[0] // 8) * 8
        W = -(-p.shape[1] // 8) * 8
        return np.pad(p, ((0, H - p.shape[0]), (0, W - p.shape[1])), mode="edge")

    def mag(v):
        s = 0
        a = abs(v)
        while a:
            s += 1
            a >>= 1
        return s

    # tokenize every plane's blocks: (dc_sym, dc_bits), [(ac_sym, ac_bits)...]
    comp_tokens = []
    for p in planes:
        p = pad8(p)
        toks, pred = [], 0
        for y0 in range(0, p.shape[0], 8):
            for x0 in range(0, p.shape[1], 8):
                blk = C @ (p[y0 : y0 + 8, x0 : x0 + 8] - 128.0) @ C.T
                q = np.round(blk).astype(int).reshape(64)[ZZ]
                diff = int(q[0]) - pred
                pred = int(q[0])
                s = mag(diff)
                dc = (s, (diff if diff >= 0 else diff + (1 << s) - 1) if s else 0)
                acs, run = [], 0
                for k in range(1, 64):
                    v = int(q[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        acs.append((0xF0, 0, 0))
                        run -= 16
                    sz = mag(v)
                    acs.append(
                        ((run << 4) | sz, sz, v if v >= 0 else v + (1 << sz) - 1)
                    )
                    run = 0
                if run:
                    acs.append((0x00, 0, 0))  # EOB
                toks.append((dc, acs))
        comp_tokens.append(toks)

    def canonical(symbols):
        """Same-length canonical table over the used symbol set."""
        syms = sorted(set(symbols))
        L = 1
        while (1 << L) < len(syms) + 1:  # keep the all-ones code unused
            L += 1
        counts = [0] * 16
        counts[L - 1] = len(syms)
        codes = {s: (L, i) for i, s in enumerate(syms)}
        return counts, syms, codes

    # one DC + one AC table per component class (luma=0 / chroma=1)
    classes = [0] + ([1, 1] if not gray else [])
    tables = {}
    for cls in set(classes):
        dcs, acs = [], []
        for ci, toks in enumerate(comp_tokens):
            if classes[ci] != cls:
                continue
            for (dsym, _), alist in toks:
                dcs.append(dsym)
                acs.extend(sym for sym, _, _ in alist)
        tables[(0, cls)] = canonical(dcs)
        tables[(1, cls)] = canonical(acs)

    out = bytearray(b"\xff\xd8")
    qtab = bytes([0]) + bytes([1] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(qtab)) + qtab
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for (tc, th), (counts, syms, _) in sorted(tables.items()):
        seg = bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    sos = bytes([nc])
    for ci in range(nc):
        cls = classes[ci]
        sos += bytes([ci + 1, (cls << 4) | cls])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    acc, nacc = 0, 0

    def put(code, length):
        nonlocal acc, nacc
        acc = (acc << length) | code
        nacc += length
        while nacc >= 8:
            nacc -= 8
            byte = (acc >> nacc) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)

    n_blocks = len(comp_tokens[0])
    for bi in range(n_blocks):  # 4:4:4 interleave: one block per comp per MCU
        for ci, toks in enumerate(comp_tokens):
            cls = classes[ci]
            (dsym, dval), alist = toks[bi]
            L, code = tables[(0, cls)][2][dsym]
            put(code, L)
            if dsym:
                put(dval, dsym)
            for sym, sz, val in alist:
                L, code = tables[(1, cls)][2][sym]
                put(code, L)
                if sz:
                    put(val, sz)
    if nacc:
        put((1 << (8 - nacc)) - 1, 8 - nacc)  # pad with 1s
    out += b"\xff\xd9"
    return bytes(out)


def test_native_jpeg_roundtrips_within_dct_rounding():
    """Two-sided baseline-JPEG check: an independent test-side encoder
    (all-ones quantization — lossy only through DCT rounding) feeds the
    repo decoder; pixels must match within the rounding envelope, gray
    and RGB 4:4:4."""
    import numpy as np

    from etl_knlp_spark.operators.multimodal import _decode_jpeg

    rng = np.random.RandomState(11)
    base = rng.randint(0, 64, size=(3, 3)).repeat(8, 0).repeat(8, 1)
    gray = (base + rng.randint(0, 8, size=base.shape)).astype(np.uint8)[:20, :22]
    got = _decode_jpeg(_encode_jpeg(gray))
    assert got.shape == (20, 22, 1)
    assert np.abs(got[:, :, 0].astype(int) - gray.astype(int)).max() <= 3

    rgb = np.stack(
        [
            (base + rng.randint(0, 8, size=base.shape)) % 256,
            (base * 2 + rng.randint(0, 8, size=base.shape)) % 256,
            (base * 3 + rng.randint(0, 8, size=base.shape)) % 256,
        ],
        axis=2,
    ).astype(np.uint8)[:17, :19]
    got_rgb = _decode_jpeg(_encode_jpeg(rgb))
    assert got_rgb.shape == (17, 19, 3)
    # RGB path adds two color-space conversions on top of DCT rounding
    assert np.abs(got_rgb.astype(int) - rgb.astype(int)).max() <= 6


def test_native_jpeg_decodes_real_world_420_file():
    """A baseline 4:2:0 JPEG from the Spark distribution (not authored
    by the test encoder) decodes to exactly its SOF dimensions."""
    import os
    import struct

    from etl_knlp_spark.operators.multimodal import decode_media

    path = (
        "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
        "kittens/DP802813.jpg"
    )
    if not os.path.exists(path):
        pytest.skip("no Spark-distribution JPEG available")
    payload = open(path, "rb").read()
    i = payload.find(b"\xff\xc0")
    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
    arr = decode_media(payload, "image/jpeg")
    assert arr.shape == (h, w, 3)
    assert arr.dtype.name == "uint8"
    assert 10 < arr.mean() < 245  # not a constant plane


def test_jpeg_corrupt_inputs_raise_contract_errors_only():
    """Corrupt JPEG payloads must fail with ValueError (or
    NotImplementedError for gated features), never KeyError/
    IndexError/struct.error — the same contract as _decode_png."""
    import numpy as np

    from etl_knlp_spark.operators.multimodal import _decode_jpeg

    rng = np.random.RandomState(5)
    ok = _encode_jpeg(rng.randint(0, 255, size=(16, 16)).astype(np.uint8))

    def seg(marker):
        i = ok.find(marker)
        assert i >= 0
        return i

    cases = []
    # SOS references an undefined huffman table (tables are 0; point at 3)
    i = seg(b"\xff\xda")
    bad = bytearray(ok)
    bad[i + 6] = 0x33
    cases.append(bytes(bad))
    # frame references an undefined quant table
    i = seg(b"\xff\xc0")
    bad = bytearray(ok)
    bad[i + 13] = 7  # component 1's Tq
    cases.append(bytes(bad))
    # scan component selector matches no frame component
    i = seg(b"\xff\xda")
    bad = bytearray(ok)
    bad[i + 5] = 99
    cases.append(bytes(bad))
    # truncated DHT: declare 255 symbols of length 1
    i = seg(b"\xff\xc4")
    bad = bytearray(ok)
    bad[i + 5] = 255
    cases.append(bytes(bad))
    # truncated entropy stream
    cases.append(ok[:-8] + b"\xff\xd9")
    for payload in cases:
        with pytest.raises((ValueError, NotImplementedError)):
            _decode_jpeg(payload)


def test_jpeg_fill_bytes_before_markers_decode_identically():
    """T.81 B.1.1.2: optional 0xFF fill bytes may precede any marker.
    ADVICE r7 #3: the marker loop used to read the fill byte as marker
    0xFF and misparse the next two bytes as a segment length. Padding
    every header marker must not change the decoded pixels."""
    import numpy as np

    from etl_knlp_spark.operators.multimodal import _decode_jpeg

    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, size=(16, 16)).astype(np.uint8)
    ok = _encode_jpeg(img)
    want = _decode_jpeg(ok)

    # pad the first DQT, DHT, SOF0 and SOS markers (all in the header,
    # before entropy data) with 1-3 fill bytes each
    padded = ok
    for marker, nfill in ((b"\xff\xdb", 1), (b"\xff\xc4", 2), (b"\xff\xc0", 3), (b"\xff\xda", 2)):
        i = padded.find(marker)
        assert i >= 0
        padded = padded[:i] + b"\xff" * nfill + padded[i:]
    got = _decode_jpeg(padded)
    assert np.array_equal(got, want)


def test_arithmetic_jpeg_degrade_path_without_pillow(monkeypatch):
    """Round-7 verdict #6: the documented pillow-absent degrade path
    must hold for the remaining gated JPEG mode with NO environment
    skip — the payload is synthesized in-test (SOI + SOF9
    arithmetic-coded frame header; progressive SOF2 decodes natively
    since r8) and pillow absence is forced, so this pins the contract
    on every host:

    - `decode_media` raises NotImplementedError naming the gate (the
      contract error class callers catch — never ValueError/KeyError),
    - `media_feature` (the feature-extraction kernel every
      extract_features batch runs) degrades to the deterministic fake
      with the same shape, so downstream plans are identical."""
    import struct

    from etl_knlp_spark.operators import multimodal as mm

    arith = (
        b"\xff\xd8"                      # SOI
        + b"\xff\xc9"                    # SOF9: arithmetic sequential
        + struct.pack(">H", 11)          # seglen
        + bytes([8])                     # precision
        + struct.pack(">HH", 8, 8)       # h, w
        + bytes([1, 1, 0x11, 0])         # 1 component
        + b"\xff\xd9"                    # EOI
    )
    monkeypatch.setattr(mm, "_HAS_PIL", False)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        mm.decode_media(arith, "image/jpeg")
    feat = mm.media_feature(arith, "image/jpeg")
    assert feat == mm._fake_feature(arith)
    assert len(feat) == 8 and all(isinstance(v, float) for v in feat)


def _encode_jpeg_progressive(img):
    """Minimal test-side PROGRESSIVE JPEG encoder (T.81 G.1.2,
    independent of the decoder): the same forward DCT + all-ones
    quantization as `_encode_jpeg` (bit-identical coefficients), then
    a spectral-selection + successive-approximation scan script — DC
    first at Al=1, DC refinement (raw bits), per-component AC first
    scans for bands 1-5 and 6-63 at Al=1 with genuine cross-block EOB
    runs, then the matching AC refinement scans (correction-bit
    buffering per the IJG jcphuff formulation). Each Huffman-coded
    scan redefines table id 0 in-stream. Gray (h,w) or RGB (h,w,3)."""
    import struct

    import numpy as np

    ZZ = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    u = np.arange(8)
    C = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16) * np.sqrt(2 / 8)
    C[0] /= np.sqrt(2)

    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    if gray:
        planes = [img]
    else:
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    h, w = planes[0].shape

    def pad8(p):
        H = -(-p.shape[0] // 8) * 8
        W = -(-p.shape[1] // 8) * 8
        return np.pad(p, ((0, H - p.shape[0]), (0, W - p.shape[1])), mode="edge")

    coefs = []  # per comp: list of zigzag-order (64,) int lists per block
    for p in planes:
        p = pad8(p)
        blocks = []
        for y0 in range(0, p.shape[0], 8):
            for x0 in range(0, p.shape[1], 8):
                blk = C @ (p[y0 : y0 + 8, x0 : x0 + 8] - 128.0) @ C.T
                blocks.append(
                    [int(v) for v in np.round(blk).astype(int).reshape(64)[ZZ]]
                )
        coefs.append(blocks)
    ncomp, n_blocks = len(coefs), len(coefs[0])

    def mag(v):
        return abs(v).bit_length()

    def canonical(symbols):
        syms = sorted(set(symbols))
        L = 1
        while (1 << L) < len(syms) + 1:
            L += 1
        counts = [0] * 16
        counts[L - 1] = len(syms)
        codes = {s: (L, i) for i, s in enumerate(syms)}
        return counts, syms, codes

    out = bytearray(b"\xff\xd8")
    qtab = bytes([0]) + bytes([1] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(qtab)) + qtab
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2

    def emit_scan(scan_comp_ids, ss, se, ah, al, ops):
        """ops: ("sym", s) huffman-coded / ("bits", value, length) raw."""
        syms = [op[1] for op in ops if op[0] == "sym"]
        codes = None
        if syms:
            counts, symlist, codes = canonical(syms)
            tc = 0 if ss == 0 else 1
            seg = bytes([(tc << 4) | 0]) + bytes(counts) + bytes(symlist)
            out.extend(b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg)
        sos = bytes([len(scan_comp_ids)])
        for cs in scan_comp_ids:
            sos += bytes([cs, 0])
        sos += bytes([ss, se, (ah << 4) | al])
        out.extend(b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos)
        acc, nacc = 0, 0

        def put(code, length):
            nonlocal acc, nacc
            acc = (acc << length) | code
            nacc += length
            while nacc >= 8:
                nacc -= 8
                byte = (acc >> nacc) & 0xFF
                out.append(byte)
                if byte == 0xFF:
                    out.append(0x00)

        for op in ops:
            if op[0] == "sym":
                L, code = codes[op[1]]
                put(code, L)
            else:
                put(op[1], op[2])
        if nacc:
            put((1 << (8 - nacc)) - 1, 8 - nacc)  # pad with 1s

    # ---- scan 1: DC first, interleaved, Al=1
    ops, preds = [], [0] * ncomp
    for b in range(n_blocks):
        for ci in range(ncomp):
            dc = coefs[ci][b][0] >> 1  # arithmetic shift (T.81 DC pt)
            diff = dc - preds[ci]
            preds[ci] = dc
            s = mag(diff)
            ops.append(("sym", s))
            if s:
                ops.append(
                    ("bits", diff if diff >= 0 else diff + (1 << s) - 1, s)
                )
    emit_scan(list(range(1, ncomp + 1)), 0, 0, 0, 1, ops)

    # ---- scan 2: DC refinement, raw bit per block, Al=0
    ops = []
    for b in range(n_blocks):
        for ci in range(ncomp):
            ops.append(("bits", coefs[ci][b][0] & 1, 1))
    emit_scan(list(range(1, ncomp + 1)), 0, 0, 1, 0, ops)

    BANDS = [(1, 5), (6, 63)]

    def ac_first_ops(ci, ss, se):
        ops, eobrun = [], 0

        def flush_eob():
            nonlocal eobrun
            while eobrun > 0:
                nbits = eobrun.bit_length() - 1
                n = min(eobrun, (1 << (nbits + 1)) - 1)
                ops.append(("sym", nbits << 4))
                if nbits:
                    ops.append(("bits", n - (1 << nbits), nbits))
                eobrun -= n

        for b in range(n_blocks):
            band = coefs[ci][b][ss : se + 1]
            tb = [(abs(v) >> 1) * (1 if v >= 0 else -1) for v in band]
            if not any(tb):
                eobrun += 1
                continue
            flush_eob()
            run = 0
            last_nz = max(i for i, v in enumerate(tb) if v)
            for i, v in enumerate(tb):
                if i > last_nz:
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ops.append(("sym", 0xF0))
                    run -= 16
                s = mag(v)
                ops.append(("sym", (run << 4) | s))
                ops.append(("bits", v if v >= 0 else v + (1 << s) - 1, s))
                run = 0
            if last_nz < len(tb) - 1:
                eobrun += 1  # trailing zero tail joins an EOB run
        flush_eob()
        return ops

    def ac_refine_ops(ci, ss, se):
        """IJG jcphuff encode_mcu_AC_refine: r counts zero-HISTORY
        positions, nonzero-history positions buffer a correction bit;
        buffered bits flush right after the next emitted symbol."""
        ops, eobrun, pending = [], 0, []

        def flush_eob():
            nonlocal eobrun, pending
            if eobrun > 0:
                nbits = eobrun.bit_length() - 1
                ops.append(("sym", nbits << 4))
                if nbits:
                    ops.append(("bits", eobrun - (1 << nbits), nbits))
                eobrun = 0
                for bit in pending:
                    ops.append(("bits", bit, 1))
                pending = []

        for b in range(n_blocks):
            band = coefs[ci][b][ss : se + 1]
            absv = [abs(v) >> 0 for v in band]  # Al=0 refinement pass
            hist = [abs(v) >> 1 for v in band]  # what the decoder has
            eob_k = -1
            for i, (a, hv) in enumerate(zip(absv, hist)):
                if hv == 0 and a == 1:
                    eob_k = i  # last newly-significant position
            r, br = 0, []
            for i, v in enumerate(band):
                a, hv = absv[i], hist[i]
                if a == 0:
                    r += 1
                    continue
                if hv != 0:  # already significant: buffered correction bit
                    br.append(a & 1)
                    continue
                # newly significant (|v| == 1 at this Al)
                while r > 15 and i <= eob_k:
                    flush_eob()
                    ops.append(("sym", 0xF0))
                    ops.extend(("bits", bit, 1) for bit in br)
                    br = []
                    r -= 16
                flush_eob()
                ops.append(("sym", (r << 4) | 1))
                ops.append(("bits", 1 if v >= 0 else 0, 1))
                ops.extend(("bits", bit, 1) for bit in br)
                br = []
                r = 0
            if r > 0 or br:
                eobrun += 1
                pending.extend(br)
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        return ops

    for ss, se in BANDS:
        for ci in range(ncomp):
            emit_scan([ci + 1], ss, se, 0, 1, ac_first_ops(ci, ss, se))
    for ss, se in BANDS:
        for ci in range(ncomp):
            emit_scan([ci + 1], ss, se, 1, 0, ac_refine_ops(ci, ss, se))
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_jpeg_decodes_identical_to_baseline():
    """Two-sided progressive check (round-7 verdict gap #2 closed):
    the baseline and progressive test encoders quantize the SAME
    coefficients, so the decoder must produce BIT-IDENTICAL pixels
    from both streams — any error in the spectral-selection /
    successive-approximation scan logic (EOB runs, refinement
    correction bits, DC point transform) breaks exact equality. A
    smooth gradient exercises long cross-block EOB runs; the random
    images exercise dense bands, ZRL, and refinement."""
    import numpy as np

    from etl_knlp_spark.operators.multimodal import _decode_jpeg

    rng = np.random.RandomState(13)
    yy, xx = np.mgrid[0:24, 0:21]
    smooth = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    noisy = rng.randint(0, 255, size=(20, 22)).astype(np.uint8)
    rgb = rng.randint(0, 255, size=(17, 19, 3)).astype(np.uint8)

    for img in (smooth, noisy, rgb):
        prog = _encode_jpeg_progressive(img)
        assert b"\xff\xc2" in prog and prog.count(b"\xff\xda") >= 4
        base = _encode_jpeg(img)
        got_p = _decode_jpeg(prog)
        got_b = _decode_jpeg(base)
        assert np.array_equal(got_p, got_b)


def test_progressive_jpeg_real_world_file_decodes_natively():
    """The nodejs-doc progressive JPEG (SOF2, successive-approximation
    scan script from a real encoder) decodes natively to its SOF
    dimensions with plausible content — no pillow involved."""
    import os
    import struct

    from etl_knlp_spark.operators.multimodal import decode_media

    path = "/usr/share/doc/nodejs/thin-white-stripe.jpg"
    if not os.path.exists(path):
        pytest.skip("no real-world progressive JPEG available")
    payload = open(path, "rb").read()
    i = payload.find(b"\xff\xc2")
    assert i > 0, "fixture is not progressive"
    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
    arr = decode_media(payload, "image/jpeg")
    assert arr.shape == (h, w, 3)
    assert arr.dtype.name == "uint8"
    assert 10 < arr.mean() < 245


def _encode_png_adam7(arr, filters_by_pass=None):
    """Minimal Adam7-interlaced PNG encoder for test vectors: each of
    the 7 passes extracts its sub-grid, applies FORWARD scanline
    filters independently (prev row = previous row of the SAME pass),
    and the filtered passes concatenate into one IDAT — the decoder
    must invert the filters per pass and scatter the sub-images back."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    ch = 1 if arr.ndim == 2 else arr.shape[2]
    px = arr.reshape(h, w, ch).astype(np.int32)
    bpp = ch

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    raster = b""
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    for pi, (x0, y0, dx, dy) in enumerate(passes):
        sub = px[y0::dy, x0::dx]
        ph, pw = sub.shape[0], sub.shape[1]
        if ph == 0 or pw == 0:
            continue
        flat = sub.reshape(ph, pw * ch)
        for y in range(ph):
            ftype = (
                filters_by_pass[pi][y % len(filters_by_pass[pi])]
                if filters_by_pass
                else (y + pi) % 5  # cycle all five filters across passes
            )
            row = flat[y]
            prev = flat[y - 1] if y > 0 else np.zeros_like(row)
            out = np.zeros_like(row)
            for x in range(len(row)):
                a = row[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 0:
                    out[x] = row[x]
                elif ftype == 1:
                    out[x] = (row[x] - a) & 0xFF
                elif ftype == 2:
                    out[x] = (row[x] - b) & 0xFF
                elif ftype == 3:
                    out[x] = (row[x] - ((a + b) >> 1)) & 0xFF
                else:
                    out[x] = (row[x] - paeth(int(a), int(b), int(c))) & 0xFF
            raster += bytes([ftype]) + out.astype(np.uint8).tobytes()

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1)  # Adam7
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raster))
        + chunk(b"IEND", b"")
    )


def _encode_png_16bit(arr16, color_type):
    """Minimal 16-bit PNG encoder (big-endian samples, filter 0 and 2
    rows — filters operate on BYTES with bpp = channels*2)."""
    import struct
    import zlib

    import numpy as np

    arr16 = np.asarray(arr16, dtype=np.uint16)
    h, w = arr16.shape[:2]
    ch = 1 if arr16.ndim == 2 else arr16.shape[2]
    rows = arr16.reshape(h, w * ch).astype(">u2").view(np.uint8)  # (h, w*ch*2)
    raster = b""
    prev = np.zeros(rows.shape[1], np.int32)
    for y in range(h):
        line = rows[y].astype(np.int32)
        if y % 2 == 0:
            raster += b"\x00" + rows[y].tobytes()
        else:  # Up filter, byte-wise
            raster += b"\x02" + ((line - prev) & 0xFF).astype(np.uint8).tobytes()
        prev = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 16, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raster))
        + chunk(b"IEND", b"")
    )


def test_adam7_interlaced_png_decodes_pixel_exact():
    """r8 closes the PNG codec boundary: Adam7 streams decode
    pixel-exactly against the independent test encoder — gray and
    RGBA, dimensions chosen to produce EMPTY passes (w or h < pass
    offsets) and ragged sub-grids, all five filters cycling across
    passes."""
    import numpy as np

    from etl_knlp_spark.operators.multimodal import decode_media

    rng = np.random.RandomState(21)
    for shape, ch in (((13, 11), 1), ((5, 3), 1), ((9, 17, 4), 4), ((1, 1), 1), ((2, 9, 3), 3)):
        arr = rng.randint(0, 256, size=shape, dtype=np.uint8)
        png = _encode_png_adam7(arr)
        got = decode_media(png, "image/png")
        want = arr if arr.ndim == 3 else arr[:, :, None]
        assert got.shape == want.shape
        assert (got == want).all()


def test_16bit_png_decodes_to_high_byte():
    """16-bit samples (big-endian, byte-wise filters with bpp=2*ch)
    decode to their high byte — gray and RGB, against the independent
    test encoder."""
    import numpy as np

    from etl_knlp_spark.operators.multimodal import decode_media

    rng = np.random.RandomState(22)
    gray16 = rng.randint(0, 65536, size=(7, 5), dtype=np.uint16)
    got = decode_media(_encode_png_16bit(gray16, color_type=0), "image/png")
    assert (got[:, :, 0] == (gray16 >> 8).astype(np.uint8)).all()

    rgb16 = rng.randint(0, 65536, size=(4, 6, 3), dtype=np.uint16)
    got_rgb = decode_media(_encode_png_16bit(rgb16, color_type=2), "image/png")
    assert (got_rgb == (rgb16 >> 8).astype(np.uint8)).all()


def test_jpeg_scan_header_corruption_keeps_contract_errors(monkeypatch):
    """r8 review findings: an SOS declaring zero components and a
    second SOF frame must raise ValueError (the decode contract), not
    IndexError from empty selector lists or mis-sized stores."""
    import struct

    import numpy as np

    from etl_knlp_spark.operators.multimodal import _decode_jpeg

    rng = np.random.RandomState(3)
    ok = _encode_jpeg(rng.randint(0, 255, size=(16, 16)).astype(np.uint8))

    i = ok.find(b"\xff\xda")
    ns0 = ok[: i + 2] + struct.pack(">H", 6) + bytes([0, 0, 63, 0]) + ok[i + 2 :]
    # (original SOS bytes become garbage after the injected scan — the
    # zero-component check must fire first)
    with pytest.raises(ValueError, match="no components"):
        _decode_jpeg(ns0[: i + 8] + b"\xff\xd9")

    prog = _encode_jpeg_progressive(rng.randint(0, 255, size=(16, 16)).astype(np.uint8))
    # splice a second SOF2 between the first two scans
    first_sos = prog.find(b"\xff\xda")
    nxt = prog.find(b"\xff\xc4", first_sos + 2)  # next scan's DHT
    assert nxt > 0
    sof2 = b"\xff\xc2" + struct.pack(">H", 11) + bytes([8]) + struct.pack(">HH", 16, 16) + bytes([1, 0x11, 0])
    doubled = prog[:nxt] + sof2 + prog[nxt:]
    with pytest.raises(ValueError, match="multiple JPEG SOF"):
        _decode_jpeg(doubled)


def test_progressive_jpeg_420_subsampled_decodes_identical_to_baseline():
    """The review caveat closed: progressive + chroma subsampling
    together. One shared coefficient plan (luma 2x2, chroma 1x1 over a
    box-downsampled image) feeds an independent baseline emitter
    (single interleaved scan, MCU = 4 luma + cb + cr blocks) and a
    progressive emitter (interleaved DC first/refine over the padded
    MCU grid, per-component AC band scans over each component's OWN
    ceil block grid). Decoded pixels must be bit-identical: visible
    pixels come only from ceil-grid blocks, so the padded-only blocks'
    missing AC (progressive never codes them) is cropped away in both."""
    import struct

    import numpy as np

    from etl_knlp_spark.operators.multimodal import _decode_jpeg

    ZZ = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    u = np.arange(8)
    C = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16) * np.sqrt(2 / 8)
    C[0] /= np.sqrt(2)

    rng = np.random.RandomState(31)
    img = rng.randint(0, 255, size=(20, 23, 3)).astype(np.float64)
    h, w = 20, 23
    r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    def box2(p):  # 2x2 box downsample with edge pad to even dims
        P = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), mode="edge")
        return (P[0::2, 0::2] + P[0::2, 1::2] + P[1::2, 0::2] + P[1::2, 1::2]) / 4.0

    mcux, mcuy = -(-w // 16), -(-h // 16)

    def to_blocks(p, nby, nbx):
        P = np.pad(
            p,
            ((0, nby * 8 - p.shape[0]), (0, nbx * 8 - p.shape[1])),
            mode="edge",
        )
        out = [[None] * nbx for _ in range(nby)]
        for by in range(nby):
            for bx in range(nbx):
                blk = C @ (P[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0) @ C.T
                out[by][bx] = [int(v) for v in np.round(blk).astype(int).reshape(64)[ZZ]]
        return out

    comps = [  # (cid, hs, vs, coefs[by][bx], pad_grid, ceil_grid)
        (1, 2, 2, to_blocks(y, mcuy * 2, mcux * 2), (mcuy * 2, mcux * 2),
         (-(-h // 8), -(-w // 8))),
        (2, 1, 1, to_blocks(box2(cb), mcuy, mcux), (mcuy, mcux),
         (-(-(-(-h // 2)) // 8), -(-(-(-w // 2)) // 8))),
        (3, 1, 1, to_blocks(box2(cr), mcuy, mcux), (mcuy, mcux),
         (-(-(-(-h // 2)) // 8), -(-(-(-w // 2)) // 8))),
    ]

    def mag(v):
        return abs(v).bit_length()

    def canonical(symbols):
        syms = sorted(set(symbols))
        L = 1
        while (1 << L) < len(syms) + 1:
            L += 1
        counts = [0] * 16
        counts[L - 1] = len(syms)
        return counts, syms, {s: (L, i) for i, s in enumerate(syms)}

    def headers(sof_marker):
        out = bytearray(b"\xff\xd8")
        qtab = bytes([0]) + bytes([1] * 64)
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(qtab)) + qtab
        sof = struct.pack(">BHHB", 8, h, w, 3)
        for cid, hs, vs, *_ in comps:
            sof += bytes([cid, (hs << 4) | vs, 0])
        out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof
        return out

    def emit_scan(out, scan_cids, ss, se, ah, al, ops, tc):
        syms = [op[1] for op in ops if op[0] == "sym"]
        codes = None
        if syms:
            counts, symlist, codes = canonical(syms)
            seg = bytes([(tc << 4) | 0]) + bytes(counts) + bytes(symlist)
            out.extend(b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg)
        sos = bytes([len(scan_cids)])
        for cs in scan_cids:
            sos += bytes([cs, 0])
        sos += bytes([ss, se, (ah << 4) | al])
        out.extend(b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos)
        acc, nacc = 0, 0

        def put(code, length):
            nonlocal acc, nacc
            acc = (acc << length) | code
            nacc += length
            while nacc >= 8:
                nacc -= 8
                byte = (acc >> nacc) & 0xFF
                out.append(byte)
                if byte == 0xFF:
                    out.append(0x00)

        for op in ops:
            if op[0] == "sym":
                L, code = codes[op[1]]
                put(code, L)
            else:
                put(op[1], op[2])
        if nacc:
            put((1 << (8 - nacc)) - 1, 8 - nacc)

    def mcu_blocks():
        """(comp_index, by, bx) in interleaved MCU order."""
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for ci, (cid, hs, vs, *_rest) in enumerate(comps):
                for by in range(vs):
                    for bx in range(hs):
                        yield ci, my * vs + by, mx * hs + bx

    def dc_sym_ops(ops, diff):
        s = mag(diff)
        ops.append(("sym", s))
        if s:
            ops.append(("bits", diff if diff >= 0 else diff + (1 << s) - 1, s))

    # ---------- baseline: one interleaved scan, full band
    base = headers(b"\xff\xc0")
    ops, preds = [], [0, 0, 0]
    for ci, by, bx in mcu_blocks():
        q = comps[ci][3][by][bx]
        dc_sym_ops(ops, q[0] - preds[ci])
        preds[ci] = q[0]
        run = 0
        nz = [k for k in range(1, 64) if q[k]]
        last = nz[-1] if nz else 0
        for k in range(1, last + 1):
            v = q[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                ops.append(("sym", 0xF0))
                run -= 16
            s = mag(v)
            ops.append(("sym", (run << 4) | s))
            ops.append(("bits", v if v >= 0 else v + (1 << s) - 1, s))
            run = 0
        if last < 63:
            ops.append(("sym", 0x00))  # EOB
    emit_scan(base, [1, 2, 3], 0, 63, 0, 0, ops, tc=None or 0)
    # NOTE: baseline needs BOTH a DC and an AC table; the single
    # shared canonical table above holds DC sizes and AC run/size
    # symbols together — legal as long as it is registered under both
    # classes. Re-emit it as class 1 too by patching a second DHT in:
    i = base.find(b"\xff\xc4")
    (dl,) = struct.unpack(">H", base[i + 2 : i + 4])
    seg = bytes(base[i + 4 : i + 2 + dl])
    dht_ac = b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + bytes([0x10]) + seg[1:]
    base = base[: i] + dht_ac + base[i:]
    base += b"\xff\xd9"

    # ---------- progressive: DC first/refine interleaved + AC bands
    prog = headers(b"\xff\xc2")
    ops, preds = [], [0, 0, 0]
    for ci, by, bx in mcu_blocks():
        dc = comps[ci][3][by][bx][0] >> 1
        dc_sym_ops(ops, dc - preds[ci])
        preds[ci] = dc
    emit_scan(prog, [1, 2, 3], 0, 0, 0, 1, ops, tc=0)
    ops = []
    for ci, by, bx in mcu_blocks():
        ops.append(("bits", comps[ci][3][by][bx][0] & 1, 1))
    emit_scan(prog, [1, 2, 3], 0, 0, 1, 0, ops, tc=0)
    for ci, (cid, hs, vs, coefs, pad_grid, ceil_grid) in enumerate(comps):
        for ss, se, ah, al in ((1, 63, 0, 1), (1, 63, 1, 0)):
            ops, eobrun, pending = [], 0, []

            def flush_eob():
                nonlocal eobrun, pending
                if eobrun > 0:
                    nb = eobrun.bit_length() - 1
                    ops.append(("sym", nb << 4))
                    if nb:
                        ops.append(("bits", eobrun - (1 << nb), nb))
                    eobrun = 0
                    for bit in pending:
                        ops.append(("bits", bit, 1))
                    pending = []

            for by in range(ceil_grid[0]):
                for bx in range(ceil_grid[1]):
                    band = coefs[by][bx][ss : se + 1]
                    if ah == 0:
                        tb = [(abs(v) >> al) * (1 if v >= 0 else -1) for v in band]
                        if not any(tb):
                            eobrun += 1
                            continue
                        flush_eob()
                        run = 0
                        last_nz = max(i2 for i2, v in enumerate(tb) if v)
                        for i2, v in enumerate(tb):
                            if i2 > last_nz:
                                break
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                ops.append(("sym", 0xF0))
                                run -= 16
                            s = mag(v)
                            ops.append(("sym", (run << 4) | s))
                            ops.append(("bits", v if v >= 0 else v + (1 << s) - 1, s))
                            run = 0
                        if last_nz < len(tb) - 1:
                            eobrun += 1
                    else:
                        absv = [abs(v) for v in band]
                        hist = [abs(v) >> 1 for v in band]
                        eob_k = -1
                        for i2, (a2, hv) in enumerate(zip(absv, hist)):
                            if hv == 0 and a2 == 1:
                                eob_k = i2
                        r, br = 0, []
                        for i2, v in enumerate(band):
                            a2, hv = absv[i2], hist[i2]
                            if a2 == 0:
                                r += 1
                                continue
                            if hv != 0:
                                br.append(a2 & 1)
                                continue
                            while r > 15 and i2 <= eob_k:
                                flush_eob()
                                ops.append(("sym", 0xF0))
                                ops.extend(("bits", bit, 1) for bit in br)
                                br = []
                                r -= 16
                            flush_eob()
                            ops.append(("sym", (r << 4) | 1))
                            ops.append(("bits", 1 if v >= 0 else 0, 1))
                            ops.extend(("bits", bit, 1) for bit in br)
                            br = []
                            r = 0
                        if r > 0 or br:
                            eobrun += 1
                            pending.extend(br)
            flush_eob()
            emit_scan(prog, [cid], ss, se, ah, al, ops, tc=1)
    prog += b"\xff\xd9"

    got_b = _decode_jpeg(bytes(base))
    got_p = _decode_jpeg(bytes(prog))
    assert got_b.shape == (h, w, 3) and got_p.shape == (h, w, 3)
    assert np.array_equal(got_p, got_b)


def _encode_png_subbyte(samples, depth, color_type, filters, palette=None, interlace=0):
    """Minimal sub-8-bit PNG encoder for test vectors: packs depth-bit
    samples MSB-first with zero-padded final bytes (RFC 2083 §2.3),
    then applies FORWARD scanline filters on the PACKED bytes with
    bpp=1 — the decoder must unfilter bytes first and unpack second.
    `samples` is (h, w) integer sample values (gray levels or palette
    indices, already < 2**depth)."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(samples, dtype=np.uint8)
    h, w = arr.shape

    def pack_rows(rows):
        ph, pw = rows.shape
        bits = ((rows[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1).reshape(ph, -1)
        pad = (-bits.shape[1]) % 8
        if pad:
            bits = np.concatenate([bits, np.zeros((ph, pad), np.uint8)], axis=1)
        return np.packbits(bits, axis=1)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    def filter_pass(packed, ftypes):
        ph, stride = packed.shape
        flat = packed.astype(np.int32)
        raster = b""
        for y in range(ph):
            ftype = ftypes[y % len(ftypes)]
            row = flat[y]
            prev = flat[y - 1] if y > 0 else np.zeros_like(row)
            out = np.zeros_like(row)
            for x in range(stride):
                a = row[x - 1] if x >= 1 else 0
                c = prev[x - 1] if x >= 1 else 0
                b = prev[x]
                if ftype == 0:
                    out[x] = row[x]
                elif ftype == 1:
                    out[x] = (row[x] - a) & 0xFF
                elif ftype == 2:
                    out[x] = (row[x] - b) & 0xFF
                elif ftype == 3:
                    out[x] = (row[x] - ((a + b) >> 1)) & 0xFF
                else:
                    out[x] = (row[x] - paeth(int(a), int(b), int(c))) & 0xFF
            raster += bytes([ftype]) + bytes(out.astype(np.uint8))
        return raster

    raster = b""
    if interlace:
        passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                  (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        for x0, y0, dx, dy in passes:
            sub = arr[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            raster += filter_pass(pack_rows(sub), filters)
    else:
        raster += filter_pass(pack_rows(arr), filters)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(np.asarray(palette, np.uint8).ravel()))
    return out + chunk(b"IDAT", zlib.compress(raster)) + chunk(b"IEND", b"")


def test_sub8bit_grayscale_png_decodes_with_exact_scaling():
    """1/2/4-bit grayscale: MSB-first packed rows (odd widths force
    zero-padded final bytes), all five filters cycling, samples scale
    by the exact 255/85/17 multipliers."""
    import numpy as np

    from etl_knlp_spark.operators.multimodal import decode_media

    rng = np.random.RandomState(31)
    for depth in (1, 2, 4):
        for w, h in ((7, 5), (16, 4), (1, 3), (9, 1)):
            samples = rng.randint(0, 1 << depth, size=(h, w), dtype=np.uint8)
            png = _encode_png_subbyte(samples, depth, 0, [0, 1, 2, 3, 4])
            got = decode_media(png, "image/png")
            want = (samples * (255 // ((1 << depth) - 1)))[:, :, None]
            assert got.shape == want.shape, (depth, w, h)
            assert (got == want).all(), (depth, w, h)


def test_sub8bit_palette_png_expands_plte():
    """1/2/4-bit palette: indices unpack then expand through PLTE to
    RGB; an out-of-range index still raises the contract ValueError."""
    import numpy as np
    import pytest

    from etl_knlp_spark.operators.multimodal import _decode_png, decode_media

    rng = np.random.RandomState(32)
    for depth in (1, 2, 4):
        n = 1 << depth
        palette = rng.randint(0, 256, size=(n, 3), dtype=np.uint8)
        idx = rng.randint(0, n, size=(5, 11), dtype=np.uint8)
        png = _encode_png_subbyte(idx, depth, 3, [4, 3, 2, 1, 0], palette=palette)
        got = decode_media(png, "image/png")
        assert (got == palette[idx]).all(), depth
    # out-of-range index: 2-bit indices with a 2-entry palette
    short = rng.randint(2, 4, size=(3, 3), dtype=np.uint8)
    png = _encode_png_subbyte(short, 2, 3, [0], palette=[[1, 2, 3], [4, 5, 6]])
    with pytest.raises(ValueError, match="palette index"):
        _decode_png(png)


def test_sub8bit_adam7_png_decodes_pixel_exact():
    """4-bit palette + 1-bit grayscale under Adam7: each pass packs
    its OWN rows (per-pass padding boundaries differ from the
    non-interlaced raster), unfilters independently, scatters back."""
    import numpy as np

    from etl_knlp_spark.operators.multimodal import decode_media

    rng = np.random.RandomState(33)
    palette = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, size=(13, 11), dtype=np.uint8)
    png = _encode_png_subbyte(idx, 4, 3, [0, 1, 2, 3, 4], palette=palette, interlace=1)
    assert (decode_media(png, "image/png") == palette[idx]).all()

    bw = rng.randint(0, 2, size=(9, 17), dtype=np.uint8)
    png = _encode_png_subbyte(bw, 1, 0, [2, 4, 1], interlace=1)
    assert (decode_media(png, "image/png") == (bw * 255)[:, :, None]).all()


def test_illegal_png_depth_color_combos_raise():
    """RFC 2083 §6.1 legality: sub-8 depths with multi-channel color
    types, 16-bit palette, and non-power depths raise ValueError (not
    NotImplementedError — no pillow gate remains for PNG)."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from etl_knlp_spark.operators.multimodal import _decode_png

    def png_with_ihdr(depth, color):
        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data))
                + ctype
                + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
            + chunk(b"IEND", b"")
        )

    for depth, color in ((4, 2), (2, 6), (1, 4), (16, 3), (3, 0), (32, 0)):
        with pytest.raises(ValueError, match="depth"):
            _decode_png(png_with_ihdr(depth, color))


# ---------------------------------------------------------- lossless JPEG


def _emit_lossless_jpeg(img, predictor=1, pt=0, restart=0, interleaved=True):
    """Test-side SOF3 emitter (T.81 Annex H dual of the production
    decoder): predictive sample coding with the selected predictor,
    point transform, optional restart intervals, interleaved or
    one-scan-per-component layout. Shared canonical DC-class table."""
    import struct

    import numpy as np

    img = np.asarray(img, dtype=np.int64)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    coded = img >> pt

    def mag(v):
        s, a = 0, abs(v)
        while a:
            s += 1
            a >>= 1
        return s

    def predict(plane, x, y, fresh):
        default = 1 << (8 - pt - 1)
        if fresh:
            return default
        if y == 0:
            return int(plane[0, x - 1]) if x > 0 else default
        if x == 0:
            return int(plane[y - 1, 0])
        ra, rb, rc = int(plane[y, x - 1]), int(plane[y - 1, x]), int(plane[y - 1, x - 1])
        return {
            1: ra, 2: rb, 3: rc, 4: ra + rb - rc,
            5: ra + ((rb - rc) >> 1), 6: rb + ((ra - rc) >> 1),
            7: (ra + rb) >> 1,
        }[predictor]

    # tokenize scans: list of (scan_comp_indices, [(s, bits), ...])
    scans = [list(range(nc))] if interleaved else [[c] for c in range(nc)]
    scan_tokens = []
    all_syms = []
    for comps_in_scan in scans:
        toks = []
        fresh = {c: True for c in comps_in_scan}
        mcu = 0
        for y in range(h):
            for x in range(w):
                if restart and mcu and mcu % restart == 0:
                    toks.append(("RST",))
                    for c in comps_in_scan:
                        fresh[c] = True
                for c in comps_in_scan:
                    p = predict(coded[:, :, c], x, y, fresh[c])
                    fresh[c] = False
                    diff = int(coded[y, x, c]) - p
                    s = mag(diff)
                    bits = (diff if diff >= 0 else diff + (1 << s) - 1) if s else 0
                    toks.append((s, bits))
                    all_syms.append(s)
                mcu += 1
        scan_tokens.append(toks)

    syms = sorted(set(all_syms))
    L = 1
    while (1 << L) < len(syms) + 1:
        L += 1
    counts = [0] * 16
    counts[L - 1] = len(syms)
    codes = {s: (L, i) for i, s in enumerate(syms)}

    out = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
    seg = bytes([0x00]) + bytes(counts) + bytes(syms)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)

    for comps_in_scan, toks in zip(scans, scan_tokens):
        sos = bytes([len(comps_in_scan)])
        for c in comps_in_scan:
            sos += bytes([c + 1, 0x00])
        sos += bytes([predictor, 0, pt])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        acc, nacc, rst = 0, 0, 0

        def put(code, length):
            nonlocal acc, nacc
            acc = (acc << length) | code
            nacc += length
            while nacc >= 8:
                nacc -= 8
                byte = (acc >> nacc) & 0xFF
                out.append(byte)
                if byte == 0xFF:
                    out.append(0x00)

        for tok in toks:
            if tok == ("RST",):
                if nacc:
                    put((1 << (8 - nacc)) - 1, 8 - nacc)
                out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                continue
            s, bits = tok
            cl, code = codes[s]
            put(code, cl)
            if s:
                put(bits, s)
        if nacc:
            put((1 << (8 - nacc)) - 1, 8 - nacc)
    out += b"\xff\xd9"
    return bytes(out)


def test_lossless_jpeg_all_predictors_roundtrip_exact():
    import numpy as np

    from etl_knlp_spark.operators.multimodal import decode_media

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 7), dtype=np.uint8)
    for pred in range(1, 8):
        got = decode_media(_emit_lossless_jpeg(img, predictor=pred), "image/jpeg")
        assert got.shape == (5, 7, 1), pred
        assert np.array_equal(got[:, :, 0], img), f"predictor {pred} not lossless"


def test_lossless_jpeg_three_components_are_raw_planes():
    import numpy as np

    from etl_knlp_spark.operators.multimodal import decode_media

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    for interleaved in (True, False):
        got = decode_media(
            _emit_lossless_jpeg(img, predictor=4, interleaved=interleaved),
            "image/jpeg",
        )
        # T.81 defines no color space for lossless: planes come back
        # untransformed (a YCbCr pass here would destroy equality)
        assert np.array_equal(got, img), f"interleaved={interleaved}"


def test_lossless_jpeg_point_transform_drops_low_bits():
    import numpy as np

    from etl_knlp_spark.operators.multimodal import decode_media

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(6, 4), dtype=np.uint8)
    got = decode_media(_emit_lossless_jpeg(img, predictor=2, pt=2), "image/jpeg")
    assert np.array_equal(got[:, :, 0], (img >> 2) << 2)


def test_lossless_jpeg_restart_intervals_roundtrip_exact():
    import numpy as np

    from etl_knlp_spark.operators.multimodal import decode_media

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    # interval of 7 MCUs: restarts land mid-row, exercising the
    # prediction reset away from line boundaries
    got = decode_media(
        _emit_lossless_jpeg(img, predictor=7, restart=7), "image/jpeg"
    )
    assert np.array_equal(got, img)


def test_lossless_jpeg_unsupported_shapes_raise_contract_errors():
    import struct

    import numpy as np
    import pytest

    from etl_knlp_spark.operators.multimodal import _decode_jpeg

    img = np.zeros((2, 2), dtype=np.uint8)
    payload = bytearray(_emit_lossless_jpeg(img))
    sof_at = payload.index(b"\xff\xc3")
    # 12-bit precision: NotImplementedError, not a crash
    p12 = bytearray(payload)
    p12[sof_at + 4] = 12
    with pytest.raises(NotImplementedError):
        _decode_jpeg(bytes(p12))
    # subsampled lossless: NotImplementedError
    p21 = bytearray(payload)
    p21[sof_at + 11] = 0x21  # first component H=2,V=1
    with pytest.raises(NotImplementedError):
        _decode_jpeg(bytes(p21))
    # truncated entropy stream stays in the ValueError contract
    with pytest.raises(ValueError):
        _decode_jpeg(bytes(payload[:-5]) + b"\xff\xd9")


def test_pitch_detects_period_on_synthetic_signal(spark, tmp_path):
    """Autocorrelation pitch: a periodic byte signal whose per-term
    AM-GM gap outweighs the extra boundary term of smaller lags must
    put the correlation peak at its period, detected through the full
    WAV encode→decode path. (Low-contrast signals like 'ab'*32 peak
    at lag 1 — unnormalized autocorrelation of a positive signal
    favors lag count — so the test uses wide-contrast periods.)"""
    from pyspark.sql import Row

    from etl_knlp_spark.operators.multimodal import multimodal_pitch

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="az" * 32, lang="en", source="t", n_chars=64),
            Row(doc_id=1, text="a  z" * 16, lang="en", source="t", n_chars=64),
        ]
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    got = {r.media_id: r for r in multimodal_pitch(spark, sf).collect()}
    assert got[0].best_lag == 2 and got[0].n_samples == 64
    assert got[1].best_lag == 4
    # energy is the exact integer sum of squared codepoints
    assert got[0].energy == 32 * (ord("a") ** 2 + ord("z") ** 2)


def test_graded_documents_prefix_is_ascii():
    """The codec corpus gates (multimodal_decode/webp/gif/tiff/bmp/
    pitch) encode the UTF-8 BYTES of each document's first 64
    CHARACTERS while their DuckDB oracles recompute over the first 64
    CODEPOINTS — the two agree iff the prefix is pure ASCII (r9 ADVICE
    #3; documented at DECODE_STATS_SCHEMA). This pins the assumption
    against the LIVE graded testdata, so a generator change that
    introduces multi-byte characters fails HERE with the contract
    named, instead of as an unexplained driver hash mismatch."""
    import os

    import duckdb

    checked = 0
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        offenders = duckdb.sql(
            f"""
            SELECT count(*) FROM '{path}'
            WHERE strlen(substr(text, 1, 64))
                  <> length(substr(text, 1, 64))
            """
        ).fetchone()[0]
        assert offenders == 0, (
            f"{offenders} documents at {sf} have non-ASCII bytes in "
            "their first-64-character prefix — the multimodal gate "
            "oracles (codepoint-based) no longer match the Spark side "
            "(byte-based); both sides need octet_length(text) = "
            "length(text) filters (see DECODE_STATS_SCHEMA)"
        )
        checked += 1
    assert checked, "no graded testdata found to pin the contract on"


def test_pnm_16bit_decodes_with_exact_integer_scaling():
    """r9 "what's missing" #3 named 16-bit PNM as a codec boundary —
    closed in r10: samples over maxval 255 are two big-endian bytes,
    scaled to uint8 by exact round-half-up 255·s/maxval integer
    arithmetic (no float ladder). Hand-pinned values for maxval 65535
    (the PNG high-byte convention within rounding) and a non-power
    maxval 1023; truncation and out-of-spec maxval stay ValueError."""
    import struct

    import numpy as np
    import pytest

    from etl_knlp_spark.operators.multimodal import _decode_pnm

    # P5 gray, maxval 65535: 0, 0x8000 (-> round(255*32768/65535)=128),
    # 0xFFFF -> 255, 0x0101 -> round(255*257/65535)=1
    samples = [0, 0x8000, 0xFFFF, 0x0101]
    p5 = b"P5\n4 1\n65535\n" + struct.pack(">4H", *samples)
    arr = _decode_pnm(p5)
    assert arr.shape == (1, 4, 1)
    assert arr.reshape(-1).tolist() == [0, 128, 255, 1]
    # exact mirror of the scaling rule on all four
    want = [(s * 510 + 65535) // (2 * 65535) for s in samples]
    assert arr.reshape(-1).tolist() == want

    # P6 RGB, non-power maxval 1023: 1023 -> 255, 512 -> round(127.63) = 128
    px = [1023, 512, 0, 1, 2, 3]
    p6 = b"P6\n# cmt\n2 1\n1023\n" + struct.pack(">6H", *px)
    arr6 = _decode_pnm(p6)
    assert arr6.shape == (1, 2, 3)
    assert arr6.reshape(-1).tolist() == [
        (s * 510 + 1023) // (2 * 1023) for s in px
    ]
    assert arr6[0, 0, 0] == 255 and arr6[0, 0, 1] == 128

    # 8-bit path unchanged by the widening
    assert _decode_pnm(b"P5\n2 1\n255\n" + bytes([7, 200])).reshape(
        -1
    ).tolist() == [7, 200]

    # r10 ADVICE: 8-bit samples with maxval < 255 get the SAME exact
    # round-half-up 255·s/maxval scaling as the 2-byte path (identity
    # at maxval=255): maxval=100 full-scale 100 is white (255), 50 is
    # mid-gray (128), not raw passthrough — brightness semantics now
    # agree on both sides of the 255 boundary
    low = _decode_pnm(b"P5\n3 1\n100\n" + bytes([0, 50, 100]))
    assert low.reshape(-1).tolist() == [0, 128, 255]
    assert low.reshape(-1).tolist() == [
        (s * 510 + 100) // (2 * 100) for s in (0, 50, 100)
    ]

    # r11 review: spec-invalid samples ABOVE maxval clamp to 255
    # instead of wrapping mod 256 through the uint8 cast — a
    # maxval=100 sample of 200 (scales to 510) must read as saturated
    # white, not wrap to 254, and a sample of 128 (scales to 326,
    # would wrap to 70 — darker than legal mid-scale) must clamp too;
    # same contract on the 16-bit path
    bad = _decode_pnm(b"P5\n2 1\n100\n" + bytes([200, 128]))
    assert bad.reshape(-1).tolist() == [255, 255]
    import struct as _struct

    bad16 = _decode_pnm(b"P5\n2 1\n1023\n" + _struct.pack(">2H", 2000, 65535))
    assert bad16.reshape(-1).tolist() == [255, 255]

    # truncated 16-bit raster names the cut
    with pytest.raises(ValueError, match="16-bit raster cut off"):
        _decode_pnm(p5[:-3])
    # maxval outside the spec's (0, 65536)
    with pytest.raises(ValueError, match="maxval"):
        _decode_pnm(b"P5\n1 1\n65536\n" + b"\x00\x00")
    with pytest.raises(ValueError, match="maxval"):
        _decode_pnm(b"P5\n1 1\n0\n" + b"\x00")


def test_every_decoder_survives_truncation_at_every_byte():
    """The whole r9-ADVICE failure class, generalized (and closed):
    for a valid payload of EVERY native codec, truncating at every
    byte boundary must either still decode (a prefix can be a
    complete file) or raise ValueError/NotImplementedError — never
    IndexError, KeyError, struct.error, or any other escape. This is
    the test that found the BMP/TIFF/WAV struct.error escapes fixed
    in round 10; any future decoder (or decoder edit) gets the same
    sweep for free by adding its (payload, decoder) pair."""
    import numpy as np

    from etl_knlp_spark.operators import multimodal as M

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    cases = {
        "pnm8": (b"P6\n2 2\n255\n" + bytes(range(12)), M._decode_pnm),
        "pnm16": (b"P5\n2 2\n65535\n" + bytes(8), M._decode_pnm),
        "png": (_encode_png(img, 0, [0] * 8), M._decode_png),
        "jpeg": (_encode_jpeg(img), M._decode_jpeg),
        "webp": (M._encode_vp8l_gray(b"hello"), M._decode_webp),
        "gif": (M._encode_gif_gray(b"hello"), M._decode_gif),
        "bmp": (M._encode_bmp_gray8(b"hello"), M._decode_bmp),
        "tiff": (M._encode_tiff_gray8(b"hello"), M._decode_tiff),
        "wav": (M._encode_wav_pcm16(bytes(range(16))), M._decode_wav),
        "flac": (M._encode_flac_pcm16(bytes(range(16))), M._decode_flac),
        "y4m": (
            b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420jpeg\nFRAME\n" + bytes(6),
            M._decode_y4m,
        ),
    }
    escapes = []
    for name, (payload, decode) in cases.items():
        decode(payload)  # the full payload must be valid
        for cut in range(len(payload)):
            try:
                decode(payload[:cut])
            except (ValueError, NotImplementedError):
                pass
            except Exception as exc:  # noqa: BLE001 — the contract under test
                escapes.append((name, cut, type(exc).__name__, str(exc)[:60]))
    assert not escapes, (
        f"{len(escapes)} truncation points escaped the ValueError/"
        f"NotImplementedError contract: {escapes[:10]}"
    )


def test_every_decoder_survives_single_byte_corruption():
    """Sibling of the truncation sweep: every byte of each valid
    payload mutated to 0x00, 0xFF, and value+1 — decode must succeed
    (plenty of corruptions are benign payload-byte changes) or raise
    ValueError/NotImplementedError. Found and pinned in r10: a zero
    JPEG sampling factor divide-by-zeroed the MCU geometry, and a
    zero-count TIFF IFD entry stored an empty value list that
    IndexError'd every tags[...][0] consumer."""
    import numpy as np

    from etl_knlp_spark.operators import multimodal as M

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    cases = {
        "pnm8": (b"P6\n2 2\n255\n" + bytes(range(12)), M._decode_pnm),
        "pnm16": (b"P5\n2 2\n65535\n" + bytes(8), M._decode_pnm),
        "png": (_encode_png(img, 0, [0] * 8), M._decode_png),
        "jpeg": (_encode_jpeg(img), M._decode_jpeg),
        "webp": (M._encode_vp8l_gray(b"hello"), M._decode_webp),
        "gif": (M._encode_gif_gray(b"hello"), M._decode_gif),
        "bmp": (M._encode_bmp_gray8(b"hello"), M._decode_bmp),
        "tiff": (M._encode_tiff_gray8(b"hello"), M._decode_tiff),
        "wav": (M._encode_wav_pcm16(bytes(range(16))), M._decode_wav),
        "flac": (M._encode_flac_pcm16(bytes(range(16))), M._decode_flac),
        "y4m": (
            b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420jpeg\nFRAME\n" + bytes(6),
            M._decode_y4m,
        ),
    }
    escapes = []
    for name, (payload, decode) in cases.items():
        for pos in range(len(payload)):
            for val in (0x00, 0xFF, (payload[pos] + 1) & 0xFF):
                if val == payload[pos]:
                    continue
                mut = payload[:pos] + bytes([val]) + payload[pos + 1 :]
                try:
                    decode(mut)
                except (ValueError, NotImplementedError):
                    pass
                except Exception as exc:  # noqa: BLE001 — the contract under test
                    escapes.append(
                        (name, pos, val, type(exc).__name__, str(exc)[:60])
                    )
    assert not escapes, (
        f"{len(escapes)} corruption points escaped the ValueError/"
        f"NotImplementedError contract: {escapes[:10]}"
    )


def test_codec_variant_payloads_survive_truncation_and_corruption():
    """The two r10 fuzz sweeps extended to the non-default payload
    shapes each decoder supports — progressive, lossless and 4:2:0
    JPEG, Adam7 / 16-bit / sub-byte PNG, interlaced GIF, LZW+predictor
    and uncompressed TIFF, top-down BMP — all clean when pinned (the
    default-shape sweeps found every escape; this keeps the variant
    code paths inside the same contract as they evolve)."""
    import numpy as np

    from etl_knlp_spark.operators import multimodal as M

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    img16 = (np.arange(64, dtype=np.uint16).reshape(8, 8) * 1021) % 65536
    sub = np.array([[0, 1, 2, 3], [1, 0, 3, 2]], dtype=np.uint8)
    cases = {
        "jpeg_prog": (_encode_jpeg_progressive(img), M._decode_jpeg),
        "jpeg_lossless": (_emit_lossless_jpeg(img), M._decode_jpeg),
        "jpeg_420": (
            _encode_jpeg(np.dstack([img] * 3).astype(np.uint8), subsample=True),
            M._decode_jpeg,
        ),
        "png_adam7": (_encode_png_adam7(img), M._decode_png),
        "png_16": (_encode_png_16bit(img16, 0), M._decode_png),
        "png_sub": (_encode_png_subbyte(sub, 2, 0, [0, 0]), M._decode_png),
        "gif_interlaced": (
            M._encode_gif_gray(bytes(range(16)), interlaced=True),
            M._decode_gif,
        ),
        "tiff_predictor": (
            M._encode_tiff_gray8(b"hello world", lzw=True, predictor=True),
            M._decode_tiff,
        ),
        "tiff_raw": (M._encode_tiff_gray8(b"hello", lzw=False), M._decode_tiff),
        "bmp_topdown": (M._encode_bmp_gray8(b"hello", top_down=True), M._decode_bmp),
    }
    escapes = []
    for name, (payload, decode) in cases.items():
        decode(payload)
        for cut in range(len(payload)):
            try:
                decode(payload[:cut])
            except (ValueError, NotImplementedError):
                pass
            except Exception as exc:  # noqa: BLE001 — the contract under test
                escapes.append((name, "cut", cut, type(exc).__name__))
        for pos in range(len(payload)):
            for val in (0x00, 0xFF, (payload[pos] + 1) & 0xFF):
                if val == payload[pos]:
                    continue
                mut = payload[:pos] + bytes([val]) + payload[pos + 1 :]
                try:
                    decode(mut)
                except (ValueError, NotImplementedError):
                    pass
                except Exception as exc:  # noqa: BLE001
                    escapes.append(
                        (name, "mut", pos, val, type(exc).__name__, str(exc)[:50])
                    )
    assert not escapes, escapes[:10]
