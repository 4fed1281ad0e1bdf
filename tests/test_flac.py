"""Spec-dual fixtures for the native FLAC decoder: an independent
test-side emitter (its own bit writer, table-driven CRCs, its own
zigzag/UTF-8 encoders) builds streams exercising every subframe type,
both Rice methods, escapes, partitions, wasted bits, all stereo
decorrelations, multi-frame streams, and 8/16/24-bit depths; the
production `_decode_flac` must reproduce the planted samples exactly.
"""

from __future__ import annotations

import random

import pytest

from etl_knlp_spark.operators.multimodal import _decode_flac


class W:
    """MSB-first writer, accumulator style (deliberately a different
    implementation shape than the production `_FlacBitW`)."""

    def __init__(self):
        self.acc, self.n = 0, 0

    def put(self, v: int, n: int):
        assert n >= 0 and 0 <= (v & ((1 << n) - 1)) == v % (1 << n)
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n

    def sput(self, v: int, n: int):
        self.put(v & ((1 << n) - 1), n)

    def rice(self, v: int, param: int):
        u = 2 * v if v >= 0 else -2 * v - 1
        q = u >> param
        self.put(0, q)
        self.put(1, 1)
        if param:
            self.put(u & ((1 << param) - 1), param)

    def out(self) -> bytes:
        pad = (-self.n) % 8
        acc, n = self.acc << pad, self.n + pad
        return acc.to_bytes(n // 8, "big") if n else b""


def _crc8(data: bytes) -> int:
    tab = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        tab.append(c)
    crc = 0
    for b in data:
        crc = tab[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    tab = []
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        tab.append(c)
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ tab[(crc >> 8) ^ b]
    return crc


def _utf8(w: W, v: int):
    if v < 0x80:
        w.put(v, 8)
    elif v < 0x800:
        w.put(0xC0 | (v >> 6), 8)
        w.put(0x80 | (v & 0x3F), 8)
    else:
        w.put(0xE0 | (v >> 12), 8)
        w.put(0x80 | ((v >> 6) & 0x3F), 8)
        w.put(0x80 | (v & 0x3F), 8)


_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _residual(w: W, res: list[int], order: int, blocksize: int,
              method: int = 0, porder: int = 0, param: int = 8,
              escape_parts: set[int] = frozenset()):
    w.put(method, 2)
    w.put(porder, 4)
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    idx = 0
    for p in range(1 << porder):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        chunk = res[idx : idx + n]
        idx += n
        if p in escape_parts:
            w.put(esc, pbits)
            raw = max((abs(v).bit_length() + 1 for v in chunk), default=1)
            w.put(raw, 5)
            for v in chunk:
                w.sput(v, raw)
        else:
            w.put(param, pbits)
            for v in chunk:
                w.rice(v, param)
    assert idx == len(res)


def _subframe(w: W, samples: list[int], bps: int, kind: str, *,
              wasted: int = 0, order: int = 2, coefs=None, shift: int = 5,
              **res_kw):
    w.put(0, 1)
    eff = bps - wasted
    s = [v >> wasted for v in samples]
    if wasted:
        assert all(v % (1 << wasted) == 0 for v in samples)
    if kind == "constant":
        assert len(set(s)) == 1
        w.put(0, 6)
        w.put(1 if wasted else 0, 1)
        if wasted:
            w.put(0, wasted - 1); w.put(1, 1)
        w.sput(s[0], eff)
        return
    if kind == "verbatim":
        w.put(1, 6)
        w.put(1 if wasted else 0, 1)
        if wasted:
            w.put(0, wasted - 1); w.put(1, 1)
        for v in s:
            w.sput(v, eff)
        return
    if kind == "fixed":
        w.put(8 + order, 6)
        w.put(1 if wasted else 0, 1)
        if wasted:
            w.put(0, wasted - 1); w.put(1, 1)
        for v in s[:order]:
            w.sput(v, eff)
        cs = _FIXED[order]
        res = [s[i] - sum(c * s[i - 1 - j] for j, c in enumerate(cs))
               for i in range(order, len(s))]
        _residual(w, res, order, len(s), **res_kw)
        return
    if kind == "lpc":
        coefs = coefs or [3, -1]
        order = len(coefs)
        w.put(32 + order - 1, 6)
        w.put(1 if wasted else 0, 1)
        if wasted:
            w.put(0, wasted - 1); w.put(1, 1)
        for v in s[:order]:
            w.sput(v, eff)
        prec = max(max(abs(c).bit_length() + 1 for c in coefs), 2)
        w.put(prec - 1, 4)
        w.sput(shift, 5)
        for c in coefs:
            w.sput(c, prec)
        res = [
            s[i]
            - (sum(c * s[i - 1 - j] for j, c in enumerate(coefs)) >> shift)
            for i in range(order, len(s))
        ]
        _residual(w, res, order, len(s), **res_kw)
        return
    raise AssertionError(kind)


def emit(frames, *, bps: int = 16, ch_assign: str = "indep",
         sub_kind: str = "fixed", variable: bool = False, **sub_kw) -> bytes:
    """frames: list of per-channel sample lists [[ch0...], [ch1...]]."""
    n_ch = len(frames[0])
    total = sum(len(f[0]) for f in frames)
    si = W()
    si.put(min(len(f[0]) for f in frames), 16)
    si.put(max(len(f[0]) for f in frames), 16)
    si.put(0, 24); si.put(0, 24)
    si.put(44100, 20)
    si.put(n_ch - 1, 3)
    si.put(bps - 1, 5)
    si.put(total, 36)
    body = si.out() + b"\x00" * 16
    stream = bytearray(b"fLaC")
    stream += bytes([0x80]) + len(body).to_bytes(3, "big") + body
    bps_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
    pos_samples = 0
    for fno, chans in enumerate(frames):
        bs = len(chans[0])
        w = W()
        w.put(0x3FFE, 14); w.put(0, 1); w.put(1 if variable else 0, 1)
        w.put(6, 4)            # 8-bit blocksize field
        w.put(12, 4)           # 8-bit kHz sample rate field (skip path)
        if ch_assign == "indep":
            w.put(n_ch - 1, 4)
            stored = chans
            extra = [0] * n_ch
        else:
            assert n_ch == 2
            l, r = chans
            if ch_assign == "left-side":
                w.put(8, 4)
                stored = [l, [a - b for a, b in zip(l, r)]]
                extra = [0, 1]
            elif ch_assign == "right-side":
                w.put(9, 4)
                stored = [[a - b for a, b in zip(l, r)], r]
                extra = [1, 0]
            else:  # mid-side
                w.put(10, 4)
                stored = [
                    [(a + b) >> 1 for a, b in zip(l, r)],
                    [a - b for a, b in zip(l, r)],
                ]
                extra = [0, 1]
        w.put(bps_code, 3)
        w.put(0, 1)
        _utf8(w, pos_samples if variable else fno)
        w.put(bs - 1, 8)
        w.put(44, 8)           # 44 kHz field (consumed, unused)
        hdr = w.out()
        hdr += bytes([_crc8(hdr)])
        sw = W()
        for i, ch in enumerate(stored):
            _subframe(sw, ch, bps + extra[i], sub_kind, **sub_kw)
        frame = hdr + sw.out()
        frame += _crc16(frame).to_bytes(2, "big")
        stream += frame
        pos_samples += bs
    return bytes(stream)


def _chk(payload: bytes, frames, bps_limit=None):
    arr = _decode_flac(payload)
    want_ch = [sum((f[c] for f in frames), []) for c in range(len(frames[0]))]
    assert arr.shape == (len(want_ch[0]), len(want_ch))
    for c, ch in enumerate(want_ch):
        assert arr[:, c].tolist() == ch, f"channel {c}"


def test_fixed_orders_and_verbatim_constant():
    rng = random.Random(1)
    for order in range(5):
        s = [rng.randint(-3000, 3000) for _ in range(48)]
        _chk(emit([[s]], sub_kind="fixed", order=order), [[s]])
    s = [rng.randint(-3000, 3000) for _ in range(17)]
    _chk(emit([[s]], sub_kind="verbatim"), [[s]])
    _chk(emit([[[42] * 30]], sub_kind="constant"), [[[42] * 30]])


def test_lpc_subframe():
    rng = random.Random(2)
    s = [rng.randint(-2000, 2000) for _ in range(64)]
    _chk(emit([[s]], sub_kind="lpc", coefs=[5, -3, 1], shift=2), [[s]])
    _chk(emit([[s]], sub_kind="lpc", coefs=[1], shift=0), [[s]])


def test_rice_methods_partitions_escapes():
    rng = random.Random(3)
    s = [rng.randint(-500, 500) for _ in range(64)]
    _chk(emit([[s]], sub_kind="fixed", order=2, method=1, param=9), [[s]])
    _chk(emit([[s]], sub_kind="fixed", order=2, porder=2, param=7), [[s]])
    _chk(
        emit([[s]], sub_kind="fixed", order=2, porder=2,
             escape_parts={1, 3}),
        [[s]],
    )


def test_wasted_bits():
    rng = random.Random(4)
    s = [rng.randint(-700, 700) * 4 for _ in range(40)]
    _chk(emit([[s]], sub_kind="fixed", order=1, wasted=2), [[s]])


def test_stereo_decorrelation_modes():
    rng = random.Random(5)
    l = [rng.randint(-6000, 6000) for _ in range(52)]
    r = [v + rng.randint(-40, 40) for v in l]
    for mode in ("indep", "left-side", "right-side", "mid-side"):
        _chk(emit([[l, r]], ch_assign=mode, sub_kind="verbatim"), [[l, r]])


def test_multi_frame_and_variable_blocking():
    rng = random.Random(6)
    f1 = [rng.randint(-100, 100) for _ in range(32)]
    f2 = [rng.randint(-100, 100) for _ in range(32)]
    f3 = [rng.randint(-100, 100) for _ in range(20)]
    _chk(emit([[f1], [f2], [f3]]), [[f1], [f2], [f3]])
    _chk(emit([[f1], [f3]], variable=True), [[f1], [f3]])


def test_bit_depths():
    rng = random.Random(7)
    for bps, lim in ((8, 127), (16, 30000), (24, 8_000_000)):
        s = [rng.randint(-lim, lim) for _ in range(24)]
        _chk(emit([[s]], bps=bps, sub_kind="verbatim"), [[s]])


def test_crc_corruption_detected():
    s = list(range(-10, 22))
    payload = bytearray(emit([[s]]))
    payload[-1] ^= 0xFF  # frame CRC-16
    with pytest.raises(ValueError, match="CRC-16"):
        _decode_flac(bytes(payload))
    payload = bytearray(emit([[s]]))
    payload[len(payload) - len(payload) // 3] ^= 0x01  # somewhere mid-frame
    with pytest.raises(ValueError):
        _decode_flac(bytes(payload))


def test_randomized_encode_decode_property():
    rng = random.Random(8)
    for trial in range(12):
        n_ch = rng.choice([1, 2])
        bs = rng.randint(16, 96)
        chans = [
            [rng.randint(-4000, 4000) for _ in range(bs)] for _ in range(n_ch)
        ]
        kind = rng.choice(["fixed", "lpc", "verbatim"])
        kw = {}
        if kind == "fixed":
            kw["order"] = rng.randint(0, 4)
            if bs % 4 == 0 and kw["order"] <= bs // 4:
                kw["porder"] = rng.choice([0, 1, 2])
        if kind == "lpc":
            kw["coefs"] = [rng.randint(-6, 6) or 1
                           for _ in range(rng.randint(1, 4))]
            kw["shift"] = rng.randint(0, 4)
        mode = "indep" if n_ch == 1 else rng.choice(
            ["indep", "left-side", "right-side", "mid-side"])
        payload = emit([chans], ch_assign=mode, sub_kind=kind, **kw)
        _chk(payload, [chans])


def test_production_encoder_roundtrip():
    from etl_knlp_spark.operators.multimodal import _encode_flac_pcm16

    for data in (b"corpus gate bytes", bytes(range(256)), b"xy"):
        arr = _decode_flac(_encode_flac_pcm16(data))
        want = list(data) + [0] * max(0, 3 - len(data))
        assert arr[:, 0].tolist() == want
