"""Test-only pure-Python FLAC decoder used as an independent oracle for
native/flac.cpp (no shared code; written directly from the format spec).

Decodes the first ``max_frames`` frames to per-channel integer samples.
"""

from __future__ import annotations

from typing import List, Tuple

_BLOCK_SIZES = [0, 192, 576, 1152, 2304, 4608, -1, -2,
                256, 512, 1024, 2048, 4096, 8192, 16384, 32768]


class _Bits:
    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.pos = byte_pos * 8  # absolute bit position

    def take(self, n: int) -> int:
        v = 0
        p = self.pos
        data = self.data
        for _ in range(n):
            v = (v << 1) | ((data[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def take_signed(self, n: int) -> int:
        v = self.take(n)
        if n and v & (1 << (n - 1)):
            v -= 1 << n
        return v

    def unary(self) -> int:
        q = 0
        while self.take(1) == 0:
            q += 1
        return q

    def align(self):
        self.pos = (self.pos + 7) & ~7


def _coded_number(b: _Bits) -> int:
    first = b.take(8)
    n_extra = 0
    mask = 0x80
    while first & mask:
        n_extra += 1
        mask >>= 1
    if n_extra == 0:
        return first
    v = first & (mask - 1)
    for _ in range(n_extra - 1):
        v = (v << 6) | (b.take(8) & 0x3F)
    return v


def _residual(b: _Bits, blocksize: int, order: int) -> List[int]:
    method = b.take(2)
    pbits, escape = (4, 15) if method == 0 else (5, 31)
    porder = b.take(4)
    nparts = 1 << porder
    out: List[int] = []
    for p in range(nparts):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        param = b.take(pbits)
        if param == escape:
            raw = b.take(5)
            for _ in range(count):
                out.append(b.take_signed(raw) if raw else 0)
        else:
            for _ in range(count):
                q = b.unary()
                r = b.take(param) if param else 0
                u = (q << param) | r
                out.append(-(u + 1) // 2 if u & 1 else u // 2)
    return out


def _subframe(b: _Bits, blocksize: int, bps: int) -> List[int]:
    assert b.take(1) == 0, "padding bit"
    t = b.take(6)
    wasted = 0
    if b.take(1):
        wasted = b.unary() + 1
    eb = bps - wasted
    if t == 0:
        v = b.take_signed(eb)
        s = [v] * blocksize
    elif t == 1:
        s = [b.take_signed(eb) for _ in range(blocksize)]
    elif 8 <= t <= 12:
        order = t & 7
        s = [b.take_signed(eb) for _ in range(order)]
        res = _residual(b, blocksize, order)
        coefs = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}[order]
        for r in res:
            pred = sum(c * s[-1 - j] for j, c in enumerate(coefs))
            s.append(pred + r)
    elif t >= 32:
        order = (t & 31) + 1
        s = [b.take_signed(eb) for _ in range(order)]
        precision = b.take(4) + 1
        shift = b.take_signed(5)
        coefs = [b.take_signed(precision) for _ in range(order)]
        res = _residual(b, blocksize, order)
        for r in res:
            acc = sum(c * s[-1 - j] for j, c in enumerate(coefs))
            s.append(r + (acc >> shift))
    else:
        raise ValueError(f"reserved subframe type {t}")
    if wasted:
        s = [x << wasted for x in s]
    return s


def decode(data: bytes, max_frames: int = 10**9
           ) -> Tuple[List[List[int]], int, int]:
    """-> (per-channel int sample lists, sample_rate, bps)."""
    assert data[:4] == b"fLaC"
    pos = 4
    sample_rate = channels = bps = None
    while True:
        hdr = data[pos]
        blen = int.from_bytes(data[pos + 1:pos + 4], "big")
        if (hdr & 0x7F) == 0:
            si = data[pos + 4:pos + 4 + blen]
            sample_rate = (int.from_bytes(si[10:13], "big")) >> 4
            channels = ((si[12] >> 1) & 7) + 1
            bps = (((si[12] & 1) << 4) | (si[13] >> 4)) + 1
        pos += 4 + blen
        if hdr & 0x80:
            break

    b = _Bits(data, pos)
    out: List[List[int]] = [[] for _ in range(channels)]
    nbits = len(data) * 8
    frames = 0
    while frames < max_frames and b.pos + 16 <= nbits:
        assert b.take(14) == 0x3FFE, "lost frame sync"
        b.take(2)  # reserved + blocking strategy
        bs_code = b.take(4)
        sr_code = b.take(4)
        ch_code = b.take(4)
        ss_code = b.take(3)
        b.take(1)
        _coded_number(b)
        if bs_code == 6:
            blocksize = b.take(8) + 1
        elif bs_code == 7:
            blocksize = b.take(16) + 1
        else:
            blocksize = _BLOCK_SIZES[bs_code]
        if sr_code == 12:
            b.take(8)
        elif sr_code in (13, 14):
            b.take(16)
        b.take(8)  # crc8

        fbps = {0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}[ss_code]
        if ch_code < 8:
            subs = [_subframe(b, blocksize, fbps) for _ in range(ch_code + 1)]
        else:
            extra = [0, 1] if ch_code == 8 else ([1, 0] if ch_code == 9 else [0, 1])
            subs = [_subframe(b, blocksize, fbps + extra[c]) for c in range(2)]
            if ch_code == 8:  # left/side
                subs = [subs[0], [l - s for l, s in zip(subs[0], subs[1])]]
            elif ch_code == 9:  # right/side
                subs = [[r + s for s, r in zip(subs[0], subs[1])], subs[1]]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(subs[0], subs[1]):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    right.append((m - s) >> 1)
                subs = [left, right]
        b.align()
        b.take(16)  # crc16
        for c in range(channels):
            out[c].extend(subs[c])
        frames += 1
    return out, sample_rate, bps
