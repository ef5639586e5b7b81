"""Minimal FLAC *encoder* used only to generate test fixtures for the native
decoder (no FLAC tooling exists in this environment). Supports CONSTANT,
VERBATIM, FIXED(0-2) and LPC subframes with Rice-coded residuals (partition
order 0), independent or left/side stereo. Written from the FLAC spec."""

from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.acc & 0xFF)
                self.acc, self.nbits = 0, 0

    def write_signed(self, value: int, bits: int):
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        while self.nbits != 0:
            self.write(0, 1)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def _utf8_number(bw: BitWriter, n: int):
    if n < 0x80:
        bw.write(n, 8)
    else:  # two-byte form is enough for tests
        bw.write(0xC0 | (n >> 6), 8)
        bw.write(0x80 | (n & 0x3F), 8)


def _rice_residual(bw: BitWriter, residuals: np.ndarray, param: int):
    bw.write(0, 2)  # method: rice 4-bit params
    bw.write(0, 4)  # partition order 0
    bw.write(param, 4)
    for e in residuals:
        e = int(e)
        u = (e << 1) ^ (e >> 63) if e < 0 else (e << 1)
        if e < 0:
            u = (-e << 1) - 1
        bw.write_unary(u >> param)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _subframe(bw: BitWriter, samples: np.ndarray, bps: int, mode: str,
              rice_param: int = 4, wasted: int = 0):
    bw.write(0, 1)  # padding
    if mode == "constant":
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(int(samples[0]), bps)
    elif mode == "verbatim":
        bw.write(1, 6)
        if wasted:
            # samples must have the low `wasted` bits zero
            bw.write(1, 1)
            for _ in range(wasted - 1):
                bw.write(0, 1)
            bw.write(1, 1)
            for s in samples:
                bw.write_signed(int(s) >> wasted, bps - wasted)
            return
        bw.write(0, 1)
        for s in samples:
            bw.write_signed(int(s), bps)
    elif mode.startswith("fixed"):
        order = int(mode[-1])
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for s in samples[:order]:
            bw.write_signed(int(s), bps)
        x = samples.astype(np.int64)
        if order == 0:
            res = x
        elif order == 1:
            res = x[1:] - x[:-1]
        elif order == 2:
            res = x[2:] - 2 * x[1:-1] + x[:-2]
        else:
            raise ValueError(order)
        _rice_residual(bw, res, rice_param)
    elif mode == "lpc":
        # order-2 LPC with chosen coefficients
        order, precision, shift = 2, 12, 9
        coefs = [700, -200]  # pred = (700*x[i-1] - 200*x[i-2]) >> 9
        bw.write(32 + (order - 1), 6)
        bw.write(0, 1)
        for s in samples[:order]:
            bw.write_signed(int(s), bps)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, precision)
        x = samples.astype(np.int64)
        pred = (coefs[0] * x[1:-1] + coefs[1] * x[:-2]) >> shift
        res = x[2:] - pred
        _rice_residual(bw, res, rice_param)
    else:
        raise ValueError(mode)


def encode_flac(
    channels_data: np.ndarray,  # int [C, T]
    sample_rate: int = 16000,
    bps: int = 16,
    block_size: int = 4096,
    mode: str = "verbatim",
    stereo_mode: str = "independent",  # or "left_side"
    wasted: int = 0,  # verbatim-only: wasted-bits-per-sample
) -> bytes:
    x = np.asarray(channels_data, np.int64)
    assert x.ndim == 2
    n_ch, n_total = x.shape

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n_total, 36)
    body = si.getvalue() + b"\x00" * 16  # md5 zeros
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for start in range(0, n_total, block_size):
        blk = x[:, start : start + block_size]
        bs = blk.shape[1]
        bw = BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocksize stream
        bw.write(7, 4)  # blocksize: 16-bit at end of header
        bw.write(0, 4)  # sample rate: from STREAMINFO
        if n_ch == 2 and stereo_mode == "left_side":
            bw.write(8, 4)
        else:
            bw.write(n_ch - 1, 4)
        bw.write(0, 3)  # sample size: from STREAMINFO
        bw.write(0, 1)  # reserved
        _utf8_number(bw, frame_no)
        bw.write(bs - 1, 16)
        bw.write(0, 8)  # CRC-8 (decoder does not verify)

        if n_ch == 2 and stereo_mode == "left_side":
            left = blk[0]
            side = blk[0] - blk[1]
            _subframe(bw, left, bps, mode)
            _subframe(bw, side, bps + 1, mode)
        else:
            for c in range(n_ch):
                _subframe(bw, blk[c], bps, mode, wasted=wasted)
        bw.align()
        bw.write(0, 16)  # CRC-16 (decoder does not verify)
        out += bw.getvalue()
        frame_no += 1
    return bytes(out)
