"""Fuzz the vectorized bit-IO primitives against per-bit references.

These are load-bearing for three codecs now (VP8L, GIF-LZW, and the
JPEG prefix-LUT shares the same windowing idea) — a one-bit error
here corrupts every stream, so pin them independently of any codec
round-trip."""

import random

import numpy as np

from edgar_crawler_spark.functions.webpcodec import (
    _BitReader,
    _BitWriter,
    _bitrev,
    _bitrev_arr,
    _Decoder,
    _canonical,
    _limited_lengths,
)


def _ref_pack(chunks):
    """Per-bit LSB-first reference packer."""
    bits = []
    for v, n in chunks:
        for i in range(n):
            bits.append((v >> i) & 1)
    out = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, b in enumerate(bits[i : i + 8]):
            byte |= b << j
        out.append(byte)
    return bytes(out)


def test_bits_many_explicit_fuzz():
    rng = random.Random(11)
    for _ in range(300):
        seq = []
        lead = rng.randint(0, 7)
        if lead:
            seq.append((rng.getrandbits(lead) or 0, lead))
        body = [
            (lambda w: (rng.getrandbits(w), w))(rng.randint(1, 18))
            for _ in range(rng.randint(0, 150))
        ]
        seq.extend(body)
        tail = rng.randint(0, 11)
        if tail:
            seq.append((rng.getrandbits(tail), tail))

        bw = _BitWriter()
        if lead:
            bw.bits(*seq[0])
        bw.bits_many([v for v, n in body], [n for _, n in body])
        if tail:
            bw.bits(*seq[-1])
        assert bw.bytes() == _ref_pack(seq)


def test_bitreader_windows_match_per_bit():
    rng = random.Random(13)
    for _ in range(100):
        data = bytes(rng.getrandbits(8) for _ in range(rng.randint(1, 40)))
        br = _BitReader(data)
        ref_bits = []
        for byte in data:
            for i in range(8):
                ref_bits.append((byte >> i) & 1)
        pos = 0
        while pos < len(ref_bits):
            n = min(rng.randint(1, 14), len(ref_bits) - pos)
            want = 0
            for i in range(n):
                want |= ref_bits[pos + i] << i
            assert br.bits(n) == want
            pos += n
        # reading past the end raises
        try:
            br.bits(1)
            raise AssertionError("expected truncation error")
        except ValueError:
            pass


def test_lut_decoder_roundtrips_random_codes():
    """Random length-limited codes: every symbol encodes (bit-reversed
    chunk) then decodes through the LUT reader."""
    rng = random.Random(17)
    for _ in range(100):
        alphabet = rng.randint(2, 80)
        freq = {s: rng.randint(0, 50) for s in range(alphabet)}
        if sum(1 for v in freq.values() if v) < 2:
            freq = {0: 1, 1: 1}
        lengths = _limited_lengths(freq, alphabet)
        codes = _canonical(lengths)
        syms = [s for s in codes for _ in range(rng.randint(1, 3))]
        rng.shuffle(syms)
        bw = _BitWriter()
        for s in syms:
            c, ln = codes[s]
            bw.code(c, ln)
        dec = _Decoder(lengths)
        br = _BitReader(bw.bytes())
        assert [dec.read(br) for _ in syms] == syms


def test_bitrev_arr_matches_scalar():
    rng = np.random.default_rng(19)
    for n in (1, 5, 12, 15):
        c = rng.integers(0, 1 << n, 64, dtype=np.int64)
        got = _bitrev_arr(c.copy(), n)
        assert [int(x) for x in got] == [_bitrev(int(x), n) for x in c]
