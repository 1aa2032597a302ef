"""Real baseline JPEG (ITU-T81) codec — numpy + stdlib only, no libjpeg.

This replaces the round-3 "QNT1" stand-in with a spec-compliant baseline
sequential DCT codec:

* **Encoder**: JFIF/Annex-K output — BT.601 YCbCr, 8x8 DCT (exact
  orthonormal matrix form), Annex-K quantization tables scaled by the
  IJG quality formula, zigzag + run-length, canonical Huffman coding
  with the Annex-K K.3 tables, 0xFF byte stuffing, optional restart
  markers (DRI/RSTn) and 4:2:0 chroma subsampling, grayscale mode.
* **Decoder**: baseline (SOF0) + extended-sequential (SOF1) streams from
  ANY writer — arbitrary DQT/DHT tables, 1- or 3-component scans, any
  sampling factors up to 2x2, restart markers, missing-DHT streams
  (MJPEG convention: fall back to the K.3 tables).  Progressive (SOF2)
  streams dispatch to the Annex-G decoder in functions/jpegprog.py;
  the remaining non-baseline SOFn (lossless, arithmetic, differential)
  raise ``NotImplementedError`` naming the frame type — per-row error
  recording upstream keeps poisoned blobs from killing a job
  (operators/multimodal.py contract).

Hot-path design (the frontier fetch UDF decodes every payload): the DCT
is one einsum over all blocks, Huffman decode is table-driven — a
65536-entry prefix LUT per table (cached per process) over a
vectorized next-16-bits window array — and the encoder packs codewords
with a vectorized disjoint-OR scatter instead of a per-bit loop.

Parity notes vs the reference pipeline: edgar-crawler stores opaque
filing payloads (download_filings.py) — the image+caption payload shape
comes from BASELINE.json's input_hint; the PSNR>=40dB per-row decode
invariant is this engine's validation contract for lossy payloads.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Constant tables (ITU-T81 Annex K)
# --------------------------------------------------------------------------

# K.1 / K.2 quantization tables (row-major 8x8)
_QT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# K.3 Huffman table specs: (BITS[1..16], HUFFVAL)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# zigzag: ZZ[t] = row-major index of the t-th zigzag coefficient
_ZZ = np.array(
    sorted(
        range(64),
        key=lambda k: (
            (k // 8 + k % 8),
            (k // 8) if (k // 8 + k % 8) % 2 else (k % 8),
        ),
    ),
    dtype=np.int64,
)

# orthonormal 8-point DCT-II matrix: F = T @ f @ T.T is exactly the T81 DCT
_T = np.zeros((8, 8))
_T[0, :] = 1.0 / np.sqrt(8.0)
for _k in range(1, 8):
    _T[_k, :] = 0.5 * np.cos((2 * np.arange(8) + 1) * _k * np.pi / 16.0)

_POW16 = (1 << np.arange(15, -1, -1)).astype(np.int64)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex-K table (1..100)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (codeword, length) for a canonical Huffman spec."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_LUT_CACHE: dict[bytes, tuple[list[int], list[int], int]] = {}
# Optimal per-image tables (the progressive encoder emits fresh ones
# per scan) NEVER repeat across images, so the cache must be bounded —
# unbounded it grows ~1 MB per distinct table and a long-lived Python
# worker decoding 10^4+ images accumulates gigabytes (found as a 9×
# per-row throughput cliff between 20k- and 200k-row decode passes).
_LUT_CACHE_MAX = 128


def _decode_lut(bits: list[int], vals: list[int]) -> tuple[list[int], list[int], int]:
    """Prefix LUT sized to the table's max code length: next-16-bits
    >> shift -> (symbol, code length); length 0 marks an invalid
    prefix. Returns (sym, ln, shift). Depth 2^maxlen instead of a
    fixed 2^16 makes the build ~2^(16-maxlen)× cheaper — decisive for
    per-image optimal tables, which are built once and never reused
    (small images carry few symbols, so maxlen is typically 6-11).
    FIFO-capped cache (recurring K.3/encoder tables stay hot)."""
    key = bytes(bits) + bytes(vals)
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    maxlen = max((n for n in range(1, 17) if bits[n - 1]), default=1)
    size = 1 << maxlen
    sym = np.zeros(size, np.int32)
    ln = np.zeros(size, np.int32)
    code, k = 0, 0
    for length in range(1, maxlen + 1):
        for _ in range(bits[length - 1]):
            lo = code << (maxlen - length)
            hi = (code + 1) << (maxlen - length)
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    entry = (sym.tolist(), ln.tolist(), 16 - maxlen)
    if len(_LUT_CACHE) >= _LUT_CACHE_MAX:
        _LUT_CACHE.pop(next(iter(_LUT_CACHE)))
    _LUT_CACHE[key] = entry
    return entry


# --------------------------------------------------------------------------
# Bit packing (encoder)
# --------------------------------------------------------------------------


def _pack_bits(vals: list[int], nbits: list[int]) -> bytes:
    """Pack (value, bit-length) pairs MSB-first, pad the final byte with
    1s, and byte-stuff 0xFF -> 0xFF 0x00.  Bit ranges are disjoint, so
    the scatter is a vectorized OR — no per-bit Python loop."""
    if not vals:
        return b""
    nb = np.asarray(nbits, np.int64)
    v = np.asarray(vals, np.uint64)
    ends = np.cumsum(nb)
    starts = ends - nb
    total = int(ends[-1])
    out = np.zeros((total + 7) // 8 + 8, np.uint8)
    # value's MSB lands at bit (starts % 8) of an 8-byte window at starts//8
    shift = (64 - nb - (starts % 8)).astype(np.uint64)
    words = v << shift
    byte_split = (
        words[:, None] >> (np.arange(7, -1, -1).astype(np.uint64) * np.uint64(8))[None, :]
    ).astype(np.uint8)
    idx = (starts // 8)[:, None] + np.arange(8)[None, :]
    np.bitwise_or.at(out, idx, byte_split)
    out = out[: (total + 7) // 8]
    rem = total % 8
    if rem:
        out[-1] |= (1 << (8 - rem)) - 1
    ff = np.flatnonzero(out == 0xFF)
    if len(ff):
        out = np.insert(out, ff + 1, np.uint8(0))
    return out.tobytes()


# --------------------------------------------------------------------------
# Color transforms
# --------------------------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return y, cb, cr


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136286 * cb - 0.714136286 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _plane_blocks(plane: np.ndarray, mcus_x: int, mcus_y: int, h: int, v: int) -> np.ndarray:
    """Pad a component plane (edge replication) to the MCU grid and
    return its 8x8 blocks in scan-stream order (mcu_y, mcu_x, v, h)."""
    ph, pw = mcus_y * v * 8, mcus_x * h * 8
    rows, cols = plane.shape
    padded = np.pad(plane, ((0, ph - rows), (0, pw - cols)), mode="edge")
    return (
        padded.reshape(mcus_y, v, 8, mcus_x, h, 8)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(-1, 8, 8)
    )


def _quantize(blocks: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    coef = np.einsum("ij,njk,lk->nil", _T, blocks - 128.0, _T)
    return np.round(coef / qtbl.reshape(8, 8)).astype(np.int64).reshape(-1, 64)[:, _ZZ]


def _encode_block(
    zz: list[int],
    pred: int,
    dc_code: dict[int, tuple[int, int]],
    ac_code: dict[int, tuple[int, int]],
    vals: list[int],
    nbits: list[int],
) -> int:
    d = zz[0] - pred
    size = abs(d).bit_length()
    c, ln = dc_code[size]
    vals.append(c)
    nbits.append(ln)
    if size:
        vals.append(d if d > 0 else d + (1 << size) - 1)
        nbits.append(size)
    prev = 0
    for k in range(1, 64):
        av = zz[k]
        if av == 0:
            continue
        run = k - prev - 1
        while run >= 16:
            c, ln = ac_code[0xF0]
            vals.append(c)
            nbits.append(ln)
            run -= 16
        s = abs(av).bit_length()
        c, ln = ac_code[(run << 4) | s]
        vals.append(c)
        nbits.append(ln)
        vals.append(av if av > 0 else av + (1 << s) - 1)
        nbits.append(s)
        prev = k
    if prev != 63:
        c, ln = ac_code[0x00]
        vals.append(c)
        nbits.append(ln)
    return zz[0]


def _dht_segment(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def _dqt_segment(tid: int, qtbl_zz: np.ndarray) -> bytes:
    payload = bytes([tid]) + bytes(int(x) for x in qtbl_zz)
    return b"\xff\xdb" + struct.pack(">H", 2 + len(payload)) + payload


def encode_jpeg(
    px: np.ndarray,
    quality: int = 98,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) RGB or (h, w) grayscale uint8 -> baseline JFIF bytes.

    ``subsampling``: "4:4:4" (default — holds PSNR>=40dB even on noise
    fixtures), "4:2:2" (2x1 horizontally box-filtered chroma) or
    "4:2:0" (2x2 box-filtered chroma, natural images).
    ``restart_interval``: MCUs per restart segment (0 = no RSTn).
    """
    if px.dtype != np.uint8:
        raise ValueError("pixels must be uint8")
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError(f"expected (h,w,3) or (h,w), got {px.shape}")
    if subsampling not in ("4:4:4", "4:2:2", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    qlum = _quality_scale(_QT_LUM, quality)
    qchrom = _quality_scale(_QT_CHROM, quality)
    if gray:
        planes = [px.astype(np.float64)]
        samp = [(1, 1)]
    else:
        y, cb, cr = _rgb_to_ycbcr(px)
        sx = 2 if subsampling in ("4:2:2", "4:2:0") else 1
        sy = 2 if subsampling == "4:2:0" else 1
        if sx > 1 or sy > 1:
            # pad to the subsample grid, then box-filter the chroma
            ph = -(-h // sy) * sy
            pw = -(-w // sx) * sx
            cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cb.reshape(ph // sy, sy, pw // sx, sx).mean(axis=(1, 3))
            cr = cr.reshape(ph // sy, sy, pw // sx, sx).mean(axis=(1, 3))
        samp = [(sx, sy), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcus = mcus_x * mcus_y

    qtbls = [qlum] + [qchrom] * (len(planes) - 1)
    zz_streams = []
    for plane, (sh, sv), qtbl in zip(planes, samp, qtbls):
        blocks = _plane_blocks(plane, mcus_x, mcus_y, sh, sv)
        zz_streams.append(_quantize(blocks, qtbl).tolist())

    dc_codes = [_canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)] + [
        _canonical_codes(_DC_CHROM_BITS, _DC_CHROM_VALS)
    ] * (len(planes) - 1)
    ac_codes = [_canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)] + [
        _canonical_codes(_AC_CHROM_BITS, _AC_CHROM_VALS)
    ] * (len(planes) - 1)

    # entropy-coded segments split at restart boundaries
    segments: list[bytes] = []
    preds = [0] * len(planes)
    vals: list[int] = []
    nbits: list[int] = []
    seg_start = 0
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            segments.append(_pack_bits(vals, nbits))
            vals, nbits = [], []
            preds = [0] * len(planes)
            seg_start = m
        for ci, (sh, sv) in enumerate(samp):
            nper = sh * sv
            base = m * nper
            for b in range(nper):
                preds[ci] = _encode_block(
                    zz_streams[ci][base + b], preds[ci], dc_codes[ci], ac_codes[ci], vals, nbits
                )
    del seg_start
    segments.append(_pack_bits(vals, nbits))

    entropy = segments[0]
    for i, seg in enumerate(segments[1:]):
        entropy += bytes([0xFF, 0xD0 + (i % 8)]) + seg

    ncomp = len(planes)
    sof_comps = b"".join(
        bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
        for ci, (sh, sv) in enumerate(samp)
    )
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp) + sof_comps
    sos_comps = b"".join(bytes([ci + 1, 0 if ci == 0 else 0x11]) for ci in range(ncomp))
    sos = b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp) + sos_comps + b"\x00\x3f\x00"
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    out = [b"\xff\xd8", app0, _dqt_segment(0, qlum[_ZZ])]
    if ncomp > 1:
        out.append(_dqt_segment(1, qchrom[_ZZ]))
    out.append(sof)
    out.append(_dht_segment(0, 0, _DC_LUM_BITS, _DC_LUM_VALS))
    out.append(_dht_segment(1, 0, _AC_LUM_BITS, _AC_LUM_VALS))
    if ncomp > 1:
        out.append(_dht_segment(0, 1, _DC_CHROM_BITS, _DC_CHROM_VALS))
        out.append(_dht_segment(1, 1, _AC_CHROM_BITS, _AC_CHROM_VALS))
    if restart_interval:
        out.append(b"\xff\xdd" + struct.pack(">HH", 4, restart_interval))
    out.append(sos)
    out.append(entropy)
    out.append(b"\xff\xd9")
    return b"".join(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

_NON_BASELINE_SOF = {
    0xC3: "lossless (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)",
    0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def _bit_windows(seg: bytes) -> list[int]:
    """Next-16-bits value at every bit position (zero-padded tail)."""
    bits = np.unpackbits(np.frombuffer(seg, np.uint8))
    padded = np.concatenate([bits, np.zeros(16, np.uint8)])
    win = np.lib.stride_tricks.sliding_window_view(padded, 16)[: len(bits) + 1]
    return win.astype(np.int64).dot(_POW16).tolist()


def _decode_segment(
    seg: bytes,
    n_mcus: int,
    comps: list[dict],
    preds: list[int],
    out_blocks: list[list[list[int]]],
) -> None:
    windows = _bit_windows(seg)
    nwin = len(windows)
    p = 0
    try:
        for _ in range(n_mcus):
            for ci, comp in enumerate(comps):
                dc_sym, dc_len, dc_sh = comp["dc_lut"]
                ac_sym, ac_len, ac_sh = comp["ac_lut"]
                for _b in range(comp["h"] * comp["v"]):
                    i16 = windows[p] >> dc_sh
                    ln = dc_len[i16]
                    if ln == 0:
                        raise ValueError("invalid DC Huffman code")
                    s = dc_sym[i16]
                    p += ln
                    if s:
                        raw = windows[p] >> (16 - s)
                        p += s
                        diff = raw - (1 << s) + 1 if raw < (1 << (s - 1)) else raw
                    else:
                        diff = 0
                    preds[ci] += diff
                    blk = [0] * 64
                    blk[0] = preds[ci]
                    k = 1
                    while k < 64:
                        i16 = windows[p] >> ac_sh
                        ln = ac_len[i16]
                        if ln == 0:
                            raise ValueError("invalid AC Huffman code")
                        sym = ac_sym[i16]
                        p += ln
                        if sym == 0:
                            break
                        run = sym >> 4
                        s = sym & 0x0F
                        if s == 0:
                            if run != 15:
                                raise ValueError(f"bad AC symbol {sym:#x}")
                            k += 16
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("AC run past end of block")
                        raw = windows[p] >> (16 - s)
                        p += s
                        blk[k] = raw - (1 << s) + 1 if raw < (1 << (s - 1)) else raw
                        k += 1
                    out_blocks[ci].append(blk)
            if p > nwin - 1:
                raise ValueError("entropy data truncated")
    except IndexError:
        raise ValueError("entropy data truncated") from None


def _decode_segment_dc(
    seg: bytes,
    n_mcus: int,
    comps: list[dict],
    preds: list[int],
    out_dc: list[list[int]],
) -> None:
    """DC-only twin of :func:`_decode_segment`: the AC coefficients
    must still be Huffman-walked (the bit position depends on them) but
    are never stored — and the caller skips dezigzag + IDCT entirely."""
    windows = _bit_windows(seg)
    nwin = len(windows)
    p = 0
    try:
        for _ in range(n_mcus):
            for ci, comp in enumerate(comps):
                dc_sym, dc_len, dc_sh = comp["dc_lut"]
                ac_sym, ac_len, ac_sh = comp["ac_lut"]
                for _b in range(comp["h"] * comp["v"]):
                    i16 = windows[p] >> dc_sh
                    ln = dc_len[i16]
                    if ln == 0:
                        raise ValueError("invalid DC Huffman code")
                    s = dc_sym[i16]
                    p += ln
                    if s:
                        raw = windows[p] >> (16 - s)
                        p += s
                        diff = raw - (1 << s) + 1 if raw < (1 << (s - 1)) else raw
                    else:
                        diff = 0
                    preds[ci] += diff
                    out_dc[ci].append(preds[ci])
                    k = 1
                    while k < 64:
                        i16 = windows[p] >> ac_sh
                        ln = ac_len[i16]
                        if ln == 0:
                            raise ValueError("invalid AC Huffman code")
                        sym = ac_sym[i16]
                        p += ln
                        if sym == 0:
                            break
                        run = sym >> 4
                        s = sym & 0x0F
                        if s == 0:
                            if run != 15:
                                raise ValueError(f"bad AC symbol {sym:#x}")
                            k += 16
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("AC run past end of block")
                        p += s
                        k += 1
            if p > nwin - 1:
                raise ValueError("entropy data truncated")
    except IndexError:
        raise ValueError("entropy data truncated") from None


def decode_jpeg(data: bytes, dc_only: bool = False) -> np.ndarray:
    """Baseline/extended-sequential JPEG bytes -> (h, w, 3) uint8 RGB
    (grayscale replicated to 3 channels).  Raises ValueError on corrupt
    streams and NotImplementedError on non-baseline frame types.

    ``dc_only=True`` returns the 1/8-scale DC thumbnail instead:
    (ceil(h/8), ceil(w/8), 3).  Each DC coefficient is exactly 8x the
    mean of its reconstructed 8x8 block, so the thumbnail is the
    block-mean downsample of the full decode — computed without
    storing AC coefficients or running any IDCT (the dominant decode
    cost), which is what a 100 TB perceptual-dedup pass should pay."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple[list[int], list[int]]] = {}
    frame = None
    restart_interval = 0
    scan = None
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0x0F
                count = 64 * (2 if pq else 1)
                raw = body[bp + 1 : bp + 1 + count]
                if len(raw) < count:
                    raise ValueError("truncated DQT")
                tbl = (
                    np.frombuffer(raw, ">u2").astype(np.int64)
                    if pq
                    else np.frombuffer(raw, np.uint8).astype(np.int64)
                )
                # kept in DQT (zigzag) order: dequantization below runs in
                # the zigzag domain, before the dez[:, _ZZ] scatter.
                qtables[tq] = tbl
                bp += 1 + count
        elif marker == 0xC4:  # DHT
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0x0F
                bits = list(body[bp + 1 : bp + 17])
                nv = sum(bits)
                vals = list(body[bp + 17 : bp + 17 + nv])
                if len(vals) != nv:
                    raise ValueError("truncated DHT")
                htables[(tc, th)] = (bits, vals)
                bp += 17 + nv
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec, fh, fw, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision unsupported")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker == 0xC2:  # progressive: delegate to the Annex-G decoder
            from edgar_crawler_spark.functions.jpegprog import decode_progressive

            return decode_progressive(data, dc_only=dc_only)
        elif marker in _NON_BASELINE_SOF:
            raise NotImplementedError(
                f"{_NON_BASELINE_SOF[marker]} JPEG unsupported (baseline only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            sel = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
            scan = (sel, pos + 2 + seglen)
            break
        # APPn / COM / others: skip
        pos += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS")
    sel, epos = scan

    # MJPEG convention: streams with no DHT use the Annex-K tables
    if not htables:
        htables = {
            (0, 0): (_DC_LUM_BITS, _DC_LUM_VALS),
            (1, 0): (_AC_LUM_BITS, _AC_LUM_VALS),
            (0, 1): (_DC_CHROM_BITS, _DC_CHROM_VALS),
            (1, 1): (_AC_CHROM_BITS, _AC_CHROM_VALS),
        }

    comps_by_id = {c["id"]: c for c in frame["comps"]}
    comps = []
    for cid, tdta in sel:
        c = comps_by_id.get(cid)
        if c is None:
            raise ValueError(f"scan references unknown component {cid}")
        td, ta = tdta >> 4, tdta & 0x0F
        if (0, td) not in htables or (1, ta) not in htables:
            raise ValueError("scan references missing Huffman table")
        if c["tq"] not in qtables:
            raise ValueError("scan references missing quantization table")
        comps.append(
            {
                **c,
                "dc_lut": _decode_lut(*htables[(0, td)]),
                "ac_lut": _decode_lut(*htables[(1, ta)]),
            }
        )
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("unsupported sampling factors")
    h, w = frame["h"], frame["w"]
    if h == 0 or w == 0:
        raise ValueError("empty frame")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcus = mcus_x * mcus_y

    # split entropy data at RST markers, destuffing each segment
    segments: list[bytes] = []
    seg_start = epos
    p = epos
    while True:
        ff = data.find(b"\xff", p)
        if ff < 0 or ff + 1 >= n:
            segments.append(data[seg_start:n])
            break
        nxt = data[ff + 1]
        if nxt == 0x00 or 0xD0 > nxt or nxt > 0xD7:
            if nxt == 0x00:
                p = ff + 2
                continue
            segments.append(data[seg_start:ff])
            break
        segments.append(data[seg_start:ff])
        seg_start = ff + 2
        p = ff + 2
    segments = [s.replace(b"\xff\x00", b"\xff") for s in segments]

    out_blocks: list[list[list[int]]] = [[] for _ in comps]
    per_seg = restart_interval if restart_interval else n_mcus
    done = 0
    for seg in segments:
        if done >= n_mcus:
            break
        take = min(per_seg, n_mcus - done)
        preds = [0] * len(comps)
        if dc_only:
            _decode_segment_dc(seg, take, comps, preds, out_blocks)
        else:
            _decode_segment(seg, take, comps, preds, out_blocks)
        done += take
    if done < n_mcus:
        raise ValueError(f"decoded {done}/{n_mcus} MCUs (truncated stream)")

    if dc_only:
        planes = []
        for ci, comp in enumerate(comps):
            q0 = float(qtables[comp["tq"]][0])
            sh, sv = comp["h"], comp["v"]
            dc = np.asarray(out_blocks[ci], np.float64) * q0 / 8.0 + 128.0
            grid = (
                dc.reshape(mcus_y, mcus_x, sv, sh)
                .transpose(0, 2, 1, 3)
                .reshape(mcus_y * sv, mcus_x * sh)
            )
            cw = -(-w * sh // hmax)
            ch = -(-h * sv // vmax)
            grid = grid[: -(-ch // 8), : -(-cw // 8)]
            if sh != hmax or sv != vmax:
                grid = np.repeat(
                    np.repeat(grid, vmax // sv, axis=0), hmax // sh, axis=1
                )
            planes.append(grid[: -(-h // 8), : -(-w // 8)])
        if len(planes) == 1:
            g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
            return np.repeat(g[:, :, None], 3, axis=2)
        if len(planes) != 3:
            raise ValueError(f"unsupported component count {len(planes)}")
        return _ycbcr_to_rgb(planes[0], planes[1], planes[2])

    planes = []
    for ci, comp in enumerate(comps):
        qtbl = qtables[comp["tq"]].astype(np.float64)
        arr = np.asarray(out_blocks[ci], np.float64) * qtbl[np.newaxis, :]
        dez = np.empty_like(arr)
        dez[:, _ZZ] = arr
        blocks = np.einsum("ji,njk,kl->nil", _T, dez.reshape(-1, 8, 8), _T) + 128.0
        sh, sv = comp["h"], comp["v"]
        plane = (
            blocks.reshape(mcus_y, mcus_x, sv, sh, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcus_y * sv * 8, mcus_x * sh * 8)
        )
        cw = -(-w * sh // hmax)
        ch = -(-h * sv // vmax)
        plane = plane[:ch, :cw]
        if sh != hmax or sv != vmax:
            plane = np.repeat(np.repeat(plane, vmax // sv, axis=0), hmax // sh, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(planes) != 3:
        raise ValueError(f"unsupported component count {len(planes)}")
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
