"""GIF87a/89a codec — LZW, palettes, interlace, animation (numpy + stdlib).

Like the PNG/JPEG codecs in this package, this is a REAL spec-compliant
implementation (GIF89a specification, CompuServe 1990), not a stand-in:
the writer emits files any GIF reader opens and the reader decodes
foreign streams (interlace, local color tables, transparency, disposal,
deferred clear codes, 12-bit code growth).

GIF is palette-indexed, so encoding is EXACT (lossless round-trip) when
a frame has <= 256 distinct colors — the encoder builds the exact
palette. Above 256 colors it falls back to deterministic median-cut
quantization (lossy; PSNR depends on content, documented at call sites).
Decoding is always exact per spec.

Animated GIFs composite frames onto the logical screen honoring frame
rects, per-frame transparency, and disposal methods 0/1 (draw over),
2 (restore background), 3 (restore previous). ``decode_gif_frames``
returns ``(fps, frames)`` matching ``decode_avi_rgb``'s contract so the
video frame sampler consumes animated GIFs directly — the web's most
common short-video container.

Reference parity note: the reference crawler (nlpaueb/edgar-crawler)
stores fetched payloads as opaque blobs; this codec serves the graft's
image+caption payload axis (BASELINE.json input_hint), not a reference
file.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_SIGS = (b"GIF87a", b"GIF89a")


# --------------------------------------------------------------------------
# LZW (GIF variable-code-width variant, LSB-first bit packing)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW: codes start at ``min_code_size + 1`` bits, grow
    when the just-added table entry's index reaches ``2**width`` (so the
    next emission can reference it), cap at 12 bits, and emit a CLEAR +
    reset when the table would exceed 4096 entries."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    # composite table keyed by (prefix code, next symbol) int pairs —
    # single-symbol strings are their own codes implicitly, and the
    # per-pixel bytes-concat allocations of the string-keyed form go
    # away (the encode hot path; BENCH/BASELINE.md round-4 session-6)
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    emit(clear, width)
    seq = indices.tobytes()
    w = -1
    for k in seq:
        if w < 0:
            w = k
            continue
        key = (w, k)
        code = table.get(key)
        if code is not None:
            w = code
            continue
        emit(w, width)
        if next_code < 4096:
            table[key] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {}
            next_code = eoi + 1
            width = min_code_size + 1
        w = k
    if w >= 0:
        emit(w, width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Decode a GIF LZW stream (concatenated sub-block payloads).
    Handles deferred clear codes (full table, no reset) and the
    first-code-after-clear special case."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # 32-bit little-endian window per byte offset: a ≤12-bit code read
    # is two shifts and a mask (the per-code numpy slice dot product
    # here was the decode hot path; BENCH/BASELINE.md round-4
    # session-6)
    pad = np.frombuffer(data + b"\x00\x00\x00\x00", np.uint8).astype(np.uint32)
    win_a = pad[:-3].copy()
    win_a |= pad[1:-2] << np.uint32(8)
    win_a |= pad[2:-1] << np.uint32(16)
    win_a |= pad[3:] << np.uint32(24)
    win = win_a.tolist()
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    n_bits = len(data) * 8
    while len(out) < n_pixels:
        if pos + width > n_bits:
            raise ValueError("GIF: LZW stream truncated")
        code = (win[pos >> 3] >> (pos & 7)) & ((1 << width) - 1)
        pos += width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or code > eoi):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"GIF: corrupt LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF: pixel data ended early")
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


# --------------------------------------------------------------------------
# Palettes


def _median_cut(flat: np.ndarray, k: int = 256) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic median-cut quantizer: recursively split the box
    with the widest channel range at its median until ``k`` boxes exist;
    palette entry = box mean, assignment = box membership (the classic
    exact-partition form — no nearest-neighbor pass, fully reproducible)."""
    boxes: list[np.ndarray] = [np.arange(len(flat))]
    while len(boxes) < k:
        best, best_range, best_ch = -1, 0, 0
        for bi, idx in enumerate(boxes):
            sub = flat[idx]
            rng = sub.max(axis=0).astype(int) - sub.min(axis=0).astype(int)
            ch = int(np.argmax(rng))
            if rng[ch] > best_range:
                best, best_range, best_ch = bi, int(rng[ch]), ch
        if best < 0:  # every box is a single color — nothing left to split
            break
        idx = boxes.pop(best)
        vals = flat[idx, best_ch]
        # stable sort keeps the split deterministic on ties
        order = np.argsort(vals, kind="stable")
        half = len(order) // 2
        boxes.append(idx[order[:half]])
        boxes.append(idx[order[half:]])
    palette = np.empty((len(boxes), 3), np.uint8)
    assign = np.empty(len(flat), np.int32)
    for bi, idx in enumerate(boxes):
        palette[bi] = np.round(flat[idx].mean(axis=0))
        assign[idx] = bi
    return palette, assign


def _build_palette(pixels: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(h, w, 3) uint8 → (palette (n<=256, 3), indices flat int). Exact
    when the image has <= 256 distinct colors, median-cut otherwise."""
    flat = pixels.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) <= 256:
        return colors.astype(np.uint8), inverse.astype(np.int32)
    return _median_cut(flat)


def _palette_block(palette: np.ndarray) -> tuple[bytes, int, int]:
    """Pad palette to a power-of-two size >= 2; returns (raw bytes,
    size_bits field value, min LZW code size)."""
    n = max(2, int(palette.shape[0]))
    size_bits = max(1, (n - 1).bit_length())  # 2**size_bits entries
    padded = np.zeros((1 << size_bits, 3), np.uint8)
    padded[: len(palette)] = palette
    return padded.tobytes(), size_bits - 1, max(2, size_bits)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    return np.concatenate([np.arange(start, h, step) for start, step in _INTERLACE_PASSES])


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# --------------------------------------------------------------------------
# Encode


def _frame_bytes(pixels: np.ndarray, interlace: bool) -> tuple[bytes, bytes]:
    """One image descriptor + local color table + LZW data for a
    full-screen frame; returns (descriptor+data, palette_raw is inlined)."""
    h, w, _ = pixels.shape
    palette, indices = _build_palette(pixels)
    pal_raw, size_field, mcs = _palette_block(palette)
    idx2d = indices.reshape(h, w).astype(np.uint8)
    if interlace:
        idx2d = idx2d[_interlace_order(h)]
    packed = 0x80 | (0x40 if interlace else 0) | size_field
    desc = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, packed)
    lzw = _lzw_encode(idx2d.reshape(-1), mcs)
    return desc + pal_raw + bytes([mcs]) + _sub_blocks(lzw), pal_raw


def encode_gif(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 → single-frame GIF89a. Lossless for <= 256
    distinct colors (exact palette), median-cut quantized above."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    frame, _ = _frame_bytes(pixels, interlace)
    lsd = struct.pack("<HHBBB", w, h, 0, 0, 0)  # no global color table
    return b"GIF89a" + lsd + frame + b"\x3b"


def encode_gif_frames(
    frames: np.ndarray, delay_cs: int = 4, interlace: bool = False
) -> bytes:
    """(T, h, w, 3) uint8 → animated GIF89a 'looping' clip: Netscape
    loop extension + per-frame graphic control (delay in centiseconds)
    + full-screen frames each with an exact/median-cut local palette."""
    t, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8 and t >= 1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0, 0, 0)
    # Netscape 2.0 application extension: loop forever
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for k in range(t):
        # graphic control: disposal 1 (draw over), no transparency
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 1 << 2, delay_cs, 0, 0)
        frame, _ = _frame_bytes(frames[k], interlace)
        out += frame
    out += b"\x3b"
    return bytes(out)


# --------------------------------------------------------------------------
# Decode


def _parse_frames(data: bytes):
    """Yield composited full-screen frames: (canvas copy, delay_cs).
    Handles GCT/LCT, interlace, frame rects, transparency, disposal
    0/1/2/3, and skips comment/plain-text/application extensions."""
    if data[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF")
    if len(data) < 14:
        raise ValueError("GIF: truncated header")
    sw, sh, packed, bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    if gct is not None and bg < len(gct):
        canvas = np.tile(gct[bg], (sh, sw, 1)).astype(np.uint8)
    else:
        canvas = np.zeros((sh, sw, 3), np.uint8)
    bg_canvas = canvas.copy()
    transparent = -1
    disposal = 0
    delay_cs = 0
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                size = data[pos]
                gpacked, delay_cs, tindex = struct.unpack(
                    "<BHB", data[pos + 1 : pos + 5]
                )
                disposal = (gpacked >> 2) & 0x07
                transparent = tindex if gpacked & 1 else -1
                pos += 1 + size
                if data[pos] != 0:
                    raise ValueError("GIF: bad GCE terminator")
                pos += 1
            else:  # comment / plain text / application — skip sub-blocks
                if label == 0x01 or label == 0xFF:
                    pos += 1 + data[pos]  # the fixed-size header sub-block
                while data[pos] != 0:
                    pos += 1 + data[pos]
                pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
        pos += 10
        lct = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            lct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if lct is None:
            raise ValueError("GIF: frame has no color table")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            size = data[pos]
            lzw += data[pos + 1 : pos + 1 + size]
            pos += 1 + size
        pos += 1
        indices = _lzw_decode(bytes(lzw), mcs, fw * fh).reshape(fh, fw)
        if fpacked & 0x40:  # interlaced: invert the pass permutation
            deinter = np.empty(fh, np.int64)
            deinter[_interlace_order(fh)] = np.arange(fh)
            indices = indices[deinter]
        saved = canvas.copy() if disposal == 3 else None
        rect = canvas[top : top + fh, left : left + fw]
        rgb = lct[np.clip(indices, 0, len(lct) - 1)]
        if transparent >= 0:
            mask = indices != transparent
            rect[mask] = rgb[mask]
        else:
            rect[:, :] = rgb
        yield canvas.copy(), delay_cs
        if disposal == 2:
            canvas[top : top + fh, left : left + fw] = bg_canvas[
                top : top + fh, left : left + fw
            ]
        elif disposal == 3 and saved is not None:
            canvas = saved
        transparent, disposal = -1, 0


def decode_gif(data: bytes) -> np.ndarray:
    """First composited frame as (h, w, 3) uint8 (the still-image view
    of any GIF, animated or not)."""
    for canvas, _delay in _parse_frames(data):
        return canvas
    raise ValueError("GIF: no image data")


def decode_gif_frames(data: bytes) -> tuple[float, np.ndarray]:
    """All composited frames: (fps, (T, h, w, 3) uint8) — the same
    contract as ``decode_avi_rgb`` so the video sampler consumes
    animated GIFs transparently. fps derives from the median per-frame
    delay (GIF delays are centiseconds; 0 → the de-facto 10 fps)."""
    frames, delays = [], []
    for canvas, delay_cs in _parse_frames(data):
        frames.append(canvas)
        delays.append(delay_cs)
    if not frames:
        raise ValueError("GIF: no image data")
    med = float(np.median(delays))
    fps = 100.0 / med if med > 0 else 10.0
    return fps, np.stack(frames)
