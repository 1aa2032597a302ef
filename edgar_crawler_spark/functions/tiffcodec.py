"""Baseline TIFF 6.0 codec — the scanned-document container a training
corpus meets right after JPEG/PNG. Pure stdlib + numpy, same
no-external-codec posture as the rest of functions/ (reference parity
note: the reference crawls text filings only; this container belongs
to the engine's multimodal surface, not the reference surface).

Decoder handles what real-world baseline TIFFs carry:

* both byte orders (II/MM), IFD walk with bounds checks;
* Compression 1 (none), 32773 (PackBits), 5 (LZW — the TIFF variant:
  MSB-first code packing and the spec's off-by-one "early change"
  width switch, which is NOT the GIF variant);
* Predictor 2 (horizontal differencing) via per-row cumsum;
* PhotometricInterpretation 0/1 (grayscale, MinIsWhite inverted),
  2 (RGB, extra samples dropped), 3 (palette via ColorMap, 16-bit
  entries scaled down);
* multiple strips (RowsPerStrip), SamplesPerPixel 1/3/4.

8 bits per sample only; anything else raises a NAMED
NotImplementedError (tiled TIFFs, 16-bit, CCITT fax codings) — the
per-row error-recording kernels surface it instead of crashing.

Encoder emits II, single-IFD, strip-based files with compression
none / PackBits / LZW (+ optional predictor 2), so round-trips and
foreign-layout decodes are both testable without fixtures.
"""

from __future__ import annotations

import struct

import numpy as np

_T_WIDTH, _T_LENGTH, _T_BPS, _T_COMP = 256, 257, 258, 259
_T_PHOTO, _T_STRIP_OFF, _T_SPP, _T_RPS = 262, 273, 277, 278
_T_STRIP_CNT, _T_PLANAR, _T_PREDICTOR, _T_COLORMAP = 279, 284, 317, 320


# --------------------------------------------------------------------------
# PackBits (TIFF §9)


def _packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)  # -(run-1) two's complement
            out.append(row[i])
            i += run
            continue
        lit = i
        while (
            i < n
            and i - lit < 128
            and not (i + 2 < n and row[i] == row[i + 1] == row[i + 2])
        ):
            i += 1
        out.append(i - lit - 1)
        out.extend(row[lit:i])
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while len(out) < expected and i < n:
        b = data[i]
        i += 1
        if b == 128:  # no-op per spec
            continue
        if b < 128:
            out.extend(data[i : i + b + 1])
            i += b + 1
        else:
            if i >= n:
                break
            out.extend(bytes([data[i]]) * (257 - b))
            i += 1
    if len(out) < expected:
        raise ValueError("TIFF: PackBits strip ended early")
    return bytes(out[:expected])


# --------------------------------------------------------------------------
# TIFF-variant LZW (TIFF §13): MSB-first codes, early-change widths


def _lzw_encode_tiff(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    CLEAR, EOI = 256, 257
    width = 9
    table: dict[tuple[int, int], int] = {}
    next_code = 258
    emit(CLEAR, width)
    w = -1
    for k in data:
        if w < 0:
            w = k
            continue
        code = table.get((w, k))
        if code is not None:
            w = code
            continue
        emit(w, width)
        table[(w, k)] = next_code
        next_code += 1
        # early change: switch one code EARLIER than GIF would
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:  # spec: clear at table-full
            emit(CLEAR, width)
            table = {}
            next_code = 258
            width = 9
        w = k
    if w >= 0:
        emit(w, width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    CLEAR, EOI = 256, 257
    # big-endian 32-bit window per byte offset: MSB-first ≤12-bit code
    # reads are shifts and a mask (same windowing trick as the VP8L /
    # GIF readers, opposite bit order)
    pad = np.frombuffer(data + b"\x00\x00\x00\x00", np.uint8).astype(np.uint32)
    win_a = (pad[:-3] << np.uint32(24)) | (pad[1:-2] << np.uint32(16))
    win_a |= (pad[2:-1] << np.uint32(8)) | pad[3:]
    win = win_a.tolist()
    n_bits = len(data) * 8
    pos = 0
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while len(out) < expected:
        if pos + width > n_bits:
            raise ValueError("TIFF: LZW stream truncated")
        code = (win[pos >> 3] >> (32 - (pos & 7) - width)) & ((1 << width) - 1)
        pos += width
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if code < len(table) and code not in (CLEAR, EOI):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"TIFF: corrupt LZW code {code}")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        # early change, decoder side: the table here is ONE entry
        # behind the encoder's (the entry for code t is reconstructed
        # while reading code t+1), so the width must switch at
        # (1<<w)-2 to read the encoder's first (w+1)-bit code — the
        # spec's famous off-by-one
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) < expected:
        raise ValueError("TIFF: pixel data ended early")
    return bytes(out[:expected])


# --------------------------------------------------------------------------
# Decoder


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes → (h, w, 3) uint8 RGB."""
    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF")
    e = "<" if data[:2] == b"II" else ">"
    magic, ifd0 = struct.unpack(e + "HI", data[2:8])
    if magic != 42:
        raise ValueError("bad TIFF magic")
    if ifd0 + 2 > len(data):
        raise ValueError("TIFF: IFD out of bounds")
    (n_entries,) = struct.unpack(e + "H", data[ifd0 : ifd0 + 2])
    sizes = {1: 1, 3: 2, 4: 4}
    tags: dict[int, tuple] = {}
    for i in range(n_entries):
        p = ifd0 + 2 + 12 * i
        if p + 12 > len(data):
            break
        tag, typ, count = struct.unpack(e + "HHI", data[p : p + 8])
        if typ not in sizes:
            continue
        nbytes = sizes[typ] * count
        if nbytes > 4:
            (off,) = struct.unpack(e + "I", data[p + 8 : p + 12])
            buf = data[off : off + nbytes]
            if len(buf) < nbytes:
                continue
        else:
            buf = data[p + 8 : p + 8 + nbytes]
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = struct.unpack(e + f"{count}{fmt}", buf)

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF: missing required tag {tag}")
            return default
        return int(v[0])

    w, h = one(_T_WIDTH), one(_T_LENGTH)
    comp = one(_T_COMP, 1)
    photo = one(_T_PHOTO, 1)
    spp = one(_T_SPP, 1)
    bps = tags.get(_T_BPS, (8,))
    if any(b != 8 for b in bps):
        raise NotImplementedError(f"TIFF bits-per-sample {bps} unsupported (8 only)")
    if one(_T_PLANAR, 1) != 1:
        raise NotImplementedError("TIFF planar (separated) configuration unsupported")
    if comp not in (1, 5, 32773):
        name = {2: "CCITT G3", 3: "CCITT G4", 6: "old JPEG", 7: "JPEG"}.get(
            comp, str(comp)
        )
        raise NotImplementedError(f"TIFF compression {name} unsupported")
    predictor = one(_T_PREDICTOR, 1)
    rps = one(_T_RPS, h)
    offs = tags.get(_T_STRIP_OFF)
    cnts = tags.get(_T_STRIP_CNT)
    if not offs or not cnts or len(offs) != len(cnts):
        raise ValueError("TIFF: malformed strip layout")

    row_bytes = w * spp
    rows = []
    for si, (off, cnt) in enumerate(zip(offs, cnts)):
        strip = data[off : off + cnt]
        if len(strip) < cnt:
            raise ValueError("TIFF: strip out of bounds")
        n_rows = min(rps, h - si * rps)
        if n_rows <= 0:
            break
        expected = n_rows * row_bytes
        if comp == 1:
            if len(strip) < expected:
                raise ValueError("TIFF: strip ended early")
            raw = strip[:expected]
        elif comp == 32773:
            raw = _packbits_decode(strip, expected)
        else:
            raw = _lzw_decode_tiff(strip, expected)
        rows.append(np.frombuffer(raw, np.uint8).reshape(n_rows, w, spp))
    if not rows:
        raise ValueError("TIFF: no image rows")
    px = np.concatenate(rows) if len(rows) > 1 else rows[0]
    if px.shape[0] != h:
        raise ValueError("TIFF: strip rows do not cover the image")
    if predictor == 2:
        px = np.cumsum(px.astype(np.uint32), axis=1).astype(np.uint8)
    elif predictor != 1:
        raise NotImplementedError(f"TIFF predictor {predictor} unsupported")
    if photo in (0, 1):
        g = px[:, :, 0]
        if photo == 0:  # MinIsWhite
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2).copy()
    if photo == 3:
        cmap = tags.get(_T_COLORMAP)
        if not cmap or len(cmap) != 3 * 256:
            raise ValueError("TIFF: palette image without a 256-entry ColorMap")
        lut = (np.asarray(cmap, np.uint32).reshape(3, 256).T >> 8).astype(np.uint8)
        return lut[px[:, :, 0]]
    if photo == 2:
        if spp < 3:
            raise ValueError("TIFF: RGB photometric with <3 samples")
        return px[:, :, :3].copy()  # extra samples (alpha) dropped
    raise NotImplementedError(f"TIFF photometric {photo} unsupported")


# --------------------------------------------------------------------------
# Encoder (II, one IFD, strip-based)


def encode_tiff(
    px: np.ndarray,
    compression: str = "packbits",
    rows_per_strip: int = 0,
    predictor: bool = False,
    make: str | None = None,
    model: str | None = None,
    datetime: str | None = None,
    orientation: int | None = None,
) -> bytes:
    """(h, w, 3) uint8 RGB → baseline TIFF bytes (little-endian).
    ``compression``: none | packbits | lzw; ``predictor`` applies
    horizontal differencing before LZW (the standard pairing).
    ``make``/``model``/``datetime``/``orientation`` write the native
    IFD0 metadata tags scanned-photo TIFFs carry (TIFF is the EXIF
    container — functions.metadata.parse_exif reads these directly)."""
    if px.dtype != np.uint8 or px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5}.get(compression)
    if comp_id is None:
        raise ValueError(f"unsupported compression {compression!r}")
    if predictor and comp_id != 5:
        raise ValueError("predictor 2 is paired with LZW here")
    h, w = px.shape[:2]
    rps = rows_per_strip or h
    src = px
    if predictor:
        d = src.astype(np.int16)
        d[:, 1:] -= src[:, :-1].astype(np.int16)
        src = (d % 256).astype(np.uint8)
    strips = []
    for y0 in range(0, h, rps):
        raw = src[y0 : y0 + rps].tobytes()
        if comp_id == 1:
            strips.append(raw)
        elif comp_id == 32773:
            strips.append(_packbits_encode(raw))
        else:
            strips.append(_lzw_encode_tiff(raw))

    entries = []  # (tag, typ, count, value-or-bytes)
    ext = bytearray()  # out-of-line values, appended after the IFD

    def entry(tag, typ, vals):
        fmt = {3: "H", 4: "I"}[typ]
        size = {3: 2, 4: 4}[typ] * len(vals)
        packed = struct.pack(f"<{len(vals)}{fmt}", *vals)
        entries.append((tag, typ, len(vals), packed, size))

    def ascii_entry(tag, text):
        s = text.encode("ascii") + b"\x00"
        entries.append((tag, 2, len(s), s, len(s)))

    n_strips = len(strips)
    entry(_T_WIDTH, 4, [w])
    entry(_T_LENGTH, 4, [h])
    entry(_T_BPS, 3, [8, 8, 8])
    entry(_T_COMP, 3, [comp_id])
    entry(_T_PHOTO, 3, [2])
    if make is not None:
        ascii_entry(0x010F, make)
    if model is not None:
        ascii_entry(0x0110, model)
    if orientation is not None:
        entry(0x0112, 3, [orientation])
    entry(_T_STRIP_OFF, 4, [0] * n_strips)  # patched below
    entry(_T_SPP, 3, [3])
    entry(_T_RPS, 4, [rps])
    entry(_T_STRIP_CNT, 4, [len(s) for s in strips])
    if datetime is not None:
        ascii_entry(0x0132, datetime)
    if predictor:
        entry(_T_PREDICTOR, 3, [2])
    entries.sort(key=lambda t: t[0])

    header = struct.pack("<2sHI", b"II", 42, 8)
    ifd_size = 2 + 12 * len(entries) + 4
    ext_base = 8 + ifd_size
    # lay out out-of-line values, then strips
    placed = []
    for tag, typ, count, packed, size in entries:
        if size > 4:
            placed.append((tag, typ, count, struct.pack("<I", ext_base + len(ext))))
            ext.extend(packed)
        else:
            placed.append((tag, typ, count, packed.ljust(4, b"\x00")))
    strip_base = ext_base + len(ext)
    offsets = []
    at = strip_base
    for s in strips:
        offsets.append(at)
        at += len(s)
    # patch StripOffsets (in ext when n_strips>1, else inline)
    off_packed = struct.pack(f"<{n_strips}I", *offsets)
    ifd = bytearray(struct.pack("<H", len(entries)))
    ext = bytearray(ext)
    for tag, typ, count, val4 in placed:
        if tag == _T_STRIP_OFF:
            if n_strips * 4 > 4:
                (pos,) = struct.unpack("<I", val4)
                ext[pos - ext_base : pos - ext_base + len(off_packed)] = off_packed
            else:
                val4 = off_packed.ljust(4, b"\x00")
        ifd += struct.pack("<HHI", tag, typ, count) + val4
    ifd += struct.pack("<I", 0)  # no next IFD
    return header + bytes(ifd) + bytes(ext) + b"".join(strips)
