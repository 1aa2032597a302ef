"""Image-container metadata scrub + inject (struct-level, no recode).

Crawled images carry privacy-sensitive metadata — EXIF GPS/device tags
(JPEG APP1), editor comments (JPEG COM, GIF comment extensions), PNG
text/time chunks. A training-data pipeline strips these WITHOUT
re-encoding: the entropy-coded pixel data is byte-identical before and
after, so the scrub is lossless, cheap (pure segment surgery), and
safe at any quality level — unlike a decode/re-encode pass.

``strip_image_metadata`` dispatches on magic bytes and returns the
scrubbed blob plus the labels of removed segments. The ``add_*``
helpers write the same segments (synthetic EXIF, comments, tEXt) so
tests and fixtures can exercise the scrub against realistic streams.

Kept segments per container:
* JPEG — everything structural plus APP0 (JFIF); APP1..APP15 and COM
  are dropped. The scan walks only the header region (SOI → SOS);
  entropy data is copied verbatim.
* PNG — IHDR, PLTE, IDAT, IEND, tRNS, gAMA, sRGB (pixel/rendering
  affecting); tEXt/zTXt/iTXt/tIME/eXIf/pHYs etc. are dropped.
* GIF — comment (0xFE) and plain-text (0x01) extensions are dropped;
  application extensions are dropped EXCEPT NETSCAPE2.0 (loop count is
  playback behavior, not metadata). Frames and control blocks are
  copied verbatim.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_KEEP = {b"IHDR", b"PLTE", b"IDAT", b"IEND", b"tRNS", b"gAMA", b"sRGB"}
_GIF_SIGS = (b"GIF87a", b"GIF89a")
_JPEG_STANDALONE = {0x01, *range(0xD0, 0xD8)}  # TEM, RST0-7 (no length)


# --------------------------------------------------------------------------
# JPEG


def strip_jpeg_metadata(data: bytes) -> tuple[bytes, list[str]]:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    out = bytearray(b"\xff\xd8")
    removed: list[str] = []
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xDA:  # SOS: entropy data follows — copy the rest
            out += data[pos:]
            return bytes(out), removed
        if marker in _JPEG_STANDALONE or marker == 0xD9:
            out += data[pos : pos + 2]
            pos += 2
            continue
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos : pos + 2 + length]
        if 0xE1 <= marker <= 0xEF:
            removed.append(f"APP{marker - 0xE0}")
        elif marker == 0xFE:
            removed.append("COM")
        else:
            out += seg
        pos += 2 + length
    raise ValueError("JPEG: no SOS marker")


def add_jpeg_app1_exif(data: bytes, payload: bytes) -> bytes:
    """Insert a synthetic EXIF APP1 segment right after SOI."""
    body = b"Exif\x00\x00" + payload
    seg = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    return data[:2] + seg + data[2:]


def add_jpeg_comment(data: bytes, text: str) -> bytes:
    body = text.encode()
    seg = b"\xff\xfe" + struct.pack(">H", len(body) + 2) + body
    return data[:2] + seg + data[2:]


# --------------------------------------------------------------------------
# PNG


def strip_png_metadata(data: bytes) -> tuple[bytes, list[str]]:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    out = bytearray(_PNG_SIG)
    removed: list[str] = []
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        chunk = data[pos : pos + 12 + length]
        if tag in _PNG_KEEP:
            out += chunk
        else:
            removed.append(tag.decode("latin-1"))
        if tag == b"IEND":
            break
        pos += 12 + length
    return bytes(out), removed


def add_png_text(data: bytes, key: str, value: str) -> bytes:
    """Insert a tEXt chunk right after IHDR (25 bytes in)."""
    payload = key.encode() + b"\x00" + value.encode()
    chunk = (
        struct.pack(">I", len(payload))
        + b"tEXt"
        + payload
        + struct.pack(">I", zlib.crc32(b"tEXt" + payload) & 0xFFFFFFFF)
    )
    at = 8 + 12 + 13  # signature + IHDR chunk
    return data[:at] + chunk + data[at:]


# --------------------------------------------------------------------------
# GIF


def _gif_header_end(data: bytes) -> int:
    packed = data[10]
    end = 13
    if packed & 0x80:
        end += 3 * (2 << (packed & 0x07))
    return end


def strip_gif_metadata(data: bytes) -> tuple[bytes, list[str]]:
    if data[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF")
    end = _gif_header_end(data)
    out = bytearray(data[:end])
    removed: list[str] = []
    pos = end

    def sub_blocks_end(p: int) -> int:
        while data[p] != 0:
            p += 1 + data[p]
        return p + 1

    while pos < len(data):
        block = data[pos]
        if block == 0x3B:
            out.append(0x3B)
            break
        if block == 0x21:
            label = data[pos + 1]
            p = pos + 2
            if label in (0x01, 0xFF):
                p += 1 + data[p]  # fixed-size header sub-block
            p = sub_blocks_end(p)
            if label == 0xFE:
                removed.append("comment")
            elif label == 0x01:
                removed.append("plaintext")
            elif label == 0xFF:
                app = data[pos + 3 : pos + 3 + 11]
                if app == b"NETSCAPE2.0":  # looping is behavior, keep
                    out += data[pos:p]
                else:
                    removed.append("app:" + app.decode("latin-1", "replace").strip())
            else:
                out += data[pos:p]  # graphic control etc.
            pos = p
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        p = pos + 10
        if data[pos + 9] & 0x80:  # local color table
            p += 3 * (2 << (data[pos + 9] & 0x07))
        p += 1  # LZW min code size
        p = sub_blocks_end(p)
        out += data[pos:p]
        pos = p
    return bytes(out), removed


def add_gif_comment(data: bytes, text: str) -> bytes:
    body = text.encode()
    blocks = bytearray(b"\x21\xfe")
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    at = _gif_header_end(data)
    return data[:at] + bytes(blocks) + data[at:]


# --------------------------------------------------------------------------
# WebP (RIFF chunk surgery; VP8X flag maintenance)

_WEBP_META = {b"EXIF": "EXIF", b"XMP ": "XMP"}
_VP8X_EXIF, _VP8X_XMP = 0x08, 0x04


def _riff_rebuild(chunks: list[tuple[bytes, bytes]]) -> bytes:
    body = bytearray(b"WEBP")
    for fourcc, payload in chunks:
        body += fourcc + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + bytes(body)


def strip_webp_metadata(data: bytes) -> tuple[bytes, list[str]]:
    """Drop EXIF/XMP chunks, clearing their VP8X flag bits; when the
    VP8X header then carries no feature at all and a bare VP8L image
    remains, the VP8X wrapper itself is dropped (back to the canonical
    simple-lossless file). ICCP stays — a color profile is rendering
    behavior, not metadata (same call as PNG's gAMA/sRGB)."""
    from edgar_crawler_spark.functions.webpcodec import walk_webp_chunks

    removed: list[str] = []
    kept: list[tuple[bytes, bytes]] = []
    for fourcc, at, ln in walk_webp_chunks(data):
        if fourcc in _WEBP_META:
            removed.append(_WEBP_META[fourcc])
        else:
            kept.append((fourcc, data[at : at + ln]))
    if not removed:
        return data, []
    if kept and kept[0][0] == b"VP8X":
        flags = bytearray(kept[0][1])
        flags[0] &= ~(_VP8X_EXIF | _VP8X_XMP)
        if flags[0] == 0 and len(kept) == 2 and kept[1][0] == b"VP8L":
            kept = kept[1:]
        else:
            kept[0] = (b"VP8X", bytes(flags))
    return _riff_rebuild(kept), removed


def add_webp_exif(data: bytes, payload: bytes) -> bytes:
    """Wrap a simple lossless WebP in a VP8X container carrying an
    EXIF chunk (flags + canvas dims per the extended-format spec)."""
    from edgar_crawler_spark.functions.webpcodec import walk_webp_chunks

    chunks = [(f, data[at : at + ln]) for f, at, ln in walk_webp_chunks(data)]
    by4 = dict(chunks)
    if b"VP8X" in by4:
        flags = bytearray(by4[b"VP8X"])
        flags[0] |= _VP8X_EXIF
        out = [(b"VP8X", bytes(flags))] + [c for c in chunks if c[0] != b"VP8X"]
    else:
        if b"VP8L" not in by4:
            raise ValueError("add_webp_exif: need a VP8L image chunk")
        v = int.from_bytes(by4[b"VP8L"][1:5], "little")
        w, h = (v & 0x3FFF) + 1, ((v >> 14) & 0x3FFF) + 1
        vp8x = bytes([_VP8X_EXIF, 0, 0, 0]) + struct.pack("<I", w - 1)[:3] + struct.pack(
            "<I", h - 1
        )[:3]
        out = [(b"VP8X", vp8x)] + chunks
    return _riff_rebuild(out + [(b"EXIF", payload)])


def extract_webp_exif(data: bytes) -> dict | None:
    """EXIF chunk of an extended WebP -> parsed tags (None when the
    file carries no EXIF). Accepts both raw-TIFF payloads (the spec)
    and the JPEG-style 'Exif\\0\\0'-prefixed form some writers emit."""
    from edgar_crawler_spark.functions.webpcodec import walk_webp_chunks

    for fourcc, at, ln in walk_webp_chunks(data):
        if fourcc == b"EXIF":
            payload = data[at : at + ln]
            if payload[:6] == b"Exif\x00\x00":
                payload = payload[6:]
            return parse_exif(payload)
    return None


# --------------------------------------------------------------------------
# EXIF (TIFF 6.0 structure inside the JPEG APP1 "Exif\0\0" payload)

_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_GPS_IFD = 0x8825
_GPS_LAT_REF, _GPS_LAT = 0x0001, 0x0002
_GPS_LON_REF, _GPS_LON = 0x0003, 0x0004


def build_exif(
    make: str | None = None,
    model: str | None = None,
    orientation: int | None = None,
    datetime: str | None = None,
    gps: tuple[float, float] | None = None,
) -> bytes:
    """Minimal valid little-endian TIFF payload carrying the common
    identifying tags (wrap with :func:`add_jpeg_app1_exif` to tag a
    JPEG). ``gps`` is (lat, lon) in signed decimal degrees, stored the
    standard way: ref chars + 3 RATIONALs (deg, min, sec)."""

    def _dms(v: float) -> list[tuple[int, int]]:
        v = abs(v)
        d = int(v)
        m = int((v - d) * 60)
        s = round(((v - d) * 60 - m) * 60 * 10_000)
        return [(d, 1), (m, 1), (s, 10_000)]

    def _ifd(entries: list[tuple[int, int, int, bytes]], base: int) -> bytes:
        """entries: (tag, type, count, value_bytes). Values over 4 bytes
        go to a data area after the entry table; ``base`` is this IFD's
        absolute offset in the TIFF."""
        data_at = base + 2 + 12 * len(entries) + 4
        table = struct.pack("<H", len(entries))
        tail = b""
        for tag, typ, count, val in sorted(entries):
            if len(val) <= 4:
                table += struct.pack("<HHI", tag, typ, count) + val.ljust(4, b"\x00")
            else:
                table += struct.pack("<HHII", tag, typ, count, data_at + len(tail))
                tail += val
        return table + struct.pack("<I", 0) + tail

    def _ascii(s: str) -> bytes:
        return s.encode("ascii") + b"\x00"

    def _rats(pairs: list[tuple[int, int]]) -> bytes:
        return b"".join(struct.pack("<II", n, d) for n, d in pairs)

    ifd0: list[tuple[int, int, int, bytes]] = []
    if make is not None:
        ifd0.append((_TAG_MAKE, 2, len(make) + 1, _ascii(make)))
    if model is not None:
        ifd0.append((_TAG_MODEL, 2, len(model) + 1, _ascii(model)))
    if orientation is not None:
        ifd0.append((_TAG_ORIENTATION, 3, 1, struct.pack("<H", orientation)))
    if datetime is not None:
        ifd0.append((_TAG_DATETIME, 2, len(datetime) + 1, _ascii(datetime)))

    gps_entries: list[tuple[int, int, int, bytes]] = []
    if gps is not None:
        lat, lon = gps
        gps_entries = [
            (_GPS_LAT_REF, 2, 2, _ascii("N" if lat >= 0 else "S")),
            (_GPS_LAT, 5, 3, _rats(_dms(lat))),
            (_GPS_LON_REF, 2, 2, _ascii("E" if lon >= 0 else "W")),
            (_GPS_LON, 5, 3, _rats(_dms(lon))),
        ]
        # GPS IFD pointer needs IFD0's final size; entry values <= 4
        # bytes always, so IFD0's size is known once its entry count is
        placeholder = struct.pack("<I", 0)
        ifd0.append((_TAG_GPS_IFD, 4, 1, placeholder))

    header = struct.pack("<2sHI", b"II", 42, 8)
    body = _ifd(ifd0, 8)
    if gps is not None:
        gps_at = 8 + len(body)
        # patch the GPS pointer now that IFD0's extent is known
        body = _ifd(
            [e if e[0] != _TAG_GPS_IFD else (_TAG_GPS_IFD, 4, 1, struct.pack("<I", gps_at))
             for e in ifd0],
            8,
        )
        assert 8 + len(body) == gps_at
        body += _ifd(gps_entries, gps_at)
    return header + body


def parse_exif(payload: bytes) -> dict:
    """TIFF/EXIF payload -> {make, model, orientation, datetime,
    gps_lat, gps_lon} (absent keys = tag not present). Handles both
    byte orders; raises ValueError on a malformed header and bounds-
    checks everything else (truncated IFDs yield partial results, not
    exceptions — crawled EXIF is routinely cut short)."""
    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF payload")
    e = "<" if payload[:2] == b"II" else ">"
    magic, ifd0 = struct.unpack(e + "HI", payload[2:8])
    if magic != 42:
        raise ValueError("bad TIFF magic")
    out: dict = {}

    def _read_entries(at: int) -> list[tuple[int, int, int, bytes]]:
        if at + 2 > len(payload):
            return []
        (n,) = struct.unpack(e + "H", payload[at : at + 2])
        entries = []
        for i in range(n):
            p = at + 2 + 12 * i
            if p + 12 > len(payload):
                break
            tag, typ, count = struct.unpack(e + "HHI", payload[p : p + 8])
            entries.append((tag, typ, count, payload[p + 8 : p + 12]))
        return entries

    sizes = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

    def _value(typ: int, count: int, raw: bytes):
        nbytes = sizes.get(typ, 1) * count
        if nbytes > 4:
            (off,) = struct.unpack(e + "I", raw)
            buf = payload[off : off + nbytes]
            if len(buf) < nbytes:
                return None
        else:
            buf = raw[:nbytes]
        if typ == 2:  # ASCII
            return buf.split(b"\x00")[0].decode("ascii", "replace")
        if typ == 3:
            return struct.unpack(e + f"{count}H", buf)
        if typ == 4:
            return struct.unpack(e + f"{count}I", buf)
        if typ == 5:
            vals = struct.unpack(e + f"{2 * count}I", buf)
            return [(vals[2 * i], vals[2 * i + 1]) for i in range(count)]
        return buf

    gps_at = None
    for tag, typ, count, raw in _read_entries(ifd0):
        v = _value(typ, count, raw)
        if v is None:
            continue
        if tag == _TAG_MAKE:
            out["make"] = v
        elif tag == _TAG_MODEL:
            out["model"] = v
        elif tag == _TAG_ORIENTATION:
            out["orientation"] = int(v[0])
        elif tag == _TAG_DATETIME:
            out["datetime"] = v
        elif tag == _TAG_GPS_IFD:
            gps_at = int(v[0])

    if gps_at is not None:
        gps: dict = {}
        for tag, typ, count, raw in _read_entries(gps_at):
            v = _value(typ, count, raw)
            if v is not None:
                gps[tag] = v

        def _decimal(rats, ref, neg_ref):
            try:
                d = sum(
                    (n / den) / f for (n, den), f in zip(rats, (1, 60, 3600)) if den
                )
            except TypeError:
                return None
            return -d if ref == neg_ref else d

        if _GPS_LAT in gps:
            v = _decimal(gps[_GPS_LAT], gps.get(_GPS_LAT_REF, "N"), "S")
            if v is not None:
                out["gps_lat"] = v
        if _GPS_LON in gps:
            v = _decimal(gps[_GPS_LON], gps.get(_GPS_LON_REF, "E"), "W")
            if v is not None:
                out["gps_lon"] = v
    return out


def extract_jpeg_exif(data: bytes) -> dict | None:
    """Walk the JPEG header region for an APP1 EXIF segment; None when
    the stream carries no EXIF (the common case after a scrub)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xDA:
            return None
        if marker in _JPEG_STANDALONE or marker == 0xD9:
            pos += 2
            continue
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if marker == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
            return parse_exif(data[pos + 10 : pos + 2 + length])
        pos += 2 + length
    return None


# --------------------------------------------------------------------------
# Dispatch


_TIFF_PII_TAGS = {
    0x010F: "Make",
    0x0110: "Model",
    0x0112: "Orientation",  # parity with the JPEG scrub (whole APP1)
    0x0131: "Software",
    0x0132: "DateTime",
    0x013B: "Artist",
    0x8298: "Copyright",
    0x8769: "ExifIFD",
    0x8825: "GPS",
}
_TIFF_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def strip_tiff_metadata(data: bytes) -> tuple[bytes, list[str]]:
    """In-place IFD surgery for TIFF (which IS the EXIF container, so
    unlike JPEG there is no segment to drop): PII entries are removed
    from IFD0 (surviving entries repack, the shrunk table's tail
    zero-pads — dead space is legal TIFF), their out-of-line value
    bytes are zeroed so nothing readable survives in the gap, and
    GPS/EXIF sub-IFD pointers zero the whole pointed block including
    ITS out-of-line values. Strip offsets are absolute and untouched;
    output length equals input length."""
    if len(data) < 8 or data[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ValueError("not a TIFF")
    e = "<" if data[:2] == b"II" else ">"
    buf = bytearray(data)
    (ifd0,) = struct.unpack(e + "I", data[4:8])
    if ifd0 + 2 > len(data):
        return bytes(buf), []

    def _zero(off: int, nbytes: int) -> None:
        lo = max(0, off)
        hi = min(len(buf), off + nbytes)
        if hi > lo:
            buf[lo:hi] = b"\x00" * (hi - lo)

    def _zero_ifd(at: int, depth: int) -> None:
        if depth > 2 or at + 2 > len(buf):
            return
        (n,) = struct.unpack(e + "H", data[at : at + 2])
        for i in range(n):
            p = at + 2 + 12 * i
            if p + 12 > len(buf):
                break
            tag, typ, cnt = struct.unpack(e + "HHI", data[p : p + 8])
            nb = _TIFF_TYPE_SIZES.get(typ, 1) * cnt
            # Nested sub-IFD pointers (Exif/GPS/Interop) are inline
            # LONGs (nb == 4): recurse into the pointed block before
            # this table is zeroed, or its contents survive the scrub.
            if tag in (0x8769, 0x8825, 0xA005) and typ == 4 and cnt == 1:
                (off,) = struct.unpack(e + "I", data[p + 8 : p + 12])
                _zero_ifd(off, depth + 1)
            elif nb > 4:
                (off,) = struct.unpack(e + "I", data[p + 8 : p + 12])
                _zero(off, nb)
        _zero(at, 2 + 12 * n + 4)

    (n,) = struct.unpack(e + "H", data[ifd0 : ifd0 + 2])
    removed: list[str] = []
    keep: list[bytes] = []
    for i in range(n):
        p = ifd0 + 2 + 12 * i
        if p + 12 > len(data):
            break
        tag, typ, cnt = struct.unpack(e + "HHI", data[p : p + 8])
        if tag not in _TIFF_PII_TAGS:
            keep.append(data[p : p + 12])
            continue
        removed.append(_TIFF_PII_TAGS[tag])
        nb = _TIFF_TYPE_SIZES.get(typ, 1) * cnt
        if tag in (0x8769, 0x8825):
            (off,) = struct.unpack(e + "I", data[p + 8 : p + 12])
            _zero_ifd(off, 1)
        elif nb > 4:
            (off,) = struct.unpack(e + "I", data[p + 8 : p + 12])
            _zero(off, nb)
    nxt = data[ifd0 + 2 + 12 * n : ifd0 + 6 + 12 * n]
    new = struct.pack(e + "H", len(keep)) + b"".join(keep) + nxt
    old_size = 2 + 12 * n + 4
    buf[ifd0 : ifd0 + old_size] = new + b"\x00" * (old_size - len(new))
    return bytes(buf), removed


def strip_image_metadata(data: bytes) -> tuple[bytes, list[str]]:
    """Magic-byte dispatch → (scrubbed bytes, removed segment labels).
    Containers with no metadata concept (QNT stand-in, BMP's fixed
    header) pass through unchanged with an empty removed list."""
    if data[:2] == b"\xff\xd8":
        return strip_jpeg_metadata(data)
    if data[:8] == _PNG_SIG:
        return strip_png_metadata(data)
    if data[:6] in _GIF_SIGS:
        return strip_gif_metadata(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return strip_webp_metadata(data)
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return strip_tiff_metadata(data)
    if data[:2] == b"BM" or data[:4] == b"QNT1":
        return data, []
    raise ValueError("unknown image container")
