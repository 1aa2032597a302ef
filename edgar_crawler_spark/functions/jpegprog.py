"""Progressive JPEG (ITU-T81 SOF2, Annex G) — numpy + stdlib only.

Companion to functions/jpegcodec.py (baseline): progressive streams are
the other JPEG flavor a real web crawl sees constantly, so the decode
path cannot stay a stub.  Both spectral selection and successive
approximation are implemented, for encode AND decode:

* **Decoder** (``decode_progressive``): any scan script — interleaved
  or single-component DC scans, per-component AC band scans with EOBn
  run coding, DC/AC successive-approximation refinement scans
  (correction-bit protocol), DHT tables redefined between scans,
  restart markers, sampling factors up to 2x2.
* **Encoder** (``encode_jpeg_progressive``): emits a standard script —
  DC first (Al=1) → per-component AC 1..63 first (Al=1) → per-component
  AC refinement (Ah=1,Al=0) → DC refinement — with the Annex-K tables.
  It exists chiefly as the test oracle: it re-encodes the SAME
  quantized coefficients the baseline encoder produces, so a correct
  decoder must reproduce the baseline decode BIT-FOR-BIT.

The refinement-scan control flow (EOB runs spanning blocks with
buffered correction bits) follows the Annex-G.1.2/G.2 procedures; the
same protocol is implemented by every interoperable codec.
"""

from __future__ import annotations

import struct

import numpy as np

from edgar_crawler_spark.functions.jpegcodec import (
    _AC_CHROM_BITS,
    _AC_CHROM_VALS,
    _AC_LUM_BITS,
    _AC_LUM_VALS,
    _DC_CHROM_BITS,
    _DC_CHROM_VALS,
    _DC_LUM_BITS,
    _DC_LUM_VALS,
    _QT_CHROM,
    _QT_LUM,
    _ZZ,
    _T,
    _bit_windows,
    _canonical_codes,
    _decode_lut,
    _dht_segment,
    _dqt_segment,
    _pack_bits,
    _plane_blocks,
    _quality_scale,
    _quantize,
    _rgb_to_ycbcr,
    _ycbcr_to_rgb,
)

_MAX_EOBRUN = 0x7FFF


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _build_huffman_table(freq: dict[int, int]) -> tuple[list[int], list[int]]:
    """Optimal length-limited canonical Huffman spec (BITS, HUFFVAL)
    from symbol frequencies — the Annex-K.2 two-pass procedure.  A
    pseudo-symbol reserves the all-ones codeword as the spec requires."""
    if not freq:
        freq = {0: 1}
    f = np.zeros(257, np.int64)
    for s, c in freq.items():
        f[s] = c
    f[256] = 1  # reserve the all-1s code
    codesize = [0] * 257
    others = [-1] * 257
    # K.2's linear min-pair scan, vectorized with EXACT tie semantics
    # (v1 = last argmin, v2 = last argmin of the rest — fuzz-verified
    # against the literal scan; the 257-wide Python loop per merge was
    # ~30% of progressive encode)
    while True:
        nz = np.flatnonzero(f)
        if nz.size < 2:
            break
        vals = f[nz]
        m1 = vals.min()
        v1 = int(nz[np.nonzero(vals == m1)[0][-1]])
        keep = f[v1]
        f[v1] = 0
        nz2 = np.flatnonzero(f)
        vals2 = f[nz2]
        v2 = int(nz2[np.nonzero(vals2 == vals2.min())[0][-1]])
        f[v1] = keep
        f[v1] += f[v2]
        f[v2] = 0
        codesize[v1] += 1
        while others[v1] >= 0:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] >= 0:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    for ln in range(32, 16, -1):  # length-limit to 16
        while bits[ln] > 0:
            j = ln - 2
            while bits[j] == 0:
                j -= 1
            bits[ln] -= 2
            bits[ln - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    ln = 16
    while bits[ln] == 0:
        ln -= 1
    bits[ln] -= 1  # drop the pseudo-symbol's code
    huffval = [
        s
        for size in range(1, 17)
        for s in sorted(k for k in range(256) if codesize[k] == size)
    ]
    # re-derive sizes consistent with the ADJUSTED bits (lengths may have
    # shifted): canonical assignment just walks bits over the sorted-by-
    # (origsize, symbol) value list, which is exactly huffval's order.
    return bits[1:17], huffval


class _ScanEmitter:
    """Accumulates (value, nbits) pairs for one scan's entropy data,
    with the cross-block EOB-run + buffered-correction-bit protocol.
    ``counting=True`` records symbol frequencies instead of emitting —
    the first pass of the two-pass per-scan Huffman optimization."""

    def __init__(self, counting: bool = False) -> None:
        self.counting = counting
        self.vals: list[int] = []
        self.nbits: list[int] = []
        self.eobrun = 0
        # Two separate pending-bit buffers, as the protocol requires
        # (libjpeg's BE/BR split): ``runcorr`` holds bits attached to the
        # pending EOB run (emitted right after the EOB symbol), ``corr``
        # holds the CURRENT block's bits (emitted after the next ZRL or
        # newly-nonzero symbol within the block).  Conflating them puts a
        # later block's leading correction bits inside the previous run's
        # flush — the decoder then reads them one symbol too early.
        self.corr: list[int] = []
        self.runcorr: list[int] = []

    def emit(self, v: int, n: int) -> None:
        if n and not self.counting:
            self.vals.append(v)
            self.nbits.append(n)

    def record_tokens(self):
        """Counting mode + emission recording: the scan functions run
        ONCE; the token list replays against the Huffman code built
        from the counted frequencies (:func:`_replay_bytes`). The
        second full pass over every block/coefficient was ~40% of
        progressive-encode wall."""
        self.counting = True
        self.tokens: list[tuple] = []  # (id(freq), sym, -1) | (None, v, n)
        self.emit = self._emit_rec  # type: ignore[method-assign]
        self.emit_symbol = self._emit_symbol_rec  # type: ignore[method-assign]
        return self

    def _emit_rec(self, v: int, n: int) -> None:
        if n:
            self.tokens.append((None, v, n))

    def _emit_symbol_rec(self, code, sym: int) -> None:
        code[sym] = code.get(sym, 0) + 1
        self.tokens.append((id(code), sym, -1))

    def emit_symbol(self, code, sym: int) -> None:
        """``code``: {sym: (codeword, len)} in emit mode, a frequency
        dict to increment in counting mode."""
        if self.counting:
            code[sym] = code.get(sym, 0) + 1
            return
        c, ln = code[sym]
        self.emit(c, ln)

    def flush_corr(self) -> None:
        for b in self.corr:
            self.emit(b, 1)
        self.corr = []

    def end_block(self) -> None:
        """Fold the current block's pending bits into the EOB run."""
        self.eobrun += 1
        self.runcorr.extend(self.corr)
        self.corr = []

    def flush_eobrun(self, ac_code) -> None:
        if self.eobrun > 0:
            n = self.eobrun.bit_length() - 1
            self.emit_symbol(ac_code, n << 4)
            if n:
                self.emit(self.eobrun - (1 << n), n)
            self.eobrun = 0
            for b in self.runcorr:
                self.emit(b, 1)
            self.runcorr = []

    def bytes(self) -> bytes:
        return _pack_bits(self.vals, self.nbits)


def _extend_bits(v: int) -> tuple[int, int]:
    """value -> (raw, nbits) in the baseline magnitude encoding."""
    s = abs(v).bit_length()
    return (v if v > 0 else v + (1 << s) - 1, s)


def _encode_dc_first(blocks_seq, comp_ids, dc_codes, al: int, em: _ScanEmitter) -> None:
    """blocks_seq: iterable of (ci, zz_block) in scan order."""
    preds = {ci: 0 for ci in comp_ids}
    for ci, zz in blocks_seq:
        v = int(zz[0]) >> al
        d = v - preds[ci]
        preds[ci] = v
        raw, s = _extend_bits(d) if d else (0, 0)
        em.emit_symbol(dc_codes[ci], s)
        em.emit(raw, s)


def _encode_dc_refine(blocks_seq, al: int, em: _ScanEmitter) -> None:
    for _ci, zz in blocks_seq:
        em.emit((int(zz[0]) >> al) & 1, 1)


def _encode_ac_first(blocks, ac_code, ss: int, se: int, al: int, em: _ScanEmitter) -> None:
    for zz in blocks:
        r = 0
        for k in range(ss, se + 1):
            c = int(zz[k])
            v = (abs(c) >> al) * (1 if c >= 0 else -1)
            if v == 0:
                r += 1
                continue
            em.flush_eobrun(ac_code)
            while r > 15:
                em.emit_symbol(ac_code, 0xF0)
                r -= 16
            raw, s = _extend_bits(v)
            em.emit_symbol(ac_code, (r << 4) | s)
            em.emit(raw, s)
            r = 0
        if r > 0:
            em.eobrun += 1
            if em.eobrun == _MAX_EOBRUN:
                em.flush_eobrun(ac_code)
    em.flush_eobrun(ac_code)


def _encode_ac_refine(blocks, ac_code, ss: int, se: int, al: int, em: _ScanEmitter) -> None:
    """Annex G.1.2.3 successive-approximation AC refinement."""
    for zz in blocks:
        absv = [0] * 64
        eob = ss - 1  # last k whose refined magnitude is exactly 1
        for k in range(ss, se + 1):
            t = abs(int(zz[k])) >> al
            absv[k] = t
            if t == 1:
                eob = k
        r = 0
        for k in range(ss, se + 1):
            t = absv[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                em.flush_eobrun(ac_code)
                em.emit_symbol(ac_code, 0xF0)
                r -= 16
                em.flush_corr()
            if t > 1:
                # already-nonzero coefficient: buffered correction bit
                em.corr.append(t & 1)
                continue
            em.flush_eobrun(ac_code)
            em.emit_symbol(ac_code, (r << 4) | 1)
            r = 0
            em.emit(1 if int(zz[k]) >= 0 else 0, 1)  # sign of the new coef
            em.flush_corr()
        if r > 0 or em.corr:
            em.end_block()
            if em.eobrun == _MAX_EOBRUN:
                em.flush_eobrun(ac_code)
    em.flush_eobrun(ac_code)


def _sos_header(comps: list[tuple[int, int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
    body = bytes([len(comps)])
    for cid, td, ta in comps:
        body += bytes([cid, (td << 4) | ta])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def _chunked(seq: list, size: int) -> list[list]:
    if size <= 0:
        return [seq]
    return [seq[i : i + size] for i in range(0, len(seq), size)]


def _rst(i: int) -> bytes:
    return bytes([0xFF, 0xD0 + (i % 8)])


def encode_jpeg_progressive(
    px: np.ndarray,
    quality: int = 98,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) RGB or (h, w) grayscale uint8 -> progressive (SOF2)
    JFIF bytes.  Same quantized coefficients as the baseline encoder at
    the same quality — a correct progressive decode therefore matches
    the baseline decode exactly.  ``restart_interval``: MCUs per restart
    segment in every scan (0 = no RSTn); predictors/EOB runs reset at
    each boundary, as the decoder requires."""
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

    qtbls = [qlum] + [qchrom] * (len(planes) - 1)
    # per component: zigzag blocks as a raster grid over the padded MCU area
    grids = []  # (bh_pad, bw_pad, 64) int arrays
    nonint = []  # (bh_n, bw_n) non-interleaved dims
    for plane, (sh, sv), qtbl in zip(planes, samp, qtbls):
        zz = _quantize(_plane_blocks(plane, mcus_x, mcus_y, sh, sv), qtbl)
        grid = (
            zz.reshape(mcus_y, mcus_x, sv, sh, 64)
            .transpose(0, 2, 1, 3, 4)
            .reshape(mcus_y * sv, mcus_x * sh, 64)
        )
        grids.append(grid)
        cw = -(-w * sh // hmax)
        ch = -(-h * sv // vmax)
        nonint.append((-(-ch // 8), -(-cw // 8)))

    ncomp = len(planes)

    def dc_order():
        """Scan order for the DC scans: interleaved MCU order when
        ncomp > 1, the component's non-interleaved grid otherwise."""
        if ncomp > 1:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for ci, (sh, sv) in enumerate(samp):
                        for by in range(sv):
                            for bx in range(sh):
                                yield ci, grids[ci][my * sv + by, mx * sh + bx]
        else:
            bh, bw = nonint[0]
            for by in range(bh):
                for bx in range(bw):
                    yield 0, grids[0][by, bx]

    def ac_blocks(ci):
        bh, bw = nonint[ci]
        for by in range(bh):
            for bx in range(bw):
                yield grids[ci][by, bx]

    # ---- headers -------------------------------------------------------
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out = [b"\xff\xd8", app0, _dqt_segment(0, qlum[_ZZ])]
    if ncomp > 1:
        out.append(_dqt_segment(1, qchrom[_ZZ]))
    sof_comps = b"".join(
        bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
        for ci, (sh, sv) in enumerate(samp)
    )
    out.append(b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp) + sof_comps)

    # ---- scan script (two-pass per scan: count -> optimal DHT -> emit;
    # EOBn symbols don't exist in the Annex-K baseline tables, so every
    # interoperable progressive encoder ships per-scan tables).  With a
    # restart interval, every scan is emitted per-segment with fresh
    # emitter state (predictors, EOB run, pending bits all reset) and
    # segments joined by cycling RSTn — the counting pass uses the SAME
    # segmentation so segment-boundary EOB flushes count identically. --
    all_ids = [(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(ncomp)]
    ri = restart_interval
    per_mcu_dc = sum(sh * sv for sh, sv in samp) if ncomp > 1 else 1
    if ri:
        out.append(b"\xff\xdd" + struct.pack(">HH", 4, ri))

    def scan_record(chunks, run) -> list[list[tuple]]:
        recs = []
        for chunk in chunks:
            em = _ScanEmitter().record_tokens()
            run(chunk, em)
            recs.append(em.tokens)
        return recs

    def replay_bytes(recs, code_map) -> bytes:
        parts = []
        for i, tokens in enumerate(recs):
            vals: list[int] = []
            nbits: list[int] = []
            for fid, a, b in tokens:
                if b == -1:
                    c, ln = code_map[fid][a]
                    vals.append(c)
                    nbits.append(ln)
                else:
                    vals.append(a)
                    nbits.append(b)
            if i:
                parts.append(_rst(i - 1))
            parts.append(_pack_bits(vals, nbits))
        return b"".join(parts)

    def scan_bytes(chunks, run) -> bytes:
        parts = []
        for i, chunk in enumerate(chunks):
            em = _ScanEmitter()
            run(chunk, em)
            if i:
                parts.append(_rst(i - 1))
            parts.append(em.bytes())
        return b"".join(parts)

    dc_chunks = _chunked(list(dc_order()), ri * per_mcu_dc)

    # 1. DC first, Al=1, all components (tables: 0 for luma, 1 for chroma)
    freqs = {0: {}, 1: {}}
    cnt = {ci: freqs[0 if ci == 0 else 1] for ci in range(ncomp)}
    recs = scan_record(dc_chunks, lambda c, em: _encode_dc_first(c, range(ncomp), cnt, 1, em))
    dc_tbls = {0: _build_huffman_table(freqs[0])}
    out.append(_dht_segment(0, 0, *dc_tbls[0]))
    if ncomp > 1:
        dc_tbls[1] = _build_huffman_table(freqs[1])
        out.append(_dht_segment(0, 1, *dc_tbls[1]))
    tbl_codes = {t: _canonical_codes(*v) for t, v in dc_tbls.items()}
    out.append(_sos_header(all_ids, 0, 0, 0, 1))
    out.append(
        replay_bytes(recs, {id(f): tbl_codes[t] for t, f in freqs.items() if t in tbl_codes})
    )

    def ac_scan(ci: int, encode_fn, ss: int, se: int, ah: int, al: int) -> None:
        ta = 0 if ci == 0 else 1
        chunks = _chunked(list(ac_blocks(ci)), ri)
        freq: dict[int, int] = {}
        recs = scan_record(chunks, lambda c, em: encode_fn(c, freq, ss, se, al, em))
        bits, vals = _build_huffman_table(freq)
        out.append(_dht_segment(1, ta, bits, vals))
        out.append(_sos_header([(ci + 1, 0, ta)], ss, se, ah, al))
        out.append(replay_bytes(recs, {id(freq): _canonical_codes(bits, vals)}))

    # 2. AC first per component, band 1..63, Al=1
    for ci in range(ncomp):
        ac_scan(ci, _encode_ac_first, 1, 63, 0, 1)
    # 3. AC refinement per component, Ah=1 -> Al=0
    for ci in range(ncomp):
        ac_scan(ci, _encode_ac_refine, 1, 63, 1, 0)
    # 4. DC refinement, Ah=1 -> Al=0 (raw bits, no Huffman table)
    out.append(_sos_header(all_ids, 0, 0, 1, 0))
    out.append(scan_bytes(dc_chunks, lambda c, em: _encode_dc_refine(c, 0, em)))

    out.append(b"\xff\xd9")
    return b"".join(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _BitReader:
    def __init__(self, seg: bytes) -> None:
        self.windows = _bit_windows(seg)
        self.nbits = len(self.windows) - 1
        self.p = 0

    def huff(self, lut) -> int:
        sym, ln, sh = lut
        i16 = self.windows[self.p] >> sh
        n = ln[i16]
        if n == 0:
            raise ValueError("invalid Huffman code")
        self.p += n
        if self.p > self.nbits:
            raise ValueError("entropy data truncated")
        return sym[i16]

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        v = self.windows[self.p] >> (16 - n)
        self.p += n
        if self.p > self.nbits:
            raise ValueError("entropy data truncated")
        return v


def _extend(raw: int, s: int) -> int:
    return raw - (1 << s) + 1 if raw < (1 << (s - 1)) else raw


def _entropy_segments(data: bytes, epos: int) -> tuple[list[bytes], int]:
    """Entropy data from epos to the next non-RST marker: list of
    destuffed segments (split at RSTn) + position of the next marker."""
    n = len(data)
    segments = []
    seg_start = epos
    p = epos
    while True:
        ff = data.find(b"\xff", p)
        if ff < 0 or ff + 1 >= n:
            segments.append(data[seg_start:n])
            p = n
            break
        nxt = data[ff + 1]
        if nxt == 0x00:
            p = ff + 2
            continue
        if 0xD0 <= nxt <= 0xD7:
            segments.append(data[seg_start:ff])
            seg_start = ff + 2
            p = ff + 2
            continue
        segments.append(data[seg_start:ff])
        p = ff
        break
    return [s.replace(b"\xff\x00", b"\xff") for s in segments], p


def _scan_dc(br, order, comps, preds, ah: int, al: int) -> None:
    if ah == 0:
        for ci, blk in order:
            s = br.huff(comps[ci]["dc_lut"])
            diff = _extend(br.receive(s), s) if s else 0
            preds[ci] += diff
            blk[0] = preds[ci] << al
    else:
        for _ci, blk in order:
            blk[0] |= br.receive(1) << al


def _scan_ac_first(br, blocks, ac_lut, ss, se, al, state) -> None:
    for blk in blocks:
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            continue
        k = ss
        while k <= se:
            sym = br.huff(ac_lut)
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r != 15:
                    state["eobrun"] = (1 << r) + br.receive(r) - 1
                    break
                k += 16
                continue
            k += r
            if k > se:
                raise ValueError("AC run past end of band")
            blk[k] = _extend(br.receive(s), s) << al
            k += 1


def _scan_ac_refine(br, blocks, ac_lut, ss, se, al, state) -> None:
    p1, m1 = 1 << al, -1 << al
    for blk in blocks:
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                sym = br.huff(ac_lut)
                r, s = sym >> 4, sym & 0x0F
                newval = 0
                if s:
                    if s != 1:
                        raise ValueError("invalid refinement magnitude")
                    newval = p1 if br.receive(1) else m1
                elif r != 15:
                    state["eobrun"] = (1 << r) + br.receive(r)
                    break
                # advance over r zero-history coefficients, applying
                # correction bits to nonzero-history ones on the way
                while k <= se:
                    if blk[k] != 0:
                        if br.receive(1) and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s and k <= se:
                    blk[k] = newval
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if blk[k] != 0:
                    if br.receive(1) and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                k += 1
            state["eobrun"] -= 1


def decode_progressive(data: bytes, dc_only: bool = False) -> np.ndarray:
    """Progressive (SOF2) JPEG bytes -> (h, w, 3) uint8 RGB.

    ``dc_only=True`` returns the exact 1/8-scale DC thumbnail
    (ceil(h/8), ceil(w/8), 3).  Progressive streams carry DC in
    dedicated spectral-selection scans (Ss=0), so the AC scans' entropy
    data is SKIPPED outright — only a byte-level marker scan advances
    past them, no Huffman decode — which is the whole point of keeping
    progressive streams in a training corpus: a dedup/thumbnail pass
    reads a fraction of the entropy bits."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple[list[int], list[int]]] = {}
    frame = None
    restart_interval = 0
    grids: list[np.ndarray] = []
    nonint: list[tuple[int, int]] = []
    mcus_x = mcus_y = 0
    hmax = vmax = 1
    saw_scan = False

    pos = 2
    n = len(data)
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > n:
            raise ValueError("truncated segment")
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
                qtables[tq] = tbl  # zigzag order (see jpegcodec)
                bp += 1 + count
        elif marker == 0xC4:  # DHT (may be redefined between scans)
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
        elif marker == 0xC2:  # SOF2
            prec, fh, fw, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision unsupported")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
                raise ValueError("unsupported sampling factors")
            if fh == 0 or fw == 0:
                raise ValueError("empty frame")
            mcus_x = -(-fw // (8 * hmax))
            mcus_y = -(-fh // (8 * vmax))
            for c in comps:
                grids.append(
                    np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int64)
                )
                cw = -(-fw * c["h"] // hmax)
                ch = -(-fh * c["v"] // vmax)
                nonint.append((-(-ch // 8), -(-cw // 8)))
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — process one scan
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            sel = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            segments, nxt = _entropy_segments(data, pos + 2 + seglen)
            if not (dc_only and ss != 0):
                _apply_scan(
                    frame, grids, nonint, htables, sel, ss, se, ah, al,
                    segments, restart_interval, mcus_x, mcus_y,
                )
                saw_scan = True
            pos = nxt
            continue
        pos += 2 + seglen

    if frame is None or not saw_scan:
        raise ValueError("missing SOF2/SOS")
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]

    if dc_only:
        planes = []
        for ci, comp in enumerate(comps):
            if comp["tq"] not in qtables:
                raise ValueError("missing quantization table")
            q0 = float(qtables[comp["tq"]][0])
            grid = grids[ci][:, :, 0].astype(np.float64) * q0 / 8.0 + 128.0
            bh, bw = nonint[ci]
            grid = grid[:bh, :bw]
            sh, sv = comp["h"], comp["v"]
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
        if comp["tq"] not in qtables:
            raise ValueError("missing quantization table")
        qtbl = qtables[comp["tq"]].astype(np.float64)
        grid = grids[ci]
        bh, bw = grid.shape[:2]
        arr = grid.reshape(-1, 64).astype(np.float64) * qtbl[np.newaxis, :]
        dez = np.empty_like(arr)
        dez[:, _ZZ] = arr
        blocks = np.einsum("ji,njk,kl->nil", _T, dez.reshape(-1, 8, 8), _T) + 128.0
        plane = (
            blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        sh, sv = comp["h"], comp["v"]
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


def _apply_scan(
    frame, grids, nonint, htables, sel, ss, se, ah, al,
    segments, restart_interval, mcus_x, mcus_y,
) -> None:
    comps_by_id = {c["id"]: (ci, c) for ci, c in enumerate(frame["comps"])}
    scan_comps = []
    for cid, tdta in sel:
        if cid not in comps_by_id:
            raise ValueError(f"scan references unknown component {cid}")
        ci, c = comps_by_id[cid]
        td, ta = tdta >> 4, tdta & 0x0F
        entry = {**c, "ci": ci}
        if ss == 0 and ah == 0:  # DC first needs a DC table
            if (0, td) not in htables:
                raise ValueError("scan references missing DC Huffman table")
            entry["dc_lut"] = _decode_lut(*htables[(0, td)])
        if ss > 0 and (1, ta) in htables:
            entry["ac_lut"] = _decode_lut(*htables[(1, ta)])
        elif ss > 0:
            raise ValueError("scan references missing AC Huffman table")
        scan_comps.append(entry)

    if ss == 0:  # DC scan (se must be 0)
        if se != 0:
            raise ValueError("DC scan with nonzero Se")

        def order():
            if len(scan_comps) > 1:
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        for si, sc in enumerate(scan_comps):
                            g = grids[sc["ci"]]
                            for by in range(sc["v"]):
                                for bx in range(sc["h"]):
                                    yield si, g[my * sc["v"] + by, mx * sc["h"] + bx]
            else:
                sc = scan_comps[0]
                bh, bw = nonint[sc["ci"]]
                g = grids[sc["ci"]]
                for by in range(bh):
                    for bx in range(bw):
                        yield 0, g[by, bx]

        if len(scan_comps) > 1:
            per_mcu = sum(sc["h"] * sc["v"] for sc in scan_comps)
            total_units = mcus_x * mcus_y
        else:
            bh, bw = nonint[scan_comps[0]["ci"]]
            per_mcu = 1
            total_units = bh * bw
        it = order()
        per_seg = restart_interval if restart_interval else total_units
        done = 0
        for seg in segments:
            if done >= total_units:
                break
            take = min(per_seg, total_units - done)
            br = _BitReader(seg)
            preds = [0] * len(scan_comps)
            chunk = (x for _u in range(take) for x in [next(it) for _b in range(per_mcu)])
            _scan_dc(br, chunk, scan_comps, preds, ah, al)
            done += take
        if done < total_units:
            raise ValueError("progressive DC scan truncated")
    else:  # AC scan: exactly one component, non-interleaved
        if len(scan_comps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        sc = scan_comps[0]
        bh, bw = nonint[sc["ci"]]
        g = grids[sc["ci"]]
        total_units = bh * bw

        def blocks():
            for by in range(bh):
                for bx in range(bw):
                    yield g[by, bx]

        it = blocks()
        per_seg = restart_interval if restart_interval else total_units
        done = 0
        for seg in segments:
            if done >= total_units:
                break
            take = min(per_seg, total_units - done)
            br = _BitReader(seg)
            state = {"eobrun": 0}
            chunk = (next(it) for _ in range(take))
            if ah == 0:
                _scan_ac_first(br, chunk, sc["ac_lut"], ss, se, al, state)
            else:
                _scan_ac_refine(br, chunk, sc["ac_lut"], ss, se, al, state)
            done += take
        if done < total_units:
            raise ValueError("progressive AC scan truncated")
