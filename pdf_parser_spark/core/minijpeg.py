"""Vendored pure-Python baseline JPEG codec — the last codec seam.

The reference has no image pipeline at all (its media handling stops
at PDF text); this module exists so the multimodal tier's image path
(operators/multimodal._decode_image) has a REAL in-container body for
JPEG bytes, like minipng does for PNG — PIL takes over transparently
where installed.

  decode_jpeg(data) -> (width, height, grayscale bytes)
      baseline sequential DCT (SOF0), 8-bit, 1- or 3-component
      (grayscale / YCbCr with any integer sampling factors incl.
      4:4:4 / 4:2:2 / 4:2:0), restart markers, table-driven Huffman
      (reads DQT/DHT from the stream). 3-component images collapse
      YCbCr -> RGB (BT.601, clamped) -> L with PIL's fixed-point luma
      (the minipng formula).

  encode_jpeg_gray(width, height, pixels, quant=4) -> bytes
      minimal valid grayscale baseline JPEG: flat quant table,
      fixed-length canonical Huffman tables written as DHT (any
      spec-compliant decoder, incl. this one and PIL, reads them),
      edge-replication padding to 8x8 blocks. quant=1..255; small
      values are near-lossless (round-trip max error ~1-2 from the
      float DCT).

Scope and parity: unlike minipng (bit-exact vs PIL), JPEG decode is
NOT claimed bit-identical to libjpeg — the float IDCT can differ by
+/-1 per pixel from libjpeg's fixed-point fast IDCT. That is inherent
to the format (the JPEG spec allows IDCT variance) and documented
here rather than papered over. Out of scope (ValueError with a
reason): progressive (SOF2), arithmetic coding, 12-bit, hierarchical.
"""

from __future__ import annotations

import math
import struct

# zig-zag scan order: zigzag index -> (row-major) block index
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# separable 8-point DCT basis: _COS[u][x] = C(u) * cos((2x+1)u*pi/16)
_COS = [
    [
        (math.sqrt(0.125) if u == 0 else 0.5) * math.cos((2 * x + 1) * u * math.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
]


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(d):
                # past the scan: feed 1-bits (spec padding) so a final
                # partially-padded code still decodes
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller consumes via sync_restart
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.bits = (self.bits << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Consume an expected RSTn marker and byte-align. The marker
        may not have been scanned yet (the bit buffer can satisfy all
        reads up to the boundary without _fill ever reaching it), so
        look at the head of the unread stream too — dropping only the
        buffered pad bits, never real data (by construction _fill
        stops AT any marker, so the buffer holds pre-marker bytes
        only)."""
        self.bits = 0
        self.nbits = 0
        if self.marker is None:
            d = self.data
            if (
                self.pos + 1 < len(d)
                and d[self.pos] == 0xFF
                and 0xD0 <= d[self.pos + 1] <= 0xD7
            ):
                self.marker = d[self.pos + 1]
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2  # we stopped AT the 0xFF
            self.marker = None


class _Huff:
    def __init__(self, counts: list[int], symbols: bytes):
        # canonical codes: (length, code) -> symbol
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lut[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("minijpeg: invalid Huffman code in scan")


def _extend(v: int, n: int) -> int:
    """JPEG EXTEND: map n received bits to a signed coefficient."""
    return v if n == 0 or v >= (1 << (n - 1)) else v - (1 << n) + 1


def _idct_block(coef: list[int], out: list[float]) -> None:
    # rows then columns, separable
    tmp = [0.0] * 64
    for r in range(8):
        base = r * 8
        row = coef[base : base + 8]
        for x in range(8):
            s = 0.0
            for u in range(8):
                c = row[u]
                if c:
                    s += c * _COS[u][x]
            tmp[base + x] = s
    for c in range(8):
        col = tmp[c::8]
        for y in range(8):
            s = 0.0
            for v in range(8):
                t = col[v]
                if t:
                    s += t * _COS[v][y]
            out[y * 8 + c] = s


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    if data[:2] != b"\xff\xd8":
        raise ValueError("minijpeg: not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, list[int]] = {}
    dc_tabs: dict[int, _Huff] = {}
    ac_tabs: dict[int, _Huff] = {}
    restart_interval = 0
    frame = None  # (w, h, comps) with comps = [(cid, h, v, tq)]
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq != 0:
                    raise ValueError("minijpeg: 16-bit quant tables unsupported")
                qt[tq] = list(seg[i : i + 64])
                i += 64
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                syms = seg[i + 17 : i + 17 + n]
                (dc_tabs if tc == 0 else ac_tabs)[th] = _Huff(counts, syms)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8:
                raise ValueError("minijpeg: only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"minijpeg: only baseline sequential (SOF0) supported, got SOF marker 0x{marker:02X}"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("minijpeg: SOS before SOF0")
            ns = seg[0]
            if ns != len(frame[2]):
                # a partial scan means a non-interleaved multi-scan
                # file; decoding only the first scan would return
                # silently corrupt pixels (zero chroma, MCU-grouped Y)
                raise ValueError(
                    f"minijpeg: non-interleaved multi-scan baseline unsupported "
                    f"(scan has {ns} of {len(frame[2])} components)"
                )
            scan = []  # (comp_index, dc_tab, ac_tab)
            for s in range(ns):
                cs, tabs = seg[1 + 2 * s], seg[2 + 2 * s]
                ci = next(i for i, c in enumerate(frame[2]) if c[0] == cs)
                scan.append((ci, tabs >> 4, tabs & 0x0F))
            return _decode_scan(
                data, pos + seglen, frame, scan, qt, dc_tabs, ac_tabs, restart_interval
            )
        pos += seglen
    raise ValueError("minijpeg: no scan data (missing SOS)")


def _decode_scan(data, pos, frame, scan, qt, dc_tabs, ac_tabs, restart_interval):
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    # per-component planes at the component's own resolution
    planes = []
    for _, ch, cv, _ in comps:
        pw, ph = mcus_x * ch * 8, mcus_y * cv * 8
        planes.append(([0] * (pw * ph), pw))

    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    coef = [0] * 64
    pix = [0.0] * 64
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, dtab, atab in scan:
                _, ch, cv, tq = comps[ci]
                q = qt[tq]
                dct = dc_tabs[dtab]
                act = ac_tabs[atab]
                plane, pw = planes[ci]
                for by in range(cv):
                    for bx in range(ch):
                        for i in range(64):
                            coef[i] = 0
                        t = dct.decode(br)
                        diff = _extend(br.receive(t), t)
                        pred[ci] += diff
                        coef[0] = pred[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = act.decode(br)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("minijpeg: AC run past block end")
                            coef[_ZIGZAG[k]] = _extend(br.receive(s), s) * q[k]
                            k += 1
                        _idct_block(coef, pix)
                        ox = (mx * ch + bx) * 8
                        oy = (my * cv + by) * 8
                        for yy in range(8):
                            row = (oy + yy) * pw + ox
                            for xx in range(8):
                                v = int(round(pix[yy * 8 + xx])) + 128
                                plane[row + xx] = 0 if v < 0 else (255 if v > 255 else v)

    if len(comps) == 1:
        plane, pw = planes[0]
        out = bytearray(w * h)
        for y in range(h):
            out[y * w : (y + 1) * w] = bytes(plane[y * pw : y * pw + w])
        return w, h, bytes(out)
    if len(comps) != 3:
        raise ValueError(f"minijpeg: {len(comps)}-component images unsupported")
    # YCbCr -> RGB (BT.601) -> PIL fixed-point luma, nearest-neighbour
    # chroma upsampling (what libjpeg's default does for DC-replicated
    # subsampled planes)
    out = bytearray(w * h)
    (py, pyw), (pcb, pcbw), (pcr, pcrw) = planes
    hy, vy = comps[0][1], comps[0][2]
    hcb, vcb = comps[1][1], comps[1][2]
    hcr, vcr = comps[2][1], comps[2][2]
    for y in range(h):
        ry = (y * vy) // vmax * pyw
        rcb = (y * vcb) // vmax * pcbw
        rcr = (y * vcr) // vmax * pcrw
        base = y * w
        for x in range(w):
            Y = py[ry + (x * hy) // hmax]
            cb = pcb[rcb + (x * hcb) // hmax] - 128
            cr = pcr[rcr + (x * hcr) // hmax] - 128
            r = Y + 1.402 * cr
            g = Y - 0.344136 * cb - 0.714136 * cr
            b = Y + 1.772 * cb
            ri = 0 if r < 0 else (255 if r > 255 else int(r + 0.5))
            gi = 0 if g < 0 else (255 if g > 255 else int(g + 0.5))
            bi = 0 if b < 0 else (255 if b > 255 else int(b + 0.5))
            out[base + x] = (ri * 19595 + gi * 38470 + bi * 7471 + 0x8000) >> 16
    return w, h, bytes(out)


# ------------------------------------------------------------------ encoder

# fixed-length canonical tables: 12 DC symbols at 4 bits, 162 AC
# symbols at 8 bits — valid (all-ones code unused), compact to emit,
# and readable by ANY spec-compliant decoder since they ship as DHT
_DC_COUNTS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMS = bytes(range(12))
_AC_SYMS = bytes(
    [((r << 4) | s) for r in range(16) for s in range(1, 11)]
    + [0x00, 0xF0]
)
_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMS), 0, 0, 0, 0, 0, 0, 0, 0]


def _canonical_codes(counts: list[int], symbols: bytes) -> dict[int, tuple[int, int]]:
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, length: int, code: int) -> None:
        self.acc = (self.acc << length) | code
        self.nacc += length
        while self.nacc >= 8:
            self.nacc -= 8
            b = (self.acc >> self.nacc) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def align(self) -> None:
        if self.nacc:
            pad = 8 - self.nacc
            self.put(pad, (1 << pad) - 1)  # 1-bit padding per spec

    def raw(self, b: bytes) -> None:
        """Emit marker bytes verbatim (caller must align() first)."""
        self.out += b

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """coefficient -> (category, appended bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    return n, (v if v > 0 else v + (1 << n) - 1)


def _encode_block(
    plane: list[int] | bytes,
    pw: int,
    ph: int,
    ox: int,
    oy: int,
    quant: int,
    pred: int,
    bw: _BitWriter,
    dc_codes,
    ac_codes,
) -> int:
    """FDCT + quantize + Huffman-encode one edge-replicated 8x8 block
    sampled from `plane` at (ox, oy). Returns the new DC predictor."""
    block = [0.0] * 64
    for yy in range(8):
        sy = min(oy + yy, ph - 1)
        for xx in range(8):
            sx = min(ox + xx, pw - 1)
            block[yy * 8 + xx] = plane[sy * pw + sx] - 128.0
    tmp = [0.0] * 64
    for r in range(8):
        for u in range(8):
            s = 0.0
            for x in range(8):
                s += block[r * 8 + x] * _COS[u][x]
            tmp[r * 8 + u] = s
    zz = [0] * 64
    for c in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                s += tmp[y * 8 + c] * _COS[v][y]
            zz[v * 8 + c] = int(round(s / quant))
    diff = zz[0] - pred
    n, bits = _magnitude(diff)
    length, code = dc_codes[n]
    bw.put(length, code)
    if n:
        bw.put(n, bits)
    run = 0
    for k in range(1, 64):
        v = zz[_ZIGZAG[k]]
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]
            bw.put(length, code)
            run -= 16
        n, bits = _magnitude(v)
        if n > 10:
            raise ValueError("minijpeg: coefficient category > 10 (lower quant?)")
        length, code = ac_codes[(run << 4) | n]
        bw.put(length, code)
        bw.put(n, bits)
        run = 0
    if run:
        length, code = ac_codes[0x00]  # EOB
        bw.put(length, code)
    return zz[0]


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _tables(quant: int) -> bytes:
    dqt = _seg(0xDB, bytes([0x00]) + bytes([quant] * 64))
    dht = _seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMS) + _seg(
        0xC4, bytes([0x10]) + bytes(_AC_COUNTS) + _AC_SYMS
    )
    return dqt + dht


def encode_jpeg_gray(
    width: int, height: int, pixels: bytes, quant: int = 4, restart_interval: int = 0
) -> bytes:
    """restart_interval=N emits a DRI segment and an RSTn marker (with
    DC-predictor reset + byte alignment) every N MCUs — the shape
    camera/libjpeg output commonly has."""
    if len(pixels) != width * height:
        raise ValueError("minijpeg: pixels != width*height")
    if not 1 <= quant <= 255:
        raise ValueError("minijpeg: quant must be 1..255")
    if not 0 <= restart_interval <= 0xFFFF:
        raise ValueError("minijpeg: restart_interval must be 0..65535 (DRI is a ushort)")
    dc_codes = _canonical_codes(_DC_COUNTS, _DC_SYMS)
    ac_codes = _canonical_codes(_AC_COUNTS, _AC_SYMS)
    bw = _BitWriter()
    pred = 0
    mcu = 0
    rst = 0
    for by in range((height + 7) // 8):
        for bx in range((width + 7) // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.align()
                bw.raw(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                pred = 0
            mcu += 1
            pred = _encode_block(
                pixels, width, height, bx * 8, by * 8, quant, pred, bw, dc_codes, ac_codes
            )
    sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", height, width) + bytes([1, 1, 0x11, 0]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    dri = _seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return b"\xff\xd8" + _tables(quant) + dri + sof + sos + bw.flush() + b"\xff\xd9"


def encode_jpeg_rgb(
    width: int, height: int, rgb: bytes, quant: int = 4, subsample: bool = True
) -> bytes:
    """3-component YCbCr baseline JPEG; subsample=True emits 4:2:0
    (Y at 2x2, 2x2-averaged chroma — exercises the decoder's MCU
    interleave and chroma upsample), False emits 4:4:4. All components
    share the flat quant table and the fixed Huffman tables."""
    if len(rgb) != width * height * 3:
        raise ValueError("minijpeg: rgb != width*height*3")
    if not 1 <= quant <= 255:
        raise ValueError("minijpeg: quant must be 1..255")
    yp = [0] * (width * height)
    cb = [0.0] * (width * height)
    cr = [0.0] * (width * height)
    for i in range(width * height):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        yv = 0.299 * r + 0.587 * g + 0.114 * b
        yp[i] = min(255, max(0, int(yv + 0.5)))
        cb[i] = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr[i] = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    if subsample:
        cw, chh = (width + 1) // 2, (height + 1) // 2
        cbp = [0] * (cw * chh)
        crp = [0] * (cw * chh)
        for cy in range(chh):
            for cx in range(cw):
                acc_b = acc_r = cnt = 0.0
                for dy in (0, 1):
                    for dx in (0, 1):
                        sy, sx = cy * 2 + dy, cx * 2 + dx
                        if sy < height and sx < width:
                            acc_b += cb[sy * width + sx]
                            acc_r += cr[sy * width + sx]
                            cnt += 1
                cbp[cy * cw + cx] = min(255, max(0, int(acc_b / cnt + 0.5)))
                crp[cy * cw + cx] = min(255, max(0, int(acc_r / cnt + 0.5)))
        hv_y = 0x22
    else:
        cw, chh = width, height
        cbp = [min(255, max(0, int(v + 0.5))) for v in cb]
        crp = [min(255, max(0, int(v + 0.5))) for v in cr]
        hv_y = 0x11

    dc_codes = _canonical_codes(_DC_COUNTS, _DC_SYMS)
    ac_codes = _canonical_codes(_AC_COUNTS, _AC_SYMS)
    bw = _BitWriter()
    preds = [0, 0, 0]
    y_h = 2 if subsample else 1
    mcu_px = 8 * y_h
    for my in range((height + mcu_px - 1) // mcu_px):
        for mx in range((width + mcu_px - 1) // mcu_px):
            for by in range(y_h):
                for bx in range(y_h):
                    preds[0] = _encode_block(
                        yp, width, height,
                        (mx * y_h + bx) * 8, (my * y_h + by) * 8,
                        quant, preds[0], bw, dc_codes, ac_codes,
                    )
            preds[1] = _encode_block(
                cbp, cw, chh, mx * 8, my * 8, quant, preds[1], bw, dc_codes, ac_codes
            )
            preds[2] = _encode_block(
                crp, cw, chh, mx * 8, my * 8, quant, preds[2], bw, dc_codes, ac_codes
            )
    sof = _seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", height, width)
        + bytes([3, 1, hv_y, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + _tables(quant) + sof + sos + bw.flush() + b"\xff\xd9"
