"""WebP-lossless (VP8L) codec in pure stdlib + numpy — no Pillow/libwebp.

Implements the public WebP Lossless Bitstream Specification (RFC 9649 /
the format shipped by libwebp): the RIFF/VP8L container, the LSB-first
bitstream, simple and code-length-coded canonical Huffman codes, LZ77
backward references with the 120-entry two-dimensional distance mapping,
the color cache, meta-Huffman (per-tile code groups), and all four
transforms — predictor (14 modes), cross-color, subtract-green and
color-indexing with sub-byte pixel bundling.

The encoder emits a spec-conformant subset chosen to exercise every
decoder path in round-trip tests: optional subtract-green → predictor →
cross-color transform chain (the canonical libwebp order), optional
palette (color-indexing) with bundling, optional greedy LZ77 (distance 1 /
distance width runs — both map through the 2D table), optional color
cache, and per-alphabet simple-vs-full Huffman code selection with
package-merge length-limited codes. Lossless: decode(encode(img)) == img
exactly.

Closes the WebP half of the image-codec seam named in
operators/multimodal.py (reference parity context: the reference engine
treats media payloads as opaque binaries; decoding here powers
image_features over real-world corpora — szostkawron/ficaria has no
counterpart, this is training-data-pipeline surface).

The 2D distance table below is transcribed from the published spec
(kCodeToPlane); encoder and decoder share it, so round-trips validate
self-consistency by construction.
"""
from __future__ import annotations

import struct

import numpy as np

# Order in which code-length-code lengths appear on the wire (spec §5.2.2).
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# 120-entry 2D distance map (spec §4.2.2): entry -> (yoffset<<4 | (8-x)).
_CODE_TO_PLANE = (
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1a,
    0x26, 0x2a, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1b, 0x36, 0x3a,
    0x25, 0x2b, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1c, 0x35, 0x3b,
    0x46, 0x4a, 0x24, 0x2c, 0x58, 0x45, 0x4b, 0x34, 0x3c, 0x03,
    0x57, 0x59, 0x13, 0x1d, 0x56, 0x5a, 0x23, 0x2d, 0x44, 0x4c,
    0x55, 0x5b, 0x33, 0x3d, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1e,
    0x66, 0x6a, 0x22, 0x2e, 0x54, 0x5c, 0x43, 0x4d, 0x65, 0x6b,
    0x32, 0x3e, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5d, 0x11, 0x1f,
    0x64, 0x6c, 0x42, 0x4e, 0x76, 0x7a, 0x21, 0x2f, 0x75, 0x7b,
    0x52, 0x5e, 0x31, 0x3f, 0x63, 0x6d, 0x74, 0x7c, 0x10, 0x20,
    0x62, 0x6e, 0x30, 0x41, 0x4f, 0x73, 0x7d, 0x61, 0x6f, 0x51,
    0x5f, 0x72, 0x7e, 0x40, 0x50, 0x71, 0x7f, 0x60, 0x70, 0x80,
)

_HASH_MUL = 0x1E35A7BD
_NUM_LITERALS = 256
_NUM_LENGTHS = 24
_NUM_DISTANCES = 40


def _plane_to_offsets(code: int) -> tuple[int, int]:
    """2D map entry -> (dx, dy) with dx = 8 - low nibble (may be negative)."""
    return 8 - (code & 0xF), code >> 4


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# Bit I/O — LSB-first within bytes (DEFLATE convention), per the spec.


class _Reader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos          # next byte index
        self._acc = 0
        self._n = 0

    def bits(self, n: int) -> int:
        while self._n < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated WebP payload (bitstream ends "
                                 "before the image completes)")
            self._acc |= self.data[self.pos] << self._n
            self.pos += 1
            self._n += 8
        v = self._acc & ((1 << n) - 1)
        self._acc >>= n
        self._n -= n
        return v

    def read_code(self, table: dict[tuple[int, int], int]) -> int:
        """Huffman codes are read MSB-of-code-first (bit-by-bit). A
        single-symbol code is 0 bits wide (libwebp's trivial-table rule)."""
        sym = table.get((0, 0))
        if sym is not None:
            return sym
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.bits(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid WebP: Huffman code longer than 15 bits")


class _Writer:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, v: int, n: int) -> None:
        self._acc |= (v & ((1 << n) - 1)) << self._n
        self._n += n
        while self._n >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def put_code(self, code: int, length: int) -> None:
        """Emit a Huffman code MSB-first (reverse then put LSB-first)."""
        rev = 0
        for _ in range(length):
            rev = (rev << 1) | (code & 1)
            code >>= 1
        self.put(rev, length)

    def flush(self) -> bytes:
        if self._n:
            self.out.append(self._acc & 0xFF)
            self._acc = 0
            self._n = 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# Canonical Huffman codes.


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), DEFLATE canonical order (by length, then
    symbol)."""
    code, prev = 0, 0
    out: dict[int, tuple[int, int]] = {}
    for sym in sorted(lengths, key=lambda s: (lengths[s], s)):
        ln = lengths[sym]
        if ln == 0:
            continue
        code <<= ln - prev
        out[sym] = (code, ln)
        code += 1
        prev = ln
    return out


def _decode_table(lengths: dict[int, int]) -> dict[tuple[int, int], int]:
    codes = _canonical_codes(lengths)
    table = {(ln, code): sym for sym, (code, ln) in codes.items()}
    # Kraft check — a non-trivial code must be exactly complete (libwebp
    # rejects both over- and under-subscribed codes).
    kraft = sum(1 / (1 << ln) for ln in lengths.values() if ln)
    if len(lengths) > 1 and abs(kraft - 1) > 1e-12:
        raise ValueError("invalid WebP: over- or under-subscribed "
                         "Huffman code")
    return table


def _package_merge(freqs: dict[int, int], limit: int) -> dict[int, int]:
    """Length-limited Huffman code lengths (coin-collector package-merge)."""
    items = sorted((f, (s,)) for s, f in freqs.items() if f > 0)
    if not items:
        return {}
    if len(items) == 1:
        return {items[0][1][0]: 1}
    pm = list(items)
    for _ in range(limit - 1):
        packaged = [
            (pm[i][0] + pm[i + 1][0], pm[i][1] + pm[i + 1][1])
            for i in range(0, len(pm) - 1, 2)
        ]
        pm = sorted(packaged + items)
    counts = {s: 0 for _f, (s,) in items}
    for _f, syms in pm[: 2 * len(items) - 2]:
        for s in syms:
            counts[s] += 1
    return counts


# ---------------------------------------------------------------------------
# Prefix (length/distance) coding shared by encoder and decoder.


def _prefix_decode(sym: int, br: _Reader) -> int:
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.bits(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value (>= 1) -> (symbol, extra_bits_value, extra_bits_count)."""
    x = value - 1
    if x < 4:
        return x, 0, 0
    eb = x.bit_length() - 2
    base = 1 << (eb + 1)
    if x < base + (base >> 1):
        return 2 * eb + 2, x - base, eb
    return 2 * eb + 3, x - (base + (base >> 1)), eb


_dist_reverse_cache: dict[int, dict[int, int]] = {}


def _dist_reverse(width: int) -> dict[int, int]:
    """distance -> plane code for the 120 neighborhood entries (per width).
    When several entries map to the same linear distance the SMALLEST code
    wins (they are interchangeable on the wire; smaller sorts first)."""
    tab = _dist_reverse_cache.get(width)
    if tab is None:
        tab = {}
        for i, pc in enumerate(_CODE_TO_PLANE):
            dx, dy = _plane_to_offsets(pc)
            d = dy * width + dx
            if d >= 1 and d not in tab:
                tab[d] = i + 1
        _dist_reverse_cache[width] = tab
    return tab


# ---------------------------------------------------------------------------
# Decoder.


def _read_huffman_code(br: _Reader, alphabet_size: int
                       ) -> dict[tuple[int, int], int]:
    if br.bits(1):                               # simple code
        num_symbols = br.bits(1) + 1
        first_8bits = br.bits(1)
        sym0 = br.bits(8 if first_8bits else 1)
        if num_symbols == 1:
            return {(0, 0): sym0}
        sym1 = br.bits(8)
        return {(1, 0): sym0, (1, 1): sym1}
    num_clc = 4 + br.bits(4)
    clc_lengths = {}
    for i in range(num_clc):
        ln = br.bits(3)
        if ln:
            clc_lengths[_CLC_ORDER[i]] = ln
    if not clc_lengths:
        raise ValueError("invalid WebP: empty code-length code")
    if len(clc_lengths) == 1:
        (only,) = clc_lengths
        clc_table = {(0, 0): only}     # trivial single-symbol code: 0 bits
    else:
        clc_table = _decode_table(clc_lengths)
    if br.bits(1):                               # explicit max_symbol
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths: dict[int, int] = {}
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = br.read_code(clc_table)
        if code_len < 16:
            if code_len:
                lengths[symbol] = code_len
                prev_len = code_len
            symbol += 1
        else:
            use_prev = code_len == 16
            extra = {16: 2, 17: 3, 18: 7}[code_len]
            offset = {16: 3, 17: 3, 18: 11}[code_len]
            repeat = br.bits(extra) + offset
            if symbol + repeat > alphabet_size:
                raise ValueError("invalid WebP: code-length repeat overruns "
                                 "the alphabet")
            if use_prev:
                for _ in range(repeat):
                    lengths[symbol] = prev_len
                    symbol += 1
            else:
                symbol += repeat
    if not lengths:
        raise ValueError("invalid WebP: Huffman code with no symbols")
    if len(lengths) == 1:
        (only,) = lengths
        return {(0, 0): only}    # degenerate single-symbol code: 0 bits
    return _decode_table(lengths)


class _Transform:
    __slots__ = ("kind", "bits", "xsize", "data")

    def __init__(self, kind, bits, xsize, data):
        self.kind = kind
        self.bits = bits
        self.xsize = xsize
        self.data = data


def _decode_image_stream(br: _Reader, w: int, h: int, level0: bool
                         ) -> tuple[np.ndarray, int, list[_Transform]]:
    """Returns (argb uint32 array of len w'*h, final width w', transforms)
    where w' may shrink under color-indexing bundling (level0 only)."""
    transforms: list[_Transform] = []
    seen_kinds = set()
    if level0:
        while br.bits(1):
            kind = br.bits(2)
            if kind in seen_kinds:
                raise ValueError("invalid WebP: duplicate transform")
            seen_kinds.add(kind)
            if kind == 2:                         # subtract-green
                transforms.append(_Transform(2, 0, w, None))
            elif kind in (0, 1):                  # predictor / cross-color
                bits = br.bits(3) + 2
                tw, th = _ceil_div(w, 1 << bits), _ceil_div(h, 1 << bits)
                sub, _, _ = _decode_image_stream(br, tw, th, False)
                transforms.append(_Transform(kind, bits, w, sub))
            else:                                 # color-indexing
                num_colors = br.bits(8) + 1
                pal_deltas, _, _ = _decode_image_stream(
                    br, num_colors, 1, False)
                # palette entries are delta-coded per channel (mod 256)
                d = pal_deltas.view(np.uint8).reshape(-1, 4)
                pal = np.cumsum(d.astype(np.uint32), axis=0, dtype=np.uint32)
                pal = (pal & 0xFF).astype(np.uint8)
                palette = pal.copy().view(np.uint32).reshape(-1)
                if num_colors <= 2:
                    width_bits = 3
                elif num_colors <= 4:
                    width_bits = 2
                elif num_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append(
                    _Transform(3, width_bits, w, palette))
                w = _ceil_div(w, 1 << width_bits)

    cache_bits = 0
    if br.bits(1):
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("invalid WebP: color-cache bits out of range")

    meta = None
    meta_bits = 0
    num_groups = 1
    if level0 and br.bits(1):                     # meta-huffman
        meta_bits = br.bits(3) + 2
        mw, mh = _ceil_div(w, 1 << meta_bits), _ceil_div(h, 1 << meta_bits)
        meta_img, _, _ = _decode_image_stream(br, mw, mh, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        num_groups = int(meta.max()) + 1

    green_size = _NUM_LITERALS + _NUM_LENGTHS + \
        ((1 << cache_bits) if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        groups.append((
            _read_huffman_code(br, green_size),
            _read_huffman_code(br, _NUM_LITERALS),   # red
            _read_huffman_code(br, _NUM_LITERALS),   # blue
            _read_huffman_code(br, _NUM_LITERALS),   # alpha
            _read_huffman_code(br, _NUM_DISTANCES),
        ))

    n = w * h
    buf = np.zeros(n, np.uint32)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    dist_rev_w = w
    pos = 0
    g_tab, r_tab, b_tab, a_tab, d_tab = groups[0]
    mw = _ceil_div(w, 1 << meta_bits) if meta is not None else 0
    last_tile = -1
    while pos < n:
        if meta is not None:
            tile = ((pos // w) >> meta_bits) * mw + ((pos % w) >> meta_bits)
            if tile != last_tile:
                g_tab, r_tab, b_tab, a_tab, d_tab = groups[int(meta[tile])]
                last_tile = tile
        sym = br.read_code(g_tab)
        if sym < _NUM_LITERALS:
            red = br.read_code(r_tab)
            blue = br.read_code(b_tab)
            alpha = br.read_code(a_tab)
            px = (alpha << 24) | (red << 16) | (sym << 8) | blue
            buf[pos] = px
            pos += 1
            if cache is not None:
                cache[(_HASH_MUL * px & 0xFFFFFFFF) >> shift] = px
        elif sym < _NUM_LITERALS + _NUM_LENGTHS:
            length = _prefix_decode(sym - _NUM_LITERALS, br)
            dist_code = _prefix_decode(br.read_code(d_tab), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _plane_to_offsets(_CODE_TO_PLANE[dist_code - 1])
                dist = max(dy * dist_rev_w + dx, 1)
            if dist > pos or pos + length > n:
                raise ValueError("invalid WebP: backward reference out of "
                                 "bounds")
            for _ in range(length):
                px = int(buf[pos - dist])
                buf[pos] = px
                pos += 1
                if cache is not None:
                    cache[(_HASH_MUL * px & 0xFFFFFFFF) >> shift] = px
        else:
            idx = sym - _NUM_LITERALS - _NUM_LENGTHS
            if cache is None or idx >= len(cache):
                raise ValueError("invalid WebP: color-cache reference "
                                 "without a cache")
            buf[pos] = cache[idx]
            pos += 1
    return buf, w, transforms


def _avg2(a: int, b: int) -> int:
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for s in (0, 8, 16, 24):
        v = ((l >> s) & 0xFF) + ((t >> s) & 0xFF) - ((tl >> s) & 0xFF)
        out |= min(255, max(0, v)) << s
    return out


def _clamp_add_sub_half(l: int, t: int, tl: int) -> int:
    ave = _avg2(l, t)
    out = 0
    for s in (0, 8, 16, 24):
        a = (ave >> s) & 0xFF
        b = (tl >> s) & 0xFF
        d = a - b
        d = d // 2 if d >= 0 else -((-d) // 2)   # C truncation
        out |= min(255, max(0, a + d)) << s
    return out


def _select(t: int, l: int, tl: int) -> int:
    s = 0
    for sh in (0, 8, 16, 24):
        pa = abs(((l >> sh) & 0xFF) - ((tl >> sh) & 0xFF))   # |L - TL|
        pb = abs(((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF))   # |T - TL|
        s += pa - pb
    return t if s <= 0 else l


def _add_pixels(a: int, b: int) -> int:
    """Per-channel (a + b) mod 256."""
    out = 0
    for s in (0, 8, 16, 24):
        out |= ((((a >> s) & 0xFF) + ((b >> s) & 0xFF)) & 0xFF) << s
    return out


def _predict(mode: int, buf: np.ndarray, pos: int, w: int) -> int:
    l = int(buf[pos - 1])
    t = int(buf[pos - w])
    tl = int(buf[pos - w - 1])
    tr = int(buf[pos - w + 1])
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(t, l, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(l, t, tl)
    raise ValueError(f"invalid WebP: predictor mode {mode}")


def _inverse_predictor(buf: np.ndarray, w: int, h: int,
                       tr: _Transform) -> None:
    bits = tr.bits
    tw = _ceil_div(w, 1 << bits)
    modes = ((tr.data >> 8) & 0xFF).astype(np.int64)
    for y in range(h):
        trow = (y >> bits) * tw
        for x in range(w):
            pos = y * w + x
            if pos == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(buf[pos - 1])
            elif x == 0:
                pred = int(buf[pos - w])
            else:
                pred = _predict(int(modes[trow + (x >> bits)]),
                                buf, pos, w)
            buf[pos] = _add_pixels(int(buf[pos]), pred)


def _inverse_color_transform(buf: np.ndarray, w: int, h: int,
                             tr: _Transform) -> None:
    bits = tr.bits
    tw = _ceil_div(w, 1 << bits)
    elems = tr.data
    g2r = (elems & 0xFF).astype(np.int8)
    g2b = ((elems >> 8) & 0xFF).astype(np.int8)
    r2b = ((elems >> 16) & 0xFF).astype(np.int8)
    xs = np.arange(w) >> bits
    ys = np.arange(h) >> bits
    tile = (ys[:, None] * tw + xs[None, :]).reshape(-1)
    G2R = g2r[tile].astype(np.int32)
    G2B = g2b[tile].astype(np.int32)
    R2B = r2b[tile].astype(np.int32)
    g = ((buf >> 8) & 0xFF).astype(np.uint8).view(np.int8).astype(np.int32)
    red = ((buf >> 16) & 0xFF).astype(np.int32)
    blue = (buf & 0xFF).astype(np.int32)
    red = (red + ((G2R * g) >> 5)) & 0xFF
    red_s = red.astype(np.uint8).view(np.int8).astype(np.int32)
    blue = (blue + ((G2B * g) >> 5) + ((R2B * red_s) >> 5)) & 0xFF
    buf[:] = (buf & np.uint32(0xFF00FF00)) | \
        (red.astype(np.uint32) << np.uint32(16)) | blue.astype(np.uint32)


def _inverse_subtract_green(buf: np.ndarray) -> None:
    g = (buf >> np.uint32(8)) & np.uint32(0xFF)
    r = (((buf >> np.uint32(16)) & np.uint32(0xFF)) + g) & np.uint32(0xFF)
    b = ((buf & np.uint32(0xFF)) + g) & np.uint32(0xFF)
    buf[:] = (buf & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b


def _inverse_color_indexing(buf: np.ndarray, full_w: int, h: int,
                            tr: _Transform) -> np.ndarray:
    width_bits = tr.bits
    palette = tr.data
    packed_w = _ceil_div(full_w, 1 << width_bits)
    greens = ((buf >> 8) & 0xFF).astype(np.int64).reshape(h, packed_w)
    if width_bits == 0:
        idx = greens
    else:
        bpp = 8 >> width_bits
        per = 1 << width_bits
        xs = np.arange(full_w)
        src = greens[:, xs >> width_bits]
        off = (xs % per) * bpp
        idx = (src >> off[None, :]) & ((1 << bpp) - 1)
    idx = idx[:, :full_w]
    out = np.zeros((h, full_w), np.uint32)
    valid = idx < len(palette)
    out[valid] = palette[idx[valid]]      # out-of-range index -> 0 (libwebp)
    return out.reshape(-1)


def decode_webp(payload: bytes) -> np.ndarray:
    """Decode a lossless WebP (RIFF/VP8L) payload to (H, W, 3) uint8 RGB —
    or (H, W, 4) RGBA when the stream's alpha flag is set. Supports the
    full lossless feature set: all four transforms, color cache,
    meta-Huffman, LZ77 with 2D distance mapping. Lossy WebP (VP8 chunk)
    and extended containers (VP8X/animation) raise NotImplementedError —
    that is the remaining WebP seam (plug Pillow/libwebp for those)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload (missing RIFF/WEBP header)")
    pos = 12
    stream = None
    while pos + 8 <= len(payload):
        fourcc = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_end = pos + 8 + size
        if body_end > len(payload):
            raise ValueError("truncated WebP payload (cut chunk body)")
        if fourcc == b"VP8L":
            stream = payload[pos + 8: body_end]
            break
        if fourcc in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(
                "lossy / extended WebP (VP8/VP8X chunk) not supported — "
                "only lossless VP8L decodes natively; plug Pillow/libwebp "
                "for lossy streams")
        pos = body_end + (size & 1)
    if stream is None:
        raise ValueError("invalid WebP: no VP8L chunk")
    if not stream or stream[0] != 0x2F:
        raise ValueError("invalid WebP: bad VP8L signature byte")
    br = _Reader(stream, 1)
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    alpha_used = br.bits(1)
    version = br.bits(3)
    if version != 0:
        raise NotImplementedError(f"VP8L version {version} not supported")
    buf, cur_w, transforms = _decode_image_stream(br, w, h, True)
    for tr in reversed(transforms):
        if tr.kind == 3:
            buf = _inverse_color_indexing(buf, tr.xsize, h, tr)
            cur_w = tr.xsize
        elif tr.kind == 2:
            _inverse_subtract_green(buf)
        elif tr.kind == 1:
            _inverse_color_transform(buf, cur_w, h, tr)
        else:
            _inverse_predictor(buf, cur_w, h, tr)
    if cur_w != w:
        raise ValueError("invalid WebP: transform chain does not restore "
                         "the full image width")
    a = ((buf >> 24) & 0xFF).astype(np.uint8).reshape(h, w)
    r = ((buf >> 16) & 0xFF).astype(np.uint8).reshape(h, w)
    g = ((buf >> 8) & 0xFF).astype(np.uint8).reshape(h, w)
    b = (buf & 0xFF).astype(np.uint8).reshape(h, w)
    if alpha_used:
        return np.stack([r, g, b, a], axis=-1)
    return np.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------------------
# Encoder.


def _write_huffman_code(bw: _Writer, freqs: dict[int, int],
                        alphabet_size: int) -> dict[int, tuple[int, int]]:
    """Choose simple vs full representation, write it, return the symbol ->
    (code, length) map for the payload emission."""
    used = sorted(s for s, f in freqs.items() if f > 0)
    if not used:
        used = [0]                      # a code must define >= 1 symbol
    if len(used) <= 2 and used[-1] <= 255:
        bw.put(1, 1)                                     # simple
        bw.put(len(used) - 1, 1)
        if used[0] > 1:
            bw.put(1, 1)
            bw.put(used[0], 8)
        else:
            bw.put(0, 1)
            bw.put(used[0], 1)
        if len(used) == 1:
            return {used[0]: (0, 0)}
        bw.put(used[1], 8)
        return {used[0]: (0, 1), used[1]: (1, 1)}

    lengths = _package_merge({s: freqs[s] for s in used}, 15)
    # Serialize the FULL length array with the code-length alphabet (RLE
    # 16/17/18). No trailing-zero trim: without an explicit max_symbol the
    # decoder keeps reading length tokens until every alphabet slot is
    # covered, so trailing zeros must arrive as 17/18 runs.
    arr = [lengths.get(s, 0) for s in range(alphabet_size)]
    tokens: list[tuple[int, int, int]] = []   # (symbol, extra, extra_bits)
    i = 0
    while i < len(arr):
        ln = arr[i]
        run = 1
        while i + run < len(arr) and arr[i + run] == ln:
            run += 1
        i += run
        if ln == 0:
            while run >= 3:
                rep = min(run, 138)
                if rep >= 11:
                    tokens.append((18, rep - 11, 7))
                else:
                    tokens.append((17, rep - 3, 3))
                run -= rep
            tokens.extend((0, 0, 0) for _ in range(run))
        else:
            tokens.append((ln, 0, 0))   # literal sets prev_code_len = ln
            run -= 1
            while run >= 3:
                rep = min(run, 6)
                tokens.append((16, rep - 3, 2))
                run -= rep
            tokens.extend((ln, 0, 0) for _ in range(run))
    clc_freqs: dict[int, int] = {}
    for sym, _e, _eb in tokens:
        clc_freqs[sym] = clc_freqs.get(sym, 0) + 1
    clc_lengths = _package_merge(clc_freqs, 7)
    clc_codes = _canonical_codes(clc_lengths)
    if len(clc_codes) == 1:
        # libwebp's trivial-table rule: a single-symbol code reads/writes
        # 0 bits regardless of its declared length
        clc_codes = {sym: (0, 0) for sym in clc_codes}
    bw.put(0, 1)                                         # full code
    bw.put(19 - 4, 4)                                    # all 19 clc slots
    for sym in _CLC_ORDER:
        bw.put(clc_lengths.get(sym, 0), 3)
    bw.put(0, 1)                                         # no max_symbol
    for sym, extra, ebits in tokens:
        code, ln = clc_codes[sym]
        bw.put_code(code, ln)
        if ebits:
            bw.put(extra, ebits)
    payload_codes = _canonical_codes(lengths)
    if len(payload_codes) == 1:
        payload_codes = {sym: (0, 0) for sym in payload_codes}
    return payload_codes


def _tokenize(argb: np.ndarray, w: int, *, lz77: bool, cache_bits: int
              ) -> list[tuple]:
    """Greedy tokenizer: ('lit', px) | ('copy', length, dist) |
    ('cache', idx). Mirrors the decoder's cache-update rule (insert on
    literal and on every copied pixel)."""
    n = len(argb)
    tokens: list[tuple] = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    pos = 0
    px_at = argb
    while pos < n:
        if lz77 and pos >= 1:
            best_len = 0
            best_dist = 0
            for dist in (1, w):
                if dist > pos:
                    continue
                length = 0
                maxlen = min(n - pos, 4096)
                while length < maxlen and \
                        px_at[pos + length] == px_at[pos + length - dist]:
                    length += 1
                if length > best_len:
                    best_len, best_dist = length, dist
            if best_len >= 3:
                tokens.append(("copy", best_len, best_dist))
                if cache is not None:
                    for i in range(pos, pos + best_len):
                        px = int(px_at[i])
                        cache[(_HASH_MUL * px & 0xFFFFFFFF) >> shift] = px
                pos += best_len
                continue
        px = int(px_at[pos])
        if cache is not None:
            slot = (_HASH_MUL * px & 0xFFFFFFFF) >> shift
            if cache[slot] == px:
                tokens.append(("cache", slot))
                pos += 1
                continue
            cache[slot] = px
        tokens.append(("lit", px))
        pos += 1
    return tokens


def _encode_image_stream(bw: _Writer, argb: np.ndarray, w: int, h: int, *,
                         lz77: bool = False, cache_bits: int = 0,
                         level0: bool = False) -> None:
    """Entropy-coded image (no transforms — callers write those), one
    Huffman group. Only a level-0 stream carries the meta-Huffman bit;
    transform/palette sub-images must not write it."""
    tokens = _tokenize(argb, w, lz77=lz77, cache_bits=cache_bits)
    if cache_bits:
        bw.put(1, 1)
        bw.put(cache_bits, 4)
    else:
        bw.put(0, 1)
    if level0:
        bw.put(0, 1)                   # no meta-Huffman (single code group)
    g_f: dict[int, int] = {}
    r_f: dict[int, int] = {}
    b_f: dict[int, int] = {}
    a_f: dict[int, int] = {}
    d_f: dict[int, int] = {}
    dist_rev = _dist_reverse(w)
    emits: list[tuple] = []
    for tok in tokens:
        if tok[0] == "lit":
            px = tok[1]
            g, r, b, a = (px >> 8) & 0xFF, (px >> 16) & 0xFF, \
                px & 0xFF, (px >> 24) & 0xFF
            g_f[g] = g_f.get(g, 0) + 1
            r_f[r] = r_f.get(r, 0) + 1
            b_f[b] = b_f.get(b, 0) + 1
            a_f[a] = a_f.get(a, 0) + 1
            emits.append(("lit", g, r, b, a))
        elif tok[0] == "copy":
            _, length, dist = tok
            lsym, lex, leb = _prefix_encode(length)
            g_f[256 + lsym] = g_f.get(256 + lsym, 0) + 1
            dist_code = dist_rev.get(dist, dist + 120)
            dsym, dex, deb = _prefix_encode(dist_code)
            d_f[dsym] = d_f.get(dsym, 0) + 1
            emits.append(("copy", lsym, lex, leb, dsym, dex, deb))
        else:
            idx = tok[1]
            sym = 256 + 24 + idx
            g_f[sym] = g_f.get(sym, 0) + 1
            emits.append(("cache", sym))
    green_size = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    g_c = _write_huffman_code(bw, g_f, green_size)
    r_c = _write_huffman_code(bw, r_f, 256)
    b_c = _write_huffman_code(bw, b_f, 256)
    a_c = _write_huffman_code(bw, a_f, 256)
    d_c = _write_huffman_code(bw, d_f, 40)
    for e in emits:
        if e[0] == "lit":
            _, g, r, b, a = e
            bw.put_code(*g_c[g])
            bw.put_code(*r_c[r])
            bw.put_code(*b_c[b])
            bw.put_code(*a_c[a])
        elif e[0] == "copy":
            _, lsym, lex, leb, dsym, dex, deb = e
            bw.put_code(*g_c[256 + lsym])
            if leb:
                bw.put(lex, leb)
            bw.put_code(*d_c[dsym])
            if deb:
                bw.put(dex, deb)
        else:
            bw.put_code(*g_c[e[1]])


def _to_argb(img: np.ndarray) -> tuple[np.ndarray, int, int, bool]:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("image must be uint8")
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("image must be (H, W), (H, W, 3) or (H, W, 4)")
    h, w = img.shape[:2]
    if not (0 < w <= 16384 and 0 < h <= 16384):
        raise ValueError("image dimensions out of VP8L range (14 bits)")
    alpha_used = img.shape[2] == 4
    a = img[..., 3].astype(np.uint32) if alpha_used else np.uint32(255)
    argb = ((a << np.uint32(24))
            | (img[..., 0].astype(np.uint32) << np.uint32(16))
            | (img[..., 1].astype(np.uint32) << np.uint32(8))
            | img[..., 2].astype(np.uint32))
    return np.ascontiguousarray(argb.reshape(-1)), w, h, alpha_used


def _forward_subtract_green(argb: np.ndarray) -> np.ndarray:
    g = (argb >> np.uint32(8)) & np.uint32(0xFF)
    r = (((argb >> np.uint32(16)) & np.uint32(0xFF)) - g) & np.uint32(0xFF)
    b = ((argb & np.uint32(0xFF)) - g) & np.uint32(0xFF)
    return (argb & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b


def _sub_pixels(a: int, b: int) -> int:
    out = 0
    for s in (0, 8, 16, 24):
        out |= ((((a >> s) & 0xFF) - ((b >> s) & 0xFF)) & 0xFF) << s
    return out


def _forward_predictor(argb: np.ndarray, w: int, h: int, bits: int
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Residuals + the predictor sub-image. Tile modes cycle 0..13 so every
    inverse-predictor path runs in round-trip tests."""
    tw, th = _ceil_div(w, 1 << bits), _ceil_div(h, 1 << bits)
    modes = np.arange(tw * th, dtype=np.int64) % 14
    out = np.empty_like(argb)
    for y in range(h):
        trow = (y >> bits) * tw
        for x in range(w):
            pos = y * w + x
            if pos == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(argb[pos - 1])
            elif x == 0:
                pred = int(argb[pos - w])
            else:
                pred = _predict(int(modes[trow + (x >> bits)]), argb, pos, w)
            out[pos] = _sub_pixels(int(argb[pos]), pred)
    sub = (np.uint32(0xFF000000)
           | (modes.astype(np.uint32) << np.uint32(8)))
    return out, sub


def _forward_color_transform(argb: np.ndarray, w: int, h: int, bits: int
                             ) -> tuple[np.ndarray, np.ndarray]:
    """Apply a deterministic per-tile cross-color transform; returns
    (transformed pixels, element sub-image)."""
    tw, th = _ceil_div(w, 1 << bits), _ceil_div(h, 1 << bits)
    ti = np.arange(tw * th, dtype=np.uint32)
    g2r = (ti * np.uint32(17) + np.uint32(3)) & np.uint32(0xFF)
    g2b = (ti * np.uint32(29) + np.uint32(7)) & np.uint32(0xFF)
    r2b = (ti * np.uint32(13) + np.uint32(11)) & np.uint32(0xFF)
    sub = (np.uint32(0xFF000000) | (r2b << np.uint32(16))
           | (g2b << np.uint32(8)) | g2r)
    xs = np.arange(w) >> bits
    ys = np.arange(h) >> bits
    tile = (ys[:, None] * tw + xs[None, :]).reshape(-1)
    G2R = g2r[tile].astype(np.uint8).view(np.int8).astype(np.int32)
    G2B = g2b[tile].astype(np.uint8).view(np.int8).astype(np.int32)
    R2B = r2b[tile].astype(np.uint8).view(np.int8).astype(np.int32)
    g = ((argb >> 8) & 0xFF).astype(np.uint8).view(np.int8).astype(np.int32)
    red = ((argb >> 16) & 0xFF).astype(np.int32)
    blue = (argb & 0xFF).astype(np.int32)
    red_s = red.astype(np.uint8).view(np.int8).astype(np.int32)
    new_red = (red - ((G2R * g) >> 5)) & 0xFF
    new_blue = (blue - ((G2B * g) >> 5) - ((R2B * red_s) >> 5)) & 0xFF
    out = (argb & np.uint32(0xFF00FF00)) | \
        (new_red.astype(np.uint32) << np.uint32(16)) | \
        new_blue.astype(np.uint32)
    return out, sub


def encode_webp_lossless(img: np.ndarray, *, subtract_green: bool = False,
                         predictor: bool = False, cross_color: bool = False,
                         palette: bool = False, lz77: bool = True,
                         cache_bits: int = 0,
                         transform_bits: int = 2) -> bytes:
    """Encode (H, W[, 3|4]) uint8 to a lossless WebP (RIFF/VP8L) payload.
    Deterministic; decode_webp(encode_webp_lossless(img)) == img exactly.

    Transform flags compose in the canonical libwebp order
    subtract-green → predictor → cross-color (each optional); ``palette``
    is exclusive with the others and bundles sub-byte indices when the
    image has ≤ 16 distinct colors. ``cache_bits`` (0 = off, 1..11)
    enables the color cache; ``lz77`` emits greedy distance-1 /
    distance-width backward references (both routes through the 2D
    distance map)."""
    argb, w, h, alpha_used = _to_argb(img)
    if palette and (subtract_green or predictor or cross_color):
        raise ValueError("palette is exclusive with the pixel transforms")
    if not 0 <= cache_bits <= 11:
        raise ValueError("cache_bits must be 0 (off) or 1..11")
    if not 2 <= transform_bits <= 9:
        raise ValueError("transform_bits must be in 2..9")

    bw = _Writer()
    bw.put(0x2F, 8)                    # VP8L signature
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(1 if alpha_used else 0, 1)
    bw.put(0, 3)                       # version

    cur = argb
    cur_w = w
    if subtract_green:
        bw.put(1, 1)
        bw.put(2, 2)
        cur = _forward_subtract_green(cur)
    if predictor:
        bw.put(1, 1)
        bw.put(0, 2)
        bw.put(transform_bits - 2, 3)
        cur, sub = _forward_predictor(cur, w, h, transform_bits)
        _encode_image_stream(bw, sub, _ceil_div(w, 1 << transform_bits),
                             _ceil_div(h, 1 << transform_bits))
    if cross_color:
        bw.put(1, 1)
        bw.put(1, 2)
        bw.put(transform_bits - 2, 3)
        cur, sub = _forward_color_transform(cur, w, h, transform_bits)
        _encode_image_stream(bw, sub, _ceil_div(w, 1 << transform_bits),
                             _ceil_div(h, 1 << transform_bits))
    if palette:
        colors, first_idx = np.unique(cur, return_index=True)
        order = np.argsort(first_idx)          # first-occurrence order
        pal = colors[order]
        num_colors = len(pal)
        if num_colors > 256:
            raise ValueError(
                f"palette requested but image has {num_colors} > 256 "
                "distinct colors")
        bw.put(1, 1)
        bw.put(3, 2)
        bw.put(num_colors - 1, 8)
        ch = pal.copy().view(np.uint8).reshape(-1, 4).astype(np.int32)
        deltas = ch.copy()
        deltas[1:] = (ch[1:] - ch[:-1]) & 0xFF
        pal_img = np.ascontiguousarray(
            deltas.astype(np.uint8)).view(np.uint32).reshape(-1)
        _encode_image_stream(bw, pal_img, num_colors, 1)
        lut = {int(c): i for i, c in enumerate(pal)}
        idx = np.array([lut[int(p)] for p in cur], np.uint32)
        if num_colors <= 2:
            width_bits = 3
        elif num_colors <= 4:
            width_bits = 2
        elif num_colors <= 16:
            width_bits = 1
        else:
            width_bits = 0
        if width_bits:
            bpp = 8 >> width_bits
            per = 1 << width_bits
            packed_w = _ceil_div(w, per)
            packed = np.zeros((h, packed_w), np.uint32)
            grid = idx.reshape(h, w)
            for sub_x in range(per):
                cols = grid[:, sub_x::per]
                packed[:, :cols.shape[1]] |= cols << np.uint32(sub_x * bpp)
            cur = (np.uint32(0xFF000000)
                   | (packed.reshape(-1) << np.uint32(8)))
            cur_w = packed_w
        else:
            cur = np.uint32(0xFF000000) | (idx << np.uint32(8))
            cur_w = w
    bw.put(0, 1)                       # no more transforms

    _encode_image_stream(bw, cur, cur_w, h, lz77=lz77, cache_bits=cache_bits,
                         level0=True)
    vp8l = bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    return riff
