"""Baseline TIFF codec in pure stdlib + numpy — no Pillow/libtiff.

Implements the public TIFF 6.0 baseline (plus the Deflate extension):
both byte orders (II/MM), strip-based storage, 8-bit grayscale/RGB/RGBA,
Compression 1 (none), 32773 (PackBits), 5 (LZW — MSB-first codes with
the TIFF early-change convention), 8 (Deflate/zlib), and Predictor 2
(horizontal differencing). The encoder emits a conformant subset
(selectable compression/predictor/strip size, little-endian) used by
round-trip tests and the media gate; the decoder additionally handles
big-endian files, multi-strip layouts and inline-vs-offset IFD values.

Extends the image family (multimodal._decode_image_real dispatches on
the II*/MM* magic) alongside netpbm/PNG/JPEG/WebP — training-data-
pipeline surface with no counterpart in the reference engine. Tiled
TIFF, 16-bit samples, palettes and planar configuration 2 raise typed
NotImplementedError (the declared seam).
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317
_TAG_TILE_WIDTH = 322

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8, 11: 4, 12: 8}


# ---------------------------------------------------------------------------
# TIFF LZW (MSB-first, 9..12-bit codes, EARLY code-width change).


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """``expected`` bounds the output (strips declare their raster size):
    a hostile strip of max-length table references must not amplify into
    unbounded memory before the caller truncates."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = ((acc << 8) | byte) & 0xFFFFFFFF
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == EOI:
                return bytes(out)
            if code == CLEAR:
                reset()
                prev = None
                continue
            if prev is None:
                if code >= len(table) or code > 255:
                    raise ValueError("invalid TIFF: LZW stream does not "
                                     "start with a literal after Clear")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("invalid TIFF: LZW code beyond table")
            out += entry
            if len(out) >= expected:
                return bytes(out[:expected])
            prev = entry
            # TIFF early change: the decoder's table lags the encoder's
            # by ONE entry (the encoder defines w+next[0] at emission
            # time; the decoder learns it one code later), so the decoder
            # must widen one entry early — at table length 2^w - 2, which
            # is the stream position where the encoder's count hits
            # 2^w - 1 and it starts writing wider codes
            if len(table) >= (1 << width) - 2 and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        # truncate drained bits — an unbounded Python-int accumulator
        # makes encoding O(bytes^2) (the same trap fixed in the JPEG
        # decoder; measured 4x-per-doubling on 50..400 KB strips)
        acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(CLEAR, width)
    w = b""
    for b in bytes(data):
        wb = w + bytes([b])
        if wb in table:
            w = wb
            continue
        put(table[w], width)
        table[wb] = next_code
        next_code += 1
        # early change mirrors the decoder exactly
        if next_code >= (1 << width) - 1:
            if width < 12:
                width += 1
            else:
                put(CLEAR, width)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
        w = bytes([b])
    if w:
        put(table[w], width)
        # the decoder registers an entry for EVERY data code it processes
        # — including this final one (it cannot know no more data follows)
        # — so if the width boundary falls exactly here, EOI must be
        # written at the grown width (the classic TIFF LZW end-of-strip
        # off-by-one; traced via a 253-byte stream whose EOI straddled
        # the 9->10-bit change)
        next_code += 1
        if next_code >= (1 << width) - 1 and width < 12:
            width += 1
    put(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# PackBits (Apple RLE, TIFF 6.0 §9).


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        h = data[i]
        i += 1
        if h < 128:                       # literal run of h+1 bytes
            if i + h + 1 > n:
                raise ValueError("invalid TIFF: PackBits literal overruns")
            out += data[i:i + h + 1]
            i += h + 1
        elif h > 128:                     # repeat next byte 257-h times
            if i >= n:
                raise ValueError("invalid TIFF: PackBits repeat overruns")
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: no-op
    if len(out) < expected:
        raise ValueError("invalid TIFF: PackBits strip shorter than "
                         "its raster")
    return bytes(out[:expected])


def _packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(row[i])
            i += run
            continue
        lit_start = i
        while i < n and (i - lit_start) < 128:
            nxt = 1
            while i + nxt < n and nxt < 3 and row[i + nxt] == row[i]:
                nxt += 1
            if nxt >= 3:
                break
            i += 1
        out.append(i - lit_start - 1)
        out += row[lit_start:i]
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder.


def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode a baseline TIFF to (H, W, C) uint8: RGB/RGBA pass through,
    grayscale is replicated to 3 channels (the RGB contract the other
    image decoders share). Both byte orders; strips; Compression
    none/PackBits/LZW/Deflate; Predictor 1/2. Tiles, 16-bit samples,
    palettes and planar=2 raise NotImplementedError."""
    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF payload (missing II/MM byte order)")
    bo = "<" if payload[:2] == b"II" else ">"
    (magic,) = struct.unpack_from(bo + "H", payload, 2)
    if magic != 42:
        raise ValueError("not a TIFF payload (magic != 42)")
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF payload (IFD offset out of range)")
    (n_entries,) = struct.unpack_from(bo + "H", payload, ifd_off)
    if ifd_off + 2 + 12 * n_entries > len(payload):
        raise ValueError("truncated TIFF payload (cut IFD)")

    tags: dict[int, list[int]] = {}
    for e in range(n_entries):
        off = ifd_off + 2 + 12 * e
        tag, typ, count = struct.unpack_from(bo + "HHI", payload, off)
        size = _TYPE_SIZES.get(typ, 0) * count
        if size == 0:
            continue
        if size <= 4:
            voff = off + 8
        else:
            (voff,) = struct.unpack_from(bo + "I", payload, off + 8)
            if voff + size > len(payload):
                raise ValueError("truncated TIFF payload (tag value "
                                 "beyond EOF)")
        if typ == 3:
            vals = list(struct.unpack_from(f"{bo}{count}H", payload, voff))
        elif typ == 4:
            vals = list(struct.unpack_from(f"{bo}{count}I", payload, voff))
        elif typ == 1:
            vals = list(payload[voff:voff + count])
        else:
            continue                      # rationals etc: not needed here
        tags[tag] = vals

    if _TAG_TILE_WIDTH in tags:
        raise NotImplementedError("tiled TIFF not supported (strip-based "
                                  "baseline only)")
    try:
        width = tags[_TAG_WIDTH][0]
        height = tags[_TAG_HEIGHT][0]
        offsets = tags[_TAG_STRIP_OFFSETS]
        counts = tags[_TAG_STRIP_COUNTS]
    except KeyError as exc:
        raise ValueError(
            f"invalid TIFF: required tag {exc.args[0]} missing") from None
    if width == 0 or height == 0:
        raise ValueError("invalid TIFF: zero ImageWidth/ImageLength")
    spp = tags.get(_TAG_SPP, [1])[0]
    bits = tags.get(_TAG_BITS, [8])
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    photo = tags.get(_TAG_PHOTOMETRIC, [1])[0]
    rows_per_strip = tags.get(_TAG_ROWS_PER_STRIP, [height])[0]
    planar = tags.get(_TAG_PLANAR, [1])[0]
    predictor = tags.get(_TAG_PREDICTOR, [1])[0]

    if any(b != 8 for b in bits):
        raise NotImplementedError("only 8-bit TIFF samples supported")
    if planar != 1:
        raise NotImplementedError("planar configuration 2 not supported")
    if photo == 3:
        raise NotImplementedError("palette TIFF not supported")
    if photo not in (0, 1, 2):
        raise NotImplementedError(f"photometric {photo} not supported")
    if spp not in (1, 3, 4):
        raise NotImplementedError(f"{spp} samples per pixel not supported")
    if predictor not in (1, 2):
        raise NotImplementedError(f"predictor {predictor} not supported")
    if len(offsets) != len(counts):
        raise ValueError("invalid TIFF: strip offsets/counts mismatch")
    if not 1 <= rows_per_strip:
        raise ValueError("invalid TIFF: bad RowsPerStrip")

    row_bytes = width * spp
    raster = bytearray()
    row_cursor = 0
    for si, (soff, scount) in enumerate(zip(offsets, counts)):
        if soff + scount > len(payload):
            raise ValueError("truncated TIFF payload (cut strip)")
        strip_rows = min(rows_per_strip, height - row_cursor)
        if strip_rows <= 0:
            break
        expected = strip_rows * row_bytes
        raw = payload[soff:soff + scount]
        if comp == 1:
            data = raw
        elif comp == 32773:
            data = _packbits_decode(raw, expected)
        elif comp == 5:
            data = _lzw_decode(raw, expected)
        elif comp == 8 or comp == 32946:
            # bounded decode (ADVICE r6): stop inflating at the declared
            # raster size like the LZW/PackBits paths — a small hostile
            # strip must not amplify to gigabytes before the length check
            try:
                dec = zlib.decompressobj()
                data = dec.decompress(raw, expected)
                if dec.decompress(dec.unconsumed_tail, 1) or dec.flush(1):
                    raise ValueError(
                        "invalid TIFF: Deflate strip decodes longer than "
                        "the declared strip size")
            except zlib.error as exc:
                raise ValueError(f"invalid TIFF: bad Deflate strip "
                                 f"({exc})") from None
        else:
            raise NotImplementedError(
                f"TIFF compression {comp} not supported (none/PackBits/"
                "LZW/Deflate decode natively; plug Pillow for "
                "JPEG-in-TIFF etc.)")
        if len(data) < expected:
            raise ValueError("invalid TIFF: strip decodes shorter than "
                             "its raster")
        raster += data[:expected]
        row_cursor += strip_rows
    if row_cursor < height:
        raise ValueError("invalid TIFF: strips cover fewer rows than "
                         "ImageLength")

    img = np.frombuffer(bytes(raster), np.uint8).reshape(height, width, spp)
    if predictor == 2:
        # horizontal differencing inverse: running sum mod 256 per row per
        # channel (int64 accumulator — uint16 would wrap for wide rows)
        img = (np.cumsum(img.astype(np.int64), axis=1)
               & 0xFF).astype(np.uint8)
    if photo == 0 and spp == 1:           # WhiteIsZero: invert
        img = 255 - img
    if spp == 1:
        return np.repeat(img, 3, axis=2)
    return img.copy()


# ---------------------------------------------------------------------------
# Encoder.


def encode_tiff(img: np.ndarray, *, compression: str = "none",
                predictor: bool = False,
                rows_per_strip: int = 0) -> bytes:
    """Encode (H, W[, 3|4]) or (H, W) uint8 to little-endian TIFF.
    ``compression`` ∈ {none, packbits, lzw, deflate}; ``predictor=True``
    applies horizontal differencing (Predictor 2 — only meaningful with
    lzw/deflate, where it helps smooth content); ``rows_per_strip=0``
    puts the whole image in one strip."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("image must be uint8")
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 3, 4):
        raise ValueError("image must be (H, W), (H, W, 3) or (H, W, 4)")
    h, w, spp = img.shape
    if h == 0 or w == 0:
        raise ValueError("image must be non-empty")
    comp_code = {"none": 1, "packbits": 32773, "lzw": 5,
                 "deflate": 8}.get(compression)
    if comp_code is None:
        raise ValueError(f"unknown compression {compression!r}")
    if predictor and compression in ("none", "packbits"):
        raise ValueError("predictor=True requires lzw or deflate "
                         "(TIFF 6.0 attaches Predictor to LZW; the "
                         "baseline codecs don't use it)")

    data = img
    if predictor:
        d = img.astype(np.int16)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        data = (d & 0xFF).astype(np.uint8)

    rps = rows_per_strip if rows_per_strip > 0 else h
    strips: list[bytes] = []
    for y0 in range(0, h, rps):
        chunk = data[y0:y0 + rps].tobytes()
        if comp_code == 1:
            strips.append(chunk)
        elif comp_code == 32773:
            # PackBits must not run across row boundaries (TIFF 6.0 §9)
            rb = w * spp
            enc = bytearray()
            for r in range(0, len(chunk), rb):
                enc += _packbits_encode(chunk[r:r + rb])
            strips.append(bytes(enc))
        elif comp_code == 5:
            strips.append(_lzw_encode(chunk))
        else:
            strips.append(zlib.compress(chunk, 6))

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        return struct.pack("<HHII", tag, typ, count, value)

    entries = []
    photometric = 1 if spp == 1 else 2
    n_strips = len(strips)
    # layout: header (8) + IFD + [BitsPerSample array for spp >= 3]
    #         + [strip offset/count arrays] + strips
    n_tags = 10 + (1 if predictor else 0) + (1 if spp == 4 else 0)
    ifd_size = 2 + 12 * n_tags + 4
    blob_base = 8 + ifd_size
    bits_size = 2 * spp if spp >= 3 else 0
    arrays_size = 8 * n_strips if n_strips > 1 else 0
    data_start = blob_base + bits_size + arrays_size
    extra = b""
    if spp >= 3:
        bits_val, bits_count = blob_base, spp
        extra += struct.pack(f"<{spp}H", *([8] * spp))
    else:
        bits_val, bits_count = 8, 1
    offs = []
    pos = data_start
    for s in strips:
        offs.append(pos)
        pos += len(s)
    if n_strips > 1:
        strip_off_pos = blob_base + bits_size
        strip_cnt_pos = strip_off_pos + 4 * n_strips
        extra += b"".join(struct.pack("<I", o) for o in offs) \
            + b"".join(struct.pack("<I", len(s)) for s in strips)
        so_val, sc_val = strip_off_pos, strip_cnt_pos
        so_count = sc_count = n_strips
    else:
        so_val, sc_val = offs[0], len(strips[0])
        so_count = sc_count = 1

    entries.append(entry(_TAG_WIDTH, 4, 1, w))
    entries.append(entry(_TAG_HEIGHT, 4, 1, h))
    entries.append(entry(_TAG_BITS, 3, bits_count, bits_val))
    entries.append(entry(_TAG_COMPRESSION, 3, 1, comp_code))
    entries.append(entry(_TAG_PHOTOMETRIC, 3, 1, photometric))
    entries.append(entry(_TAG_STRIP_OFFSETS, 4, so_count, so_val))
    entries.append(entry(_TAG_SPP, 3, 1, spp))
    entries.append(entry(_TAG_ROWS_PER_STRIP, 4, 1, rps))
    entries.append(entry(_TAG_STRIP_COUNTS, 4, sc_count, sc_val))
    entries.append(entry(_TAG_PLANAR, 3, 1, 1))
    if predictor:
        entries.append(entry(_TAG_PREDICTOR, 3, 1, 2))
    if spp == 4:
        # TIFF 6.0 requires ExtraSamples whenever samples exceed the
        # photometric's channels; 2 = unassociated alpha
        entries.append(entry(338, 3, 1, 2))
    entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])

    out = bytearray(b"II" + struct.pack("<HI", 42, 8))
    out += struct.pack("<H", n_tags)
    out += b"".join(entries)
    out += struct.pack("<I", 0)           # no next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)
