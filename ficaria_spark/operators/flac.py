"""FLAC codec in pure stdlib + numpy — no libFLAC/soundfile.

Implements the public FLAC format (RFC 9639): STREAMINFO metadata, frame
headers with CRC-8 / frame CRC-16 verification, UTF-8-coded frame numbers,
all four subframe types (CONSTANT, VERBATIM, FIXED orders 0–4, LPC up to
order 32), wasted-bits shifting, Rice/Rice2 residual partitions with the
escape (raw) path, and all four channel assignments (independent,
left/side, right/side, mid/side).

The encoder emits a spec-conformant subset chosen to exercise every
decoder path in round-trip tests: per-subframe CONSTANT detection,
best-of fixed orders 0–4 with exact Rice cost, VERBATIM fallback,
wasted-bits detection, selectable stereo decorrelation, partition orders,
and a force-escape knob. Lossless: decode(encode(pcm)) == pcm exactly,
including the STREAMINFO MD5 of the unencoded signal.

Extends the audio half of the media family (multimodal.decode_wav
dispatches ``fLaC`` payloads here) the way operators/webp.py extended the
image half — the reference engine (szostkawron/ficaria) treats media as
opaque binaries; this is training-data-pipeline surface with no reference
counterpart.
"""
from __future__ import annotations

import hashlib
import struct

import numpy as np

_SYNC_FIXED = 0xFFF8

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

# frame-header blocksize codes 2..5 and 8..15 (RFC 9639 §9.1.1)
_BLOCKSIZE_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5, 256: 8,
                    512: 9, 1024: 10, 2048: 11, 4096: 12, 8192: 13,
                    16384: 14, 32768: 15}
_SAMPLE_SIZE_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_LPC_PRECISION = 12


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _Reader:
    """MSB-first bit reader with truncated accumulator (bounded bignum)."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bits(self, n: int) -> int:
        while self._n < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC payload (bitstream ends "
                                 "mid-frame)")
            self._acc = (self._acc << 8) | self.data[self.pos]
            self.pos += 1
            self._n += 8
        self._n -= n
        v = self._acc >> self._n
        self._acc &= (1 << self._n) - 1
        return v

    def signed(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("invalid FLAC: runaway unary code")
        return q

    def align(self) -> None:
        self._acc = 0
        self._n = 0

    def byte_pos(self) -> int:
        """Current position in whole bytes (only valid when aligned)."""
        return self.pos - (self._n // 8)


class _Writer:
    """MSB-first bit writer with truncated accumulator."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, v: int, n: int) -> None:
        self._acc = (self._acc << n) | (v & ((1 << n) - 1))
        self._n += n
        while self._n >= 8:
            self._n -= 8
            self.out.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def put_signed(self, v: int, n: int) -> None:
        self.put(v & ((1 << n) - 1), n)

    def put_unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)      # q zeros then a one

    def align(self) -> None:
        if self._n:
            self.put(0, 8 - self._n)


def _utf8_number(n: int) -> bytes:
    """FLAC's extended UTF-8 coding for frame/sample numbers (≤ 36 bits)."""
    if n < 0x80:
        return bytes([n])
    for nbytes, lead in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8),
                         (6, 0xFC), (7, 0xFE)):
        if n < 1 << (nbytes * 5 + 1 if nbytes < 7 else 36):
            out = bytearray([lead | (n >> (6 * (nbytes - 1)))
                             if nbytes < 7 else lead])
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number out of UTF-8 coding range")


def _read_utf8_number(br: _Reader) -> int:
    first = br.bits(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("invalid FLAC: bad UTF-8-coded number")
    n = first & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = br.bits(8)
        if b & 0xC0 != 0x80:
            raise ValueError("invalid FLAC: bad UTF-8 continuation byte")
        n = (n << 6) | (b & 0x3F)
    return n


# ---------------------------------------------------------------------------
# Decoder.


def _decode_residual(br: _Reader, blocksize: int, order: int) -> np.ndarray:
    method = br.bits(2)
    if method > 1:
        raise ValueError("invalid FLAC: reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.bits(4)
    nparts = 1 << porder
    # RFC 9639: blocksize must divide evenly into partitions AND the
    # per-partition sample count must exceed the predictor order
    if blocksize % nparts or (blocksize >> porder) <= order:
        raise ValueError("invalid FLAC: bad residual partition order")
    out = np.empty(blocksize - order, np.int64)
    idx = 0
    for p in range(nparts):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        param = br.bits(pbits)
        if param == escape:
            raw_bits = br.bits(5)
            for i in range(count):
                out[idx + i] = br.signed(raw_bits) if raw_bits else 0
        else:
            for i in range(count):
                q = br.unary()
                u = (q << param) | br.bits(param)
                out[idx + i] = (u >> 1) ^ -(u & 1)       # zigzag
        idx += count
    return out


def _decode_subframe(br: _Reader, blocksize: int, bps: int) -> np.ndarray:
    if br.bits(1):
        raise ValueError("invalid FLAC: subframe padding bit set")
    stype = br.bits(6)
    wasted = 0
    if br.bits(1):
        wasted = br.unary() + 1
        bps -= wasted
        if bps <= 0:
            raise ValueError("invalid FLAC: wasted bits exceed sample size")
    if stype == 0:                          # CONSTANT
        out = np.full(blocksize, br.signed(bps), np.int64)
    elif stype == 1:                        # VERBATIM
        out = np.array([br.signed(bps) for _ in range(blocksize)], np.int64)
    elif 8 <= stype <= 12:                  # FIXED order 0-4
        order = stype - 8
        if order > blocksize:
            raise ValueError("invalid FLAC: fixed order exceeds block size")
        warm = [br.signed(bps) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        out = np.empty(blocksize, np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFFS[order]
        for i in range(order, blocksize):
            out[i] = resid[i - order] + sum(
                c * out[i - 1 - j] for j, c in enumerate(coefs))
    elif stype >= 32:                       # LPC
        order = (stype & 31) + 1
        if order > blocksize:
            raise ValueError("invalid FLAC: LPC order exceeds block size")
        warm = [br.signed(bps) for _ in range(order)]
        precision = br.bits(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC: reserved LPC precision")
        shift = br.signed(5)
        if shift < 0:
            raise ValueError("invalid FLAC: negative LPC shift")
        qlp = [br.signed(precision) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        out = np.empty(blocksize, np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            acc = 0
            for j in range(order):
                acc += qlp[j] * int(out[i - 1 - j])
            out[i] = resid[i - order] + (acc >> shift)
    else:
        raise ValueError(f"invalid FLAC: reserved subframe type {stype}")
    if wasted:
        out = out << wasted
    return out


def decode_flac(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a FLAC payload to ((n_samples, n_channels) int32,
    sample_rate, bits_per_sample). Verifies the per-frame header CRC-8 and
    frame CRC-16 (typed ValueError on mismatch). Supports every subframe
    type, wasted bits, Rice/Rice2 + escape residuals, and all stereo
    decorrelation modes. ID3-prefixed files and Ogg-FLAC are not
    supported (plug soundfile/libFLAC for those)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC magic)")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC payload (cut metadata header)")
        header = payload[pos]
        (length,) = struct.unpack(">I", b"\x00" + payload[pos + 1:pos + 4])
        body = payload[pos + 4: pos + 4 + length]
        if len(body) < length:
            raise ValueError("truncated FLAC payload (cut metadata block)")
        if (header & 0x7F) == 0:
            if length < 34:
                raise ValueError("invalid FLAC: STREAMINFO too short")
            packed = int.from_bytes(body[10:18], "big")
            streaminfo = {
                "min_blocksize": struct.unpack(">H", body[0:2])[0],
                "max_blocksize": struct.unpack(">H", body[2:4])[0],
                "sample_rate": packed >> 44,
                "channels": ((packed >> 41) & 0x7) + 1,
                "bps": ((packed >> 36) & 0x1F) + 1,
                "total_samples": packed & ((1 << 36) - 1),
                "md5": body[18:34],
            }
        pos += 4 + length
        if header & 0x80:
            break
    if streaminfo is None:
        raise ValueError("invalid FLAC: no STREAMINFO block")

    channels_out: list[list[np.ndarray]] = []
    total = 0
    while pos + 2 <= len(payload):
        frame_start = pos
        br = _Reader(payload, pos)
        sync = br.bits(14)
        if sync != 0x3FFE:
            raise ValueError("invalid FLAC: lost frame sync")
        if br.bits(1):
            raise ValueError("invalid FLAC: reserved frame-header bit set")
        br.bits(1)                          # blocking strategy
        bs_code = br.bits(4)
        sr_code = br.bits(4)
        ch_code = br.bits(4)
        ss_code = br.bits(3)
        if br.bits(1):
            raise ValueError("invalid FLAC: reserved frame-header bit set")
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("invalid FLAC: reserved block-size code")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = br.bits(8) + 1
        elif bs_code == 7:
            blocksize = br.bits(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 12:
            br.bits(8)
        elif sr_code in (13, 14):
            br.bits(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC: invalid sample-rate code")
        if ss_code == 0:
            bps = streaminfo["bps"]
        else:
            rev = {v: k for k, v in _SAMPLE_SIZE_CODES.items()}
            if ss_code not in rev:
                raise ValueError("invalid FLAC: reserved sample-size code")
            bps = rev[ss_code]
        header_end = br.byte_pos()
        crc8 = br.bits(8)
        if _crc8(payload[frame_start:header_end]) != crc8:
            raise ValueError("invalid FLAC: frame header CRC-8 mismatch")

        if ch_code <= 7:
            nch = ch_code + 1
            subs = [_decode_subframe(br, blocksize, bps)
                    for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            nch = 2
            if ch_code == 8:                # left/side
                left = _decode_subframe(br, blocksize, bps)
                side = _decode_subframe(br, blocksize, bps + 1)
                subs = [left, left - side]
            elif ch_code == 9:              # right/side
                side = _decode_subframe(br, blocksize, bps + 1)
                right = _decode_subframe(br, blocksize, bps)
                subs = [right + side, right]
            else:                           # mid/side
                mid = _decode_subframe(br, blocksize, bps)
                side = _decode_subframe(br, blocksize, bps + 1)
                m2 = (mid << 1) | (side & 1)
                subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError("invalid FLAC: reserved channel assignment")
        br.align()
        body_end = br.byte_pos()
        crc16 = br.bits(16)
        if _crc16(payload[frame_start:body_end]) != crc16:
            raise ValueError("invalid FLAC: frame CRC-16 mismatch")
        pos = br.byte_pos()
        channels_out.append(subs)
        total += blocksize
        if streaminfo["total_samples"] and \
                total >= streaminfo["total_samples"]:
            break
    if not channels_out:
        raise ValueError("invalid FLAC: no audio frames")
    if streaminfo["total_samples"] and total < streaminfo["total_samples"]:
        # a payload cut at a frame boundary parses cleanly but short —
        # STREAMINFO knows the real length, so fail loudly, never return
        # a silently truncated signal
        raise ValueError(
            f"truncated FLAC payload ({total} of "
            f"{streaminfo['total_samples']} samples decoded)")
    nch = len(channels_out[0])
    if any(len(f) != nch for f in channels_out):
        raise ValueError("invalid FLAC: channel count changed mid-stream")
    pcm = np.stack(
        [np.concatenate([f[c] for f in channels_out]) for c in range(nch)],
        axis=1)
    want = streaminfo["total_samples"]
    if want:
        pcm = pcm[:want]
    return pcm.astype(np.int32), streaminfo["sample_rate"], streaminfo["bps"]


# ---------------------------------------------------------------------------
# Encoder.


def _rice_cost(resid: np.ndarray, param: int) -> int:
    u = (np.abs(resid) * 2 - (resid < 0)).astype(np.int64)
    return int((u >> param).sum()) + len(u) * (1 + param)


def _best_rice_param(resid: np.ndarray) -> tuple[int, int]:
    best_p, best_c = 0, _rice_cost(resid, 0)
    for p in range(1, 15):
        c = _rice_cost(resid, p)
        if c < best_c:
            best_p, best_c = p, c
    return best_p, best_c


def _write_residual(bw: _Writer, resid: np.ndarray, blocksize: int,
                    order: int, partition_order: int,
                    force_escape: bool) -> None:
    nparts = 1 << partition_order
    bw.put(0, 2)                            # Rice method 0 (4-bit params)
    bw.put(partition_order, 4)
    idx = 0
    for p in range(nparts):
        count = (blocksize >> partition_order) - (order if p == 0 else 0)
        part = resid[idx: idx + count]
        idx += count
        if force_escape:
            mx = int(np.abs(part).max()) if len(part) else 0
            raw = max(2, mx.bit_length() + 1)   # signed width, min 2
            if raw <= 31:                   # 5-bit field: 31 is the widest
                bw.put(0xF, 4)              # escape
                bw.put(raw, 5)
                for v in part:
                    bw.put_signed(int(v), raw)
                continue
            # residuals too wide for an escape partition: fall back to
            # Rice for this partition (force_escape is a test pin, and a
            # truncated width would corrupt the stream)
        param, _ = _best_rice_param(part) if len(part) else (0, 0)
        bw.put(param, 4)
        for v in part:
            v = int(v)
            u = (abs(v) << 1) - (1 if v < 0 else 0)   # zigzag
            bw.put_unary(u >> param)
            if param:
                bw.put(u & ((1 << param) - 1), param)


def _quantized_lpc(s: np.ndarray, order: int,
                   precision: int = 12) -> tuple[list[int], int] | None:
    """Levinson-Durbin LPC coefficients quantized to `precision` bits with
    a shift. Lossless reconstruction never depends on coefficient quality
    (the residual is exact by construction), so numerical corner cases
    just return None and the caller falls back to fixed prediction."""
    x = s.astype(np.float64)
    n = len(x)
    if n <= order + 1 or not np.any(x):
        return None
    ac = np.array([np.dot(x[: n - k], x[k:]) for k in range(order + 1)])
    if ac[0] <= 0 or not np.all(np.isfinite(ac)):
        return None
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - np.dot(a[:i], ac[i:0:-1][:i])
        if err <= 0:
            return None
        k = acc / err
        a[:i], a[i] = a[:i] - k * a[i - 1::-1][:i].copy(), k
        err *= 1 - k * k
    if not np.all(np.isfinite(a)) or np.abs(a).max() == 0:
        return None
    # quantize: shift so the largest |coef| uses the full precision
    cmax = np.abs(a).max()
    shift = precision - 1 - max(0, int(np.floor(np.log2(cmax))) + 1)
    shift = min(15, max(0, shift))
    q = np.round(a * (1 << shift)).astype(np.int64)
    lim = 1 << (precision - 1)
    q = np.clip(q, -lim, lim - 1)
    if not np.any(q):
        return None
    return [int(v) for v in q], shift


def _write_subframe(bw: _Writer, samples: np.ndarray, bps: int, *,
                    partition_order: int, force_escape: bool,
                    force_verbatim: bool, lpc_order: int = 0) -> None:
    n = len(samples)
    # wasted-bits detection: common trailing zero bits across the subframe
    wasted = 0
    if np.any(samples):
        ors = int(np.bitwise_or.reduce(samples.astype(np.int64)) &
                  ((1 << 63) - 1))
        while wasted < bps - 1 and not ors & (1 << wasted):
            wasted += 1
        samples = samples >> wasted
        bps -= wasted
    if np.all(samples == samples[0]) and not force_verbatim:
        bw.put(0, 1)
        bw.put(0, 6)                        # CONSTANT
        _put_wasted(bw, wasted)
        bw.put_signed(int(samples[0]), bps)
        return
    best = None          # (kind, order, resid, cost, extra)
    if not force_verbatim:
        s = samples.astype(np.int64)
        for order, coefs in _FIXED_COEFFS.items():
            if order >= n or (n >> partition_order) <= order:
                break       # partition-order constraint (RFC 9639)
            resid = s[order:].copy()
            for j, c in enumerate(coefs):
                resid -= c * s[order - 1 - j: n - 1 - j]
            _, cost = _best_rice_param(resid)
            cost += order * bps
            if best is None or cost < best[3]:
                best = ("fixed", order, resid, cost, None)
        if lpc_order and n > lpc_order + 1 \
                and (n >> partition_order) > lpc_order:
            ql = _quantized_lpc(s, lpc_order)
            if ql is not None:
                qlp, shift = ql
                order = lpc_order
                acc = np.zeros(n - order, np.int64)
                for j in range(order):
                    acc += qlp[j] * s[order - 1 - j: n - 1 - j]
                resid = s[order:] - (acc >> shift)   # exact by construction
                _, cost = _best_rice_param(resid)
                cost += order * bps + 9 + order * _LPC_PRECISION
                if cost < best[3]:
                    best = ("lpc", order, resid, cost, (qlp, shift))
    if best is None or best[3] >= n * bps:
        bw.put(0, 1)
        bw.put(1, 6)                        # VERBATIM
        _put_wasted(bw, wasted)
        for v in samples:
            bw.put_signed(int(v), bps)
        return
    kind, order, resid, _cost, extra = best
    bw.put(0, 1)
    if kind == "fixed":
        bw.put(8 + order, 6)                # FIXED
        _put_wasted(bw, wasted)
        for v in samples[:order]:
            bw.put_signed(int(v), bps)
    else:
        qlp, shift = extra
        bw.put(32 + order - 1, 6)           # LPC
        _put_wasted(bw, wasted)
        for v in samples[:order]:
            bw.put_signed(int(v), bps)
        bw.put(_LPC_PRECISION - 1, 4)
        bw.put_signed(shift, 5)
        for c in qlp:
            bw.put_signed(c, _LPC_PRECISION)
    _write_residual(bw, resid, n, order, partition_order, force_escape)


def _put_wasted(bw: _Writer, wasted: int) -> None:
    if wasted:
        bw.put(1, 1)
        bw.put_unary(wasted - 1)
    else:
        bw.put(0, 1)


def encode_flac(pcm: np.ndarray, rate: int, *, bps: int = 16,
                block_size: int = 4096, stereo_mode: str = "independent",
                partition_order: int = 0, lpc_order: int = 0,
                force_escape: bool = False,
                force_verbatim: bool = False) -> bytes:
    """Encode (n_samples[, n_channels]) int PCM to a FLAC payload.
    Lossless and deterministic; the STREAMINFO MD5 is the RFC 9639 MD5 of
    the little-endian interleaved signal. ``stereo_mode`` ∈ {independent,
    left_side, right_side, mid_side} (decorrelation modes require exactly
    2 channels); ``partition_order`` splits each residual into 2^k Rice
    partitions; ``lpc_order`` (0 = fixed-prediction only, 1..32) also
    tries a Levinson-Durbin LPC subframe and keeps whichever codes
    smaller — reconstruction is exact for ANY quantized coefficients, so
    losslessness never depends on the model fit;
    ``force_escape``/``force_verbatim`` exist so tests can pin the
    escape-partition and verbatim decoder paths."""
    pcm = np.asarray(pcm)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    if pcm.ndim != 2 or pcm.shape[0] == 0:
        raise ValueError("pcm must be (n_samples[, n_channels]) non-empty")
    n, nch = pcm.shape
    if not 1 <= nch <= 8:
        raise ValueError("FLAC supports 1..8 channels")
    if bps not in _SAMPLE_SIZE_CODES:
        raise ValueError(f"bps must be one of {sorted(_SAMPLE_SIZE_CODES)}")
    if stereo_mode != "independent" and nch != 2:
        raise ValueError("stereo decorrelation requires exactly 2 channels")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if pcm.min() < lo or pcm.max() > hi:
        raise ValueError(f"samples out of range for bps={bps}")
    if not 0 <= partition_order <= 7:
        raise ValueError("partition_order must be in 0..7")
    if not 0 <= lpc_order <= 32:
        raise ValueError("lpc_order must be in 0..32")
    if not 1 <= block_size <= 65535:
        raise ValueError("block_size must be in 1..65535 (16-bit frame "
                         "header field)")
    if not 1 <= rate < 1 << 20:
        raise ValueError("sample rate must be in 1..2^20-1 (20-bit "
                         "STREAMINFO field)")

    pcm = pcm.astype(np.int64)
    md5 = hashlib.md5()
    width = (bps + 7) // 8
    # RFC MD5 of the interleaved little-endian signed signal, vectorized:
    # whole-byte widths map straight to an int dtype; 3-byte widths are
    # the low 3 bytes of the <i4 two's-complement representation
    inter = pcm.reshape(-1)
    if width == 3:
        md5.update(inter.astype("<i4").view(np.uint8)
                   .reshape(-1, 4)[:, :3].tobytes())
    else:
        md5.update(inter.astype(f"<i{width}").tobytes())

    frames = bytearray()
    frame_no = 0
    for start in range(0, n, block_size):
        block = pcm[start:start + block_size]
        bs = len(block)
        bw = _Writer()
        bw.put(0x3FFE, 14)                  # sync
        bw.put(0, 1)
        bw.put(0, 1)                        # fixed blocking strategy
        bs_code = _BLOCKSIZE_CODES.get(bs, 7)
        bw.put(bs_code, 4)
        bw.put(0, 4)                        # sample rate from STREAMINFO
        if stereo_mode == "independent":
            bw.put(nch - 1, 4)
        else:
            bw.put({"left_side": 8, "right_side": 9,
                    "mid_side": 10}[stereo_mode], 4)
        bw.put(_SAMPLE_SIZE_CODES[bps], 3)
        bw.put(0, 1)
        for b in _utf8_number(frame_no):
            bw.put(b, 8)
        if bs_code == 7:
            bw.put(bs - 1, 16)
        header = bytes(bw.out)              # bit-aligned here by layout
        assert bw._n == 0
        bw.put(_crc8(header), 8)

        kw = dict(partition_order=min(partition_order,
                                      max(0, bs.bit_length() - 3)),
                  lpc_order=lpc_order,
                  force_escape=force_escape, force_verbatim=force_verbatim)
        if bs % (1 << kw["partition_order"]):
            kw["partition_order"] = 0
        if stereo_mode == "independent":
            for c in range(nch):
                _write_subframe(bw, block[:, c], bps, **kw)
        else:
            left, right = block[:, 0], block[:, 1]
            side = left - right
            if stereo_mode == "left_side":
                _write_subframe(bw, left, bps, **kw)
                _write_subframe(bw, side, bps + 1, **kw)
            elif stereo_mode == "right_side":
                _write_subframe(bw, side, bps + 1, **kw)
                _write_subframe(bw, right, bps, **kw)
            else:
                mid = (left + right) >> 1
                _write_subframe(bw, mid, bps, **kw)
                _write_subframe(bw, side, bps + 1, **kw)
        bw.align()
        body = bytes(bw.out)
        frames += body + struct.pack(">H", _crc16(body))
        frame_no += 1

    packed = (rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | n
    si = (struct.pack(">HH", min(block_size, n), min(block_size, n))
          + b"\x00\x00\x00" * 2
          + packed.to_bytes(8, "big") + md5.digest())
    meta = bytes([0x80]) + len(si).to_bytes(3, "big") + si
    return b"fLaC" + meta + bytes(frames)
