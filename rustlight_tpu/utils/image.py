"""HDR/LDR image I/O: PFM, EXR (minimal scanline codec), PNG/JPG via PIL.

Host-side (numpy) equivalents of the reference's Bitmap I/O
(src/structure.rs:467-683): PFM read/write, EXR via OpenEXR, LDR with gamma 2.2.
The EXR codec here is a self-contained pure-Python implementation of the EXR 2.0
scanline format (FLOAT/HALF; compression NONE, RLE, ZIPS, ZIP and PIZ — ZIP being
what Mitsuba/Blender/pbrt emit by default and PIZ OpenEXR's own wavelet default in
several DCC tools, so external reference images and envmap textures load without
a native OpenEXR dependency). PIZ rides the dual native-C++/pure-Python codec in
piz.py.
"""
from __future__ import annotations

import struct as _struct
import zlib as _zlib
from pathlib import Path

import numpy as np


# ----------------------------------------------------------------------------- PFM

def write_pfm(path, img: np.ndarray) -> None:
    """img [h, w, 3] float32, row 0 = top. PFM stores bottom-up, little-endian."""
    img = np.asarray(img, dtype=np.float32)
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(b"PF\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")  # negative scale => little endian
        f.write(np.flipud(img).astype("<f4").tobytes())


def read_pfm(path) -> np.ndarray:
    with open(path, "rb") as f:
        header = f.readline().strip()
        if header not in (b"PF", b"Pf"):
            raise ValueError(f"not a PFM file: {header!r}")
        channels = 3 if header == b"PF" else 1
        line = f.readline().strip()
        while line.startswith(b"#"):
            line = f.readline().strip()
        w, h = map(int, line.split())
        scale = float(f.readline().strip())
        dtype = "<f4" if scale < 0 else ">f4"
        data = np.frombuffer(f.read(w * h * channels * 4), dtype=dtype)
        img = data.reshape(h, w, channels).astype(np.float32)
        return np.flipud(img).copy()


# ----------------------------------------------------------------------------- EXR

def _exr_attr(name: bytes, typ: bytes, value: bytes) -> bytes:
    return name + b"\0" + typ + b"\0" + _struct.pack("<i", len(value)) + value


# compression enum (OpenEXR): 0=NONE, 1=RLE, 2=ZIPS (1 line), 3=ZIP (16 lines),
# 4=PIZ (32 lines), 5=PXR24 (16, decode only), 6=B44 / 7=B44A (32, decode
# only)
_EXR_LINES_PER_BLOCK = {0: 1, 1: 1, 2: 1, 3: 16, 4: 32, 5: 16, 6: 32, 7: 32}


def _rle_decode(src: bytes) -> bytes:
    """OpenEXR RLE (ImfRle.cpp): signed count byte c — c < 0 copies -c
    literal bytes, c >= 0 repeats the next byte c+1 times."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        c = src[i] - 256 if src[i] > 127 else src[i]
        i += 1
        if c < 0:
            out += src[i:i - c]
            i += -c
        else:
            out += src[i:i + 1] * (c + 1)
            i += 1
    return bytes(out)


def _rle_encode(src: bytes) -> bytes:
    """Simple valid RLE encoder (runs >= 3 as repeats, else literals)."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        run = 1
        while i + run < n and src[i + run] == src[i] and run < 128:
            run += 1
        if run >= 3:
            out.append(run - 1)
            out.append(src[i])
            i += run
        else:
            j = i + run
            while j < n and j - i < 127:
                nr = 1
                while j + nr < n and src[j + nr] == src[j] and nr < 3:
                    nr += 1
                if nr >= 3:
                    break
                j += nr
            out.append(256 - (j - i))
            out += src[i:j]
            i = j
    return bytes(out)


def _predict_interleave(t: np.ndarray) -> bytes:
    """Shared ZIP/RLE post-transform: undo the byte delta predictor, then
    interleave the two planar halves (ImfZip.cpp / ImfRle.cpp)."""
    p = ((np.cumsum(t.astype(np.int64) - 128) + 128) & 0xFF).astype(np.uint8)
    n = p.size
    half = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[0::2] = p[:half]
    out[1::2] = p[half:]
    return out.tobytes()


def _deinterleave_predict(raw: bytes) -> bytes:
    s = np.frombuffer(raw, np.uint8)
    n = s.size
    half = (n + 1) // 2
    planar = np.empty(n, np.uint8)
    planar[:half] = s[0::2]
    planar[half:] = s[1::2]
    d = planar.astype(np.int64)
    pred = np.empty(n, np.int64)
    pred[0] = d[0]
    pred[1:] = d[1:] - d[:-1] + 128
    return (pred & 0xFF).astype(np.uint8).tobytes()


def _zip_undo(payload: bytes) -> bytes:
    return _predict_interleave(
        np.frombuffer(_zlib.decompress(payload), np.uint8))


def _rle_undo(payload: bytes) -> bytes:
    return _predict_interleave(np.frombuffer(_rle_decode(payload), np.uint8))


def _zip_do(raw: bytes) -> bytes:
    """Inverse of _zip_undo: de-interleave halves, apply the delta
    predictor, deflate (ImfZip.cpp::compress)."""
    return _zlib.compress(_deinterleave_predict(raw))


def _rle_do(raw: bytes) -> bytes:
    return _rle_encode(_deinterleave_predict(raw))


def _piz_chans(channels, w: int, ny: int):
    """PIZ channel descriptors: (pixels per row, rows, u16 words per pixel)."""
    return [(w, ny, 1 if pt == 1 else 2) for _, pt in channels]


def _piz_do(raw: bytes, channels, w: int, ny: int) -> bytes:
    """Scanline-interleaved raw block -> PIZ payload (channel-planar inside)."""
    from . import piz as _piz
    chans = _piz_chans(channels, w, ny)
    words = np.frombuffer(raw, "<u2").reshape(ny, -1)
    # per scanline the channels sit side by side (alphabetical); split them
    # out into the per-channel planar order PIZ compresses
    widths = [nx * size for nx, _, size in chans]
    edges = np.cumsum([0] + widths)
    planar = np.concatenate(
        [words[:, edges[i]:edges[i + 1]].reshape(-1) for i in range(len(chans))])
    return _piz.piz_compress(planar, chans)


def _pxr24_undo(payload: bytes, channels, w: int, ny: int) -> bytes:
    """PXR24 decode (ImfPxr24Compressor.cpp::uncompress): inflate, then per
    scanline x channel the values ride as difference-coded MSB-first byte
    planes — 3 planes for FLOAT (the mantissa's low 8 bits were dropped on
    write: lossy), 2 for HALF, 4 for UINT. Returns the scanline-interleaved
    raw block."""
    data = np.frombuffer(_zlib.decompress(payload), np.uint8)
    pos = 0
    rows = []
    for _y in range(ny):
        row = []
        for _name, pt in channels:
            nb = {0: 4, 1: 2, 2: 3}[pt]        # UINT, HALF, FLOAT
            planes = [data[pos + k * w: pos + (k + 1) * w].astype(np.int64)
                      for k in range(nb)]
            pos += nb * w
            diff = np.zeros(w, np.int64)
            for p in planes:
                diff = (diff << 8) | p
            mask = (1 << (8 * nb)) - 1
            pix = np.cumsum(diff) & mask
            if pt == 1:
                row.append(pix.astype("<u2").view(np.uint8))
            elif pt == 2:
                row.append((pix << 8).astype("<u4").view(np.uint8))
            else:
                row.append(pix.astype("<u4").view(np.uint8))
        rows.append(np.concatenate(row))
    return np.concatenate(rows).tobytes()


def _b44_unpack14(b) -> np.ndarray:
    """One 14-byte 4x4 HALF tile -> 16 u16 (ImfB44Compressor::unpack14):
    s[0] absolute, the rest 6-bit biased deltas at a shared shift, chained
    along x then y."""
    s = np.zeros(16, np.int64)
    s[0] = (int(b[0]) << 8) | int(b[1])
    shift = int(b[2]) >> 2
    bias = 0x20 << shift
    b = [int(x) for x in b]
    s[4] = s[0] + ((((b[2] << 4) | (b[3] >> 4)) & 0x3f) << shift) - bias
    s[8] = s[4] + ((((b[3] << 2) | (b[4] >> 6)) & 0x3f) << shift) - bias
    s[12] = s[8] + ((b[4] & 0x3f) << shift) - bias
    s[1] = s[0] + ((b[5] >> 2) << shift) - bias
    s[5] = s[4] + ((((b[5] << 4) | (b[6] >> 4)) & 0x3f) << shift) - bias
    s[9] = s[8] + ((((b[6] << 2) | (b[7] >> 6)) & 0x3f) << shift) - bias
    s[13] = s[12] + ((b[7] & 0x3f) << shift) - bias
    s[2] = s[1] + ((b[8] >> 2) << shift) - bias
    s[6] = s[5] + ((((b[8] << 4) | (b[9] >> 4)) & 0x3f) << shift) - bias
    s[10] = s[9] + ((((b[9] << 2) | (b[10] >> 6)) & 0x3f) << shift) - bias
    s[14] = s[13] + ((b[10] & 0x3f) << shift) - bias
    s[3] = s[2] + ((b[11] >> 2) << shift) - bias
    s[7] = s[6] + ((((b[11] << 4) | (b[12] >> 4)) & 0x3f) << shift) - bias
    s[11] = s[10] + ((((b[12] << 2) | (b[13] >> 6)) & 0x3f) << shift) - bias
    s[15] = s[14] + ((b[13] & 0x3f) << shift) - bias
    return (s & 0xFFFF).astype(np.uint16)


def _b44_from_monotonic(s: np.ndarray) -> np.ndarray:
    """Invert the compressor's bit-pattern-monotonic half transform
    (positive: flag bit set; negative: all bits inverted)."""
    s = s.astype(np.uint16)
    return np.where(s & 0x8000, s & 0x7FFF, ~s).astype(np.uint16)


def _b44_undo(payload: bytes, channels, w: int, ny: int) -> bytes:
    """B44 / B44A decode (ImfB44Compressor.cpp::uncompress): channel-planar;
    HALF channels as 4x4 tiles of 14 bytes (or 3 bytes for B44A's constant
    tiles, marker b[2] == 0xfc), FLOAT/UINT channels stored raw. Returns
    the scanline-interleaved raw block."""
    data = np.frombuffer(payload, np.uint8)
    pos = 0
    chan_rows = []
    for _name, pt in channels:
        if pt != 1:                       # FLOAT / UINT ride uncompressed
            nb = w * ny * 4
            chan_rows.append(data[pos:pos + nb].reshape(ny, w * 4))
            pos += nb
            continue
        img = np.zeros((ny, w), np.uint16)
        for y0 in range(0, ny, 4):
            for x0 in range(0, w, 4):
                if data[pos + 2] == 0xFC:          # constant tile (B44A)
                    v = np.uint16((int(data[pos]) << 8) | int(data[pos + 1]))
                    s = np.full(16, v, np.uint16)
                    pos += 3
                else:
                    s = _b44_unpack14(data[pos:pos + 14])
                    pos += 14
                s = _b44_from_monotonic(s).reshape(4, 4)
                nr = min(4, ny - y0)
                nc = min(4, w - x0)
                img[y0:y0 + nr, x0:x0 + nc] = s[:nr, :nc]
        chan_rows.append(
            np.ascontiguousarray(img).view(np.uint8).reshape(ny, w * 2))
    return np.concatenate(
        [np.concatenate([cr[y] for cr in chan_rows]) for y in range(ny)]
    ).tobytes()


def _piz_undo(payload: bytes, channels, w: int, ny: int) -> bytes:
    from . import piz as _piz
    chans = _piz_chans(channels, w, ny)
    planar = _piz.piz_uncompress(payload, chans)
    parts, off = [], 0
    for nx, ny_, size in chans:
        parts.append(planar[off:off + nx * ny_ * size].reshape(ny_, nx * size))
        off += nx * ny_ * size
    return np.concatenate(parts, axis=1).astype("<u2").tobytes()


def write_exr(path, img: np.ndarray, half: bool = False,
              compression: str = "none") -> None:
    """Write [h, w, 3] float32 as a scanline EXR
    (compression: none|rle|zips|zip|piz)."""
    img = np.asarray(img, dtype=np.float32)
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = img[:, :, None]
    c = img.shape[2]
    names = ["Y"] if c == 1 else ["R", "G", "B"]  # names[j] = EXR channel of img column j
    pix_t = 1 if half else 2  # 1 = HALF, 2 = FLOAT
    dtype = np.float16 if half else np.float32
    comp = {"none": 0, "rle": 1, "zips": 2, "zip": 3, "piz": 4}[compression]
    lpb = _EXR_LINES_PER_BLOCK[comp]

    chlist = b""
    for n in sorted(names):
        chlist += n.encode() + b"\0" + _struct.pack("<iiii", pix_t, 0, 1, 1)
    chlist += b"\0"

    header = b"\x76\x2f\x31\x01" + _struct.pack("<i", 2)  # magic + version 2
    header += _exr_attr(b"channels", b"chlist", chlist)
    header += _exr_attr(b"compression", b"compression", bytes([comp]))
    box = _struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header += _exr_attr(b"dataWindow", b"box2i", box)
    header += _exr_attr(b"displayWindow", b"box2i", box)
    header += _exr_attr(b"lineOrder", b"lineOrder", b"\0")  # INCREASING_Y
    header += _exr_attr(b"pixelAspectRatio", b"float", _struct.pack("<f", 1.0))
    header += _exr_attr(b"screenWindowCenter", b"v2f", _struct.pack("<ff", 0.0, 0.0))
    header += _exr_attr(b"screenWindowWidth", b"float", _struct.pack("<f", 1.0))
    header += b"\0"

    # channel order in each scanline block is alphabetical
    order = [names.index(n) for n in sorted(names)]
    blocks = []
    for y0 in range(0, h, lpb):
        ny = min(lpb, h - y0)
        raw = b"".join(
            img[y][:, j].astype(dtype).tobytes()
            for y in range(y0, y0 + ny) for j in order)
        if comp == 4:
            z = _piz_do(raw, [(n, pix_t) for n in sorted(names)], w, ny)
            payload = z if len(z) < len(raw) else raw   # OpenEXR raw fallback
        elif comp:
            z = _rle_do(raw) if comp == 1 else _zip_do(raw)
            payload = z if len(z) < len(raw) else raw   # OpenEXR raw fallback
        else:
            payload = raw
        blocks.append(_struct.pack("<ii", y0, len(payload)) + payload)
    table_off = len(header) + 8 * len(blocks)
    offsets, acc = [], table_off
    for b in blocks:
        offsets.append(acc)
        acc += len(b)
    with open(path, "wb") as f:
        f.write(header + _struct.pack("<%dQ" % len(blocks), *offsets)
                + b"".join(blocks))


def read_exr(path) -> np.ndarray:
    """Read a scanline EXR (NONE/RLE/ZIPS/ZIP/PIZ compression)."""
    data = Path(path).read_bytes()
    if data[:4] != b"\x76\x2f\x31\x01":
        raise ValueError("not an EXR file")
    pos = 8
    channels, comp, dw = [], None, None
    while data[pos] != 0:
        nul = data.index(b"\0", pos)
        name = data[pos:nul]; pos = nul + 1
        nul = data.index(b"\0", pos)
        typ = data[pos:nul]; pos = nul + 1
        (size,) = _struct.unpack_from("<i", data, pos); pos += 4
        val = data[pos:pos + size]; pos += size
        if name == b"channels":
            cp = 0
            while val[cp] != 0:
                cn = val.index(b"\0", cp)
                cname = val[cp:cn].decode(); cp = cn + 1
                pt, _, _, _ = _struct.unpack_from("<iiii", val, cp); cp += 16
                channels.append((cname, pt))
        elif name == b"compression":
            comp = val[0]
        elif name == b"dataWindow":
            dw = _struct.unpack("<iiii", val)
    pos += 1  # header terminator
    if comp not in _EXR_LINES_PER_BLOCK:
        raise NotImplementedError(
            f"EXR compression {comp} unsupported (read: NONE/RLE/ZIPS/ZIP/"
            f"PIZ/PXR24/B44/B44A; DWAA/DWAB not implemented)")
    lpb = _EXR_LINES_PER_BLOCK[comp]
    x0, y0, x1, y1 = dw
    w, h = x1 - x0 + 1, y1 - y0 + 1
    n_blocks = (h + lpb - 1) // lpb
    offsets = _struct.unpack_from("<%dQ" % n_blocks, data, pos)
    line_bytes = sum(w * (2 if pt == 1 else 4) for _, pt in channels)
    out = np.zeros((h, w, len(channels)), dtype=np.float32)
    for off in offsets:
        y, n = _struct.unpack_from("<ii", data, off)
        ny = min(lpb, y1 - y + 1)
        raw_len = ny * line_bytes
        payload = data[off + 8:off + 8 + n]
        if comp and n < raw_len:
            if comp == 4:
                blk = _piz_undo(payload, channels, w, ny)
            elif comp == 1:
                blk = _rle_undo(payload)
            elif comp == 5:
                blk = _pxr24_undo(payload, channels, w, ny)
            elif comp in (6, 7):
                blk = _b44_undo(payload, channels, w, ny)
            else:
                blk = _zip_undo(payload)
        else:
            blk = payload
        p = 0
        for yy in range(y - y0, y - y0 + ny):
            for ci, (cname, pt) in enumerate(channels):
                bpp = 2 if pt == 1 else 4
                dt = np.float16 if pt == 1 else np.float32
                out[yy, :, ci] = np.frombuffer(
                    blk[p:p + w * bpp],
                    dtype="<" + dt().dtype.str[1:]).astype(np.float32)
                p += w * bpp
    names = [c[0] for c in channels]
    if names == ["B", "G", "R"]:
        out = out[:, :, ::-1]
    return out


# ----------------------------------------------------------------------------- LDR

def tonemap_gamma(img: np.ndarray, gamma: float = 2.2) -> np.ndarray:
    """HDR -> 8-bit with gamma 2.2, mirrors reference save_ldr_image (structure.rs:160-168)."""
    img = np.clip(np.asarray(img, dtype=np.float32), 0.0, None)
    return (np.clip(img ** (1.0 / gamma), 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def write_ldr(path, img: np.ndarray, gamma: float = 2.2) -> None:
    from PIL import Image
    Image.fromarray(tonemap_gamma(img, gamma)).save(path)


def read_ldr(path) -> np.ndarray:
    """Read PNG/JPG to linear float32 (inverse gamma 2.2), [h, w, 3]."""
    from PIL import Image
    arr = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
    return arr ** 2.2


def save(path, img: np.ndarray) -> None:
    """Save by extension: .pfm/.exr/.png/.jpg (reference Bitmap::save)."""
    ext = Path(path).suffix.lower()
    if ext == ".pfm":
        write_pfm(path, img)
    elif ext == ".exr":
        write_exr(path, img)
    elif ext in (".png", ".jpg", ".jpeg", ".bmp"):
        write_ldr(path, img)
    else:
        raise ValueError(f"unsupported image extension {ext}")


def load(path) -> np.ndarray:
    ext = Path(path).suffix.lower()
    if ext == ".pfm":
        return read_pfm(path)
    if ext == ".exr":
        return read_exr(path)
    return read_ldr(path)
