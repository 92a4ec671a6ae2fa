"""HDR/LDR image I/O: PFM, EXR (minimal scanline codec), PNG/JPG via PIL.

Host-side (numpy) equivalents of the reference's Bitmap I/O
(src/structure.rs:467-683): PFM read/write, EXR via OpenEXR, LDR with gamma 2.2.
The EXR codec here is a self-contained pure-Python implementation of the EXR 2.0
scanline format (FLOAT/HALF, compression=NONE) — enough for the renderer's own
round-trips and external viewers; no native OpenEXR dependency.
"""
from __future__ import annotations

import struct as _struct
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


def write_exr(path, img: np.ndarray, half: bool = False) -> None:
    """Write [h, w, 3] float32 as an uncompressed scanline EXR (channels B,G,R)."""
    img = np.asarray(img, dtype=np.float32)
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = img[:, :, None]
    c = img.shape[2]
    names = ["Y"] if c == 1 else ["R", "G", "B"]  # names[j] = EXR channel of img column j
    pix_t = 1 if half else 2  # 1 = HALF, 2 = FLOAT
    dtype = np.float16 if half else np.float32

    chlist = b""
    for n in sorted(names):
        chlist += n.encode() + b"\0" + _struct.pack("<iiii", pix_t, 0, 1, 1)
    chlist += b"\0"

    header = b"\x76\x2f\x31\x01" + _struct.pack("<i", 2)  # magic + version 2
    header += _exr_attr(b"channels", b"chlist", chlist)
    header += _exr_attr(b"compression", b"compression", b"\0")  # NONE
    box = _struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header += _exr_attr(b"dataWindow", b"box2i", box)
    header += _exr_attr(b"displayWindow", b"box2i", box)
    header += _exr_attr(b"lineOrder", b"lineOrder", b"\0")  # INCREASING_Y
    header += _exr_attr(b"pixelAspectRatio", b"float", _struct.pack("<f", 1.0))
    header += _exr_attr(b"screenWindowCenter", b"v2f", _struct.pack("<ff", 0.0, 0.0))
    header += _exr_attr(b"screenWindowWidth", b"float", _struct.pack("<f", 1.0))
    header += b"\0"

    bpp = 2 if half else 4
    row_bytes = 8 + w * bpp * c
    table_off = len(header) + 8 * h
    offsets = _struct.pack("<%dQ" % h, *[table_off + y * row_bytes for y in range(h)])

    # channel order in each scanline block is alphabetical
    order = [names.index(n) for n in sorted(names)]
    rows = []
    for y in range(h):
        row = img[y]
        payload = b"".join(row[:, j].astype(dtype).tobytes() for j in order)
        rows.append(_struct.pack("<ii", y, len(payload)) + payload)
    with open(path, "wb") as f:
        f.write(header + offsets + b"".join(rows))


def read_exr(path) -> np.ndarray:
    """Read an uncompressed scanline EXR written by `write_exr` (or compatible)."""
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
    if comp != 0:
        raise NotImplementedError("only compression=NONE supported")
    x0, y0, x1, y1 = dw
    w, h = x1 - x0 + 1, y1 - y0 + 1
    offsets = _struct.unpack_from("<%dQ" % h, data, pos)
    out = np.zeros((h, w, len(channels)), dtype=np.float32)
    for yi, off in enumerate(offsets):
        y, _n = _struct.unpack_from("<ii", data, off)
        p = off + 8
        for ci, (cname, pt) in enumerate(channels):
            bpp = 2 if pt == 1 else 4
            dt = np.float16 if pt == 1 else np.float32
            out[y - y0, :, ci] = np.frombuffer(data[p:p + w * bpp], dtype="<" + dt().dtype.str[1:]).astype(np.float32)
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
