"""Windows BMP codec (pure stdlib) — the uncompressed desktop format.

Implements the public BITMAPFILEHEADER + BITMAPINFOHEADER layout
(Windows GDI, documented in the public Win32 file-format references):
24-bit BI_RGB pixels, BGR sample order, rows padded to 4-byte
boundaries, bottom-up by default (positive biHeight) with the top-down
negative-height variant accepted on decode. No compression modes — the
format's ubiquity, not its sophistication, is why a crawl curation
pipeline meets it.

Feature surface matches the other codecs (PngImage shape): decoded
pixels come back row-major TOP-DOWN, RGB interleaved, so mean_pixel()
and channel math agree with every sibling decoder.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

FILE_HEADER = 14
INFO_HEADER = 40


@dataclass
class BmpImage:
    width: int
    height: int
    bit_depth: int
    channels: int
    pixels: bytes  # row-major top-down, RGB interleaved

    def mean_pixel(self) -> float:
        if not self.pixels:
            return 0.0
        return sum(self.pixels) / len(self.pixels)


def _row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3


def encode_bmp(pixels: bytes, width: int, height: int) -> bytes:
    """24-bit bottom-up BI_RGB BMP from top-down RGB pixels."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer does not match dimensions")
    stride = _row_stride(width)
    data = bytearray()
    pad = b"\x00" * (stride - width * 3)
    for row in range(height - 1, -1, -1):  # bottom-up storage
        off = row * width * 3
        line = pixels[off:off + width * 3]
        # RGB -> BGR per sample
        bgr = bytearray(len(line))
        bgr[0::3] = line[2::3]
        bgr[1::3] = line[1::3]
        bgr[2::3] = line[0::3]
        data += bgr + pad
    size = FILE_HEADER + INFO_HEADER + len(data)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0,
                         FILE_HEADER + INFO_HEADER)
    info = struct.pack("<IiiHHIIiiII", INFO_HEADER, width, height, 1, 24,
                       0, len(data), 2835, 2835, 0, 0)
    return header + info + bytes(data)


def decode_bmp(data: bytes) -> BmpImage:
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    try:
        pixel_off = struct.unpack_from("<I", data, 10)[0]
        info_size = struct.unpack_from("<I", data, FILE_HEADER)[0]
        if info_size < INFO_HEADER:
            raise NotImplementedError(
                "BITMAPCOREHEADER BMPs not supported")
        width, height_raw = struct.unpack_from("<ii", data,
                                               FILE_HEADER + 4)
        planes, bpp = struct.unpack_from("<HH", data, FILE_HEADER + 12)
        compression = struct.unpack_from("<I", data, FILE_HEADER + 16)[0]
    except struct.error:
        raise ValueError("truncated or corrupt BMP header") from None
    # adversarial-header guard: dimensions drive the output allocation
    if not (0 < width <= (1 << 20)
            and 0 < abs(height_raw) <= (1 << 20)) or \
            width * abs(height_raw) > (1 << 26):
        raise ValueError(
            f"implausible BMP dimensions {width}x{height_raw}")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMPs supported (bpp={bpp}, "
            f"compression={compression})")
    top_down = height_raw < 0
    height = abs(height_raw)
    stride = _row_stride(width)
    pixels = bytearray(width * height * 3)
    for out_row in range(height):
        src_row = out_row if top_down else height - 1 - out_row
        off = pixel_off + src_row * stride
        line = data[off:off + width * 3]
        if len(line) < width * 3:
            raise ValueError("BMP pixel data shorter than advertised")
        dst = out_row * width * 3
        # BGR -> RGB per sample
        pixels[dst + 0:dst + width * 3:3] = line[2::3]
        pixels[dst + 1:dst + width * 3:3] = line[1::3]
        pixels[dst + 2:dst + width * 3:3] = line[0::3]
    return BmpImage(width=width, height=height, bit_depth=8, channels=3,
                    pixels=bytes(pixels))
