"""Minimal SAS7BDAT writer — enough of the (publicly documented) format to
produce genuine files that any conforming reader decodes.

Purpose: pandas can READ sas7bdat but not write it, and no SAS binary
fixture ships anywhere in this environment — so the S4 ingest path
(sources/sas.py) needs a real-bytes fixture generated from first
principles. The layout below follows the public format documentation
(the community-reverse-engineered spec that pandas' reader and parso
implement); every offset is the documented one.

Scope (deliberately minimal): uncompressed, 32-bit (x86) layout,
little-endian, double and fixed-width string columns, one metadata page +
as many pure data pages as needed. That is exactly the subset the
reference's converter consumes (tab-delimited export of flat tables).

Usage:
    python tools/make_sas7bdat.py OUT.sas7bdat          # demo table
    from tools.make_sas7bdat import write_sas7bdat      # programmatic
"""

from __future__ import annotations

import struct
import sys

MAGIC = (
    b"\x00\x00\x00\x00\x00\x00\x00\x00"
    b"\x00\x00\x00\x00\xc2\xea\x81\x60"
    b"\xb3\x14\x11\xcf\xbd\x92\x08\x00"
    b"\x09\xc7\x31\x8c\x18\x1f\x10\x11"
)

HEADER_LEN = 1024
PAGE_LEN = 8192
PAGE_BIT_OFFSET = 16          # x86
SUBHEADER_PTR_LEN = 12        # x86
INT_LEN = 4                   # x86

# subheader signatures (x86 little-endian byte order)
SIG_ROW_SIZE = b"\xf7\xf7\xf7\xf7"
SIG_COL_SIZE = b"\xf6\xf6\xf6\xf6"
SIG_COL_TEXT = b"\xfd\xff\xff\xff"
SIG_COL_NAME = b"\xff\xff\xff\xff"
SIG_COL_ATTR = b"\xfc\xff\xff\xff"
SIG_COL_FORMAT = b"\xfe\xfb\xff\xff"

PAGE_META = 0x0000
PAGE_DATA = 0x0100


def _u2(v: int) -> bytes:
    return struct.pack("<H", v)


def _u4(v: int) -> bytes:
    return struct.pack("<I", v)


def _f8(v: float) -> bytes:
    return struct.pack("<d", v)


class _Col:
    def __init__(self, name: str, kind: str, width: int):
        self.name = name
        self.kind = kind          # "d" double | "s" string
        self.width = width        # bytes in the packed row
        self.offset = 0           # filled during layout


def _infer_columns(names, rows) -> list[_Col]:
    cols: list[_Col] = []
    for j, name in enumerate(names):
        vals = [r[j] for r in rows]
        if all(isinstance(v, (int, float)) and not isinstance(v, bool) for v in vals):
            cols.append(_Col(name, "d", 8))
        else:
            width = max([len(str(v).encode("latin-1")) for v in vals] + [1])
            cols.append(_Col(name, "s", width))
    # SAS packs doubles first (8-byte aligned), then strings
    off = 0
    for c in cols:
        if c.kind == "d":
            c.offset = off
            off += 8
    for c in cols:
        if c.kind == "s":
            c.offset = off
            off += c.width
    return cols


def _header(page_count: int, name: str = "FIXTURE") -> bytes:
    h = bytearray(HEADER_LEN)
    h[0:32] = MAGIC
    h[32] = 0x22          # not b"3" -> 32-bit layout
    h[35] = 0x22          # not b"3" -> align1 = 0
    h[37] = 0x01          # little-endian
    h[39] = ord("1")      # unix
    h[70] = 20            # encoding: utf-8
    h[84:92] = b"SAS FILE"
    h[92:156] = name.encode("latin-1")[:64].ljust(64, b"\x00")
    h[156:164] = b"DATA    "
    h[164:172] = _f8(2.0e9)   # date created (secs since 1960; value unchecked)
    h[172:180] = _f8(2.0e9)   # date modified
    h[196:200] = _u4(HEADER_LEN)
    h[200:204] = _u4(PAGE_LEN)
    h[204:208] = _u4(page_count)
    h[216:224] = b"9.0401M2"
    h[224:240] = b"Linux".ljust(16, b" ")
    h[240:256] = b"4.4".ljust(16, b" ")
    h[256:272] = b"x86_64".ljust(16, b" ")
    h[272:288] = b"Linux".ljust(16, b" ")
    return bytes(h)


def _meta_page(cols: list[_Col], row_length: int, row_count: int) -> bytes:
    """One metadata page: row_size, col_size, col_text, col_name, col_attr
    subheaders + one format subheader per column (the reader builds its
    column list from the format subheaders)."""
    ncols = len(cols)

    # ---- column text blob: the 2-byte size prefix is PART of the blob the
    # reader slices names out of, so name offsets are relative to it.
    names_enc = [c.name.encode("latin-1") for c in cols]
    blob_body = b"\x00\x00"                      # pad after the size field
    name_pos: list[tuple[int, int]] = []
    for nb in names_enc:
        name_pos.append((2 + len(blob_body), len(nb)))
        blob_body += nb
    text_block_size = 2 + len(blob_body)
    sub_text = SIG_COL_TEXT + _u2(text_block_size) + blob_body
    sub_text += b"\x00" * ((4 - len(sub_text) % 4) % 4)

    # ---- row size: documented field offsets are multiples of int_len;
    # lcs/lcp (@354/@378) zeroed -> no creator-proc sniffing.
    sub_rowsize = bytearray(480)
    sub_rowsize[0:4] = SIG_ROW_SIZE
    sub_rowsize[5 * INT_LEN : 5 * INT_LEN + 4] = _u4(row_length)
    sub_rowsize[6 * INT_LEN : 6 * INT_LEN + 4] = _u4(row_count)
    sub_rowsize[9 * INT_LEN : 9 * INT_LEN + 4] = _u4(ncols)   # col_count_p1
    sub_rowsize[10 * INT_LEN : 10 * INT_LEN + 4] = _u4(0)     # col_count_p2
    sub_rowsize[15 * INT_LEN : 15 * INT_LEN + 4] = _u4(0)     # mix-page rows

    sub_colsize = SIG_COL_SIZE + _u4(ncols) + _u4(0)

    # ---- column names: pointer i at sub_off + 12 + 8i =
    # (text subheader idx u2, offset u2, length u2, pad u2)
    sub_name = bytearray(20 + 8 * ncols)
    sub_name[0:4] = SIG_COL_NAME
    for i, (noff, nlen) in enumerate(name_pos):
        base = 12 + 8 * i
        sub_name[base : base + 2] = _u2(0)        # names live in blob 0
        sub_name[base + 2 : base + 4] = _u2(noff)
        sub_name[base + 4 : base + 6] = _u2(nlen)
    sub_name = bytes(sub_name)

    # ---- column attributes: vector i at sub_off+12+12i:
    # data offset u4, data length u4, @+10 type u1 (1=double, 2=string)
    sub_attr = bytearray(20 + 12 * ncols)
    sub_attr[0:4] = SIG_COL_ATTR
    for i, c in enumerate(cols):
        base = 12 + 12 * i
        sub_attr[base : base + 4] = _u4(c.offset)
        sub_attr[base + 4 : base + 8] = _u4(c.width)
        sub_attr[base + 10] = 1 if c.kind == "d" else 2
    sub_attr = bytes(sub_attr)

    # ---- one format/label subheader per column (all-zero pointers ->
    # empty format + label, which is what plain data columns carry)
    sub_fmt = (SIG_COL_FORMAT + b"\x00" * 48,) * ncols

    subs = [bytes(sub_rowsize), sub_colsize, sub_text, sub_name, sub_attr, *sub_fmt]

    page = bytearray(PAGE_LEN)
    page[PAGE_BIT_OFFSET : PAGE_BIT_OFFSET + 2] = _u2(PAGE_META)
    page[PAGE_BIT_OFFSET + 2 : PAGE_BIT_OFFSET + 4] = _u2(len(subs))  # blocks
    page[PAGE_BIT_OFFSET + 4 : PAGE_BIT_OFFSET + 6] = _u2(len(subs))
    ptr_base = PAGE_BIT_OFFSET + 8
    data_base = ptr_base + SUBHEADER_PTR_LEN * len(subs)
    data_base += (8 - data_base % 8) % 8
    pos = data_base
    for i, sb in enumerate(subs):
        p = ptr_base + SUBHEADER_PTR_LEN * i
        page[p : p + 4] = _u4(pos)
        page[p + 4 : p + 8] = _u4(len(sb))
        page[p + 8] = 0   # compression: none
        page[p + 9] = 0   # type
        page[pos : pos + len(sb)] = sb
        pos += len(sb) + ((8 - len(sb) % 8) % 8)
    if pos > PAGE_LEN:
        raise ValueError("metadata page overflow — shorten column names")
    return bytes(page)


def _pack_row(cols: list[_Col], row, row_length: int) -> bytes:
    buf = bytearray(b" " * row_length)
    for c, v in zip(cols, row):
        if c.kind == "d":
            buf[c.offset : c.offset + 8] = _f8(float(v))
        else:
            enc = str(v).encode("latin-1")[: c.width]
            buf[c.offset : c.offset + c.width] = enc.ljust(c.width, b" ")
    return bytes(buf)


def write_sas7bdat(path: str, names: list[str], rows: list[tuple]) -> None:
    """Write `rows` (tuples matching `names`) as an uncompressed sas7bdat.
    Numeric values become SAS doubles; everything else fixed-width
    latin-1 strings."""
    cols = _infer_columns(names, rows)
    row_length = sum(c.width for c in cols)
    rows_per_page = (PAGE_LEN - PAGE_BIT_OFFSET - 8) // row_length
    if rows_per_page < 1:
        raise ValueError("row too wide for page")
    data_pages = []
    for start in range(0, len(rows), rows_per_page):
        chunk = rows[start : start + rows_per_page]
        page = bytearray(PAGE_LEN)
        page[PAGE_BIT_OFFSET : PAGE_BIT_OFFSET + 2] = _u2(PAGE_DATA)
        page[PAGE_BIT_OFFSET + 2 : PAGE_BIT_OFFSET + 4] = _u2(len(chunk))
        page[PAGE_BIT_OFFSET + 4 : PAGE_BIT_OFFSET + 6] = _u2(0)
        pos = PAGE_BIT_OFFSET + 8
        for r in chunk:
            packed = _pack_row(cols, r, row_length)
            page[pos : pos + row_length] = packed
            pos += row_length
        data_pages.append(bytes(page))

    with open(path, "wb") as f:
        f.write(_header(1 + len(data_pages)))
        f.write(_meta_page(cols, row_length, len(rows)))
        for p in data_pages:
            f.write(p)


def demo_rows(n: int = 25) -> tuple[list[str], list[tuple]]:
    names = ["NAME", "CITY", "VALUE", "COUNT"]
    rows = [
        (f"person_{i:03d}", ["SPRINGFIELD", "RIVERTON", "LAKEVIEW"][i % 3],
         round(i * 1.5 + 0.25, 2), float(i * i))
        for i in range(n)
    ]
    return names, rows


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "demo.sas7bdat"
    names, rows = demo_rows()
    write_sas7bdat(out, names, rows)
    print(f"wrote {len(rows)} rows -> {out}")
