"""Minimal OLE2 + BIFF8 ``.xls`` WRITER for round-tripping the reader in
``battetl_spark/sources/xls.py`` (the multimodal-codec test discipline:
stdlib encoder ↔ decoder, exact values). Writes one 'Workbook' stream in
the regular FAT (padded past the 4096-byte mini-stream cutoff), a root +
stream directory, and a single-FAT-sector container — enough for the
format's documented happy path plus the SST-CONTINUE split rule.
"""

from __future__ import annotations

import struct

ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD
FREESECT = 0xFFFFFFFF
NOSTREAM = 0xFFFFFFFF


def rec(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def bof(dt: int) -> bytes:
    return rec(0x809, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0x0600))


def xl_unicode(s: str, wide: bool | None = None) -> bytes:
    if wide is None:
        wide = any(ord(ch) > 0xFF for ch in s)
    enc = s.encode("utf-16-le" if wide else "latin-1")
    return struct.pack("<HB", len(s), 1 if wide else 0) + enc


def sst_records(strings: list[str], split: tuple[int, int] | None = None) -> bytes:
    """SST record (+ one CONTINUE when ``split=(str_idx, char_idx)`` forces
    a mid-character-data boundary — the continuation restarts with a fresh
    grbit byte, possibly at a different width)."""
    if split is None:
        body = struct.pack("<II", len(strings), len(strings))
        for s in strings:
            body += xl_unicode(s)
        return rec(0xFC, body)
    si, ci = split
    body = struct.pack("<II", len(strings), len(strings))
    for s in strings[:si]:
        body += xl_unicode(s)
    s = strings[si]
    head_wide = any(ord(ch) > 0xFF for ch in s[:ci])
    tail_wide = any(ord(ch) > 0xFF for ch in s[ci:])
    body += struct.pack("<HB", len(s), 1 if head_wide else 0)
    body += s[:ci].encode("utf-16-le" if head_wide else "latin-1")
    cont = bytes([1 if tail_wide else 0])
    cont += s[ci:].encode("utf-16-le" if tail_wide else "latin-1")
    for t in strings[si + 1:]:
        cont += xl_unicode(t)
    return rec(0xFC, body) + rec(0x3C, cont)


def number(r: int, c: int, v: float) -> bytes:
    return rec(0x203, struct.pack("<HHHd", r, c, 0, v))


def rk_int(r: int, c: int, v: int, div100: bool = False) -> bytes:
    rk = ((v & 0x3FFFFFFF) << 2) | 2 | (1 if div100 else 0)
    return rec(0x27E, struct.pack("<HHHI", r, c, 0, rk))


def rk_float(r: int, c: int, v: float) -> bytes:
    bits = struct.unpack("<Q", struct.pack("<d", v))[0]
    assert bits & 0x3FFFFFFFF == 0, "float not RK-representable"
    return rec(0x27E, struct.pack("<HHHI", r, c, 0, (bits >> 32) & 0xFFFFFFFC))


def mulrk(r: int, c0: int, values: list[int]) -> bytes:
    body = struct.pack("<HH", r, c0)
    for v in values:
        body += struct.pack("<HI", 0, ((v & 0x3FFFFFFF) << 2) | 2)
    body += struct.pack("<H", c0 + len(values) - 1)
    return rec(0xBD, body)


def labelsst(r: int, c: int, isst: int) -> bytes:
    return rec(0xFD, struct.pack("<HHHI", r, c, 0, isst))


def label(r: int, c: int, s: str) -> bytes:
    return rec(0x204, struct.pack("<HHH", r, c, 0) + xl_unicode(s))


def boolerr(r: int, c: int, v: bool) -> bytes:
    return rec(0x205, struct.pack("<HHHBB", r, c, 0, 1 if v else 0, 0))


def formula_num(r: int, c: int, v: float) -> bytes:
    # grbit(2) + chn(4) + cce(2) of an empty parsed expression
    return rec(0x06, struct.pack("<HHHd", r, c, 0, v) + b"\x00" * 8)


def boundsheet(offset: int, name: str) -> bytes:
    nm = name.encode("latin-1")
    return rec(0x85, struct.pack("<IBB", offset, 0, 0)
               + bytes([len(nm), 0]) + nm)


def workbook_stream(sheets: list[bytes], sst: bytes | None = None) -> bytes:
    """Globals substream (BOF, [SST], BOUNDSHEETs, EOF) + sheet substreams,
    with the BOUNDSHEET offsets patched to the real sheet BOF positions."""
    names = [f"Sheet{i + 1}" for i in range(len(sheets))]
    globals_ = bof(0x0005) + (sst or b"")

    def build(offsets: list[int]) -> bytes:
        g = globals_
        for off, nm in zip(offsets, names):
            g += boundsheet(off, nm)
        g += rec(0x0A, b"")
        return g

    glen = len(build([0] * len(sheets)))
    offsets, pos = [], glen
    for body in sheets:
        offsets.append(pos)
        pos += len(body)
    return build(offsets) + b"".join(sheets)


def sheet_stream(cell_records: bytes) -> bytes:
    return bof(0x0010) + cell_records + rec(0x0A, b"")


def write_ole_xls(path: str, workbook: bytes) -> None:
    """Wrap a Workbook stream in a minimal OLE2 container (512-byte
    sectors, single FAT sector, one directory sector)."""
    workbook = workbook + b"\x00" * max(0, 4200 - len(workbook))  # > cutoff
    n_stream = (len(workbook) + 511) // 512
    n_total = 1 + 1 + n_stream  # FAT + directory + stream
    assert n_total <= 128, "test container supports one FAT sector"

    fat = [FREESECT] * 128
    fat[0] = FATSECT
    fat[1] = ENDOFCHAIN  # directory chain: one sector
    for i in range(n_stream):
        fat[2 + i] = 2 + i + 1 if i < n_stream - 1 else ENDOFCHAIN
    fat_sector = struct.pack("<128I", *fat)

    def dirent(name: str, etype: int, start: int, size: int,
               child: int = NOSTREAM) -> bytes:
        nm = name.encode("utf-16-le") + b"\x00\x00"
        ent = nm + b"\x00" * (64 - len(nm))
        ent += struct.pack("<HBB", len(nm), etype, 1)  # name len, type, black
        ent += struct.pack("<III", NOSTREAM, NOSTREAM, child)  # left/right/child
        ent += b"\x00" * 16 + b"\x00" * 4 + b"\x00" * 16  # clsid, state, times
        ent += struct.pack("<II", start, size) + b"\x00" * 4
        assert len(ent) == 128
        return ent

    directory = (
        dirent("Root Entry", 5, ENDOFCHAIN, 0, child=1)
        + dirent("Workbook", 2, 2, len(workbook))
        + b"\x00" * 256
    )

    # MS-CFB v3 header, field by field
    header = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"  # @0 magic
    header += b"\x00" * 16                         # @8 clsid
    header += struct.pack("<HHHHH", 0x3E, 3, 0xFFFE, 9, 6)  # minor, major,
    header += b"\x00" * 6                          # byte order, shifts; rsvd
    header += struct.pack("<IIIII", 0, 1, 1, 0, 4096)  # @40 ndir(v3=0),
    #                            nfat, first dir sector, transaction, cutoff
    header += struct.pack("<II", ENDOFCHAIN, 0)    # @60 first/num minifat
    header += struct.pack("<II", ENDOFCHAIN, 0)    # @68 first/num difat
    header += struct.pack("<109I", *([0] + [FREESECT] * 108))  # @76 difat
    assert len(header) == 512, len(header)

    with open(path, "wb") as f:
        f.write(header)
        f.write(fat_sector)
        f.write(directory)
        f.write(workbook)
        pad = n_stream * 512 - len(workbook)
        f.write(b"\x00" * pad)
