"""Legacy Excel 97 ``.xls`` (BIFF5/BIFF8) reader in pure stdlib.

Reference analog: ``pythongis/vector/loader.py:135-141`` (xlrd path).
Implemented from the public [MS-CFB] compound-file and [MS-XLS] BIFF
specs:

* OLE2/CDF container: DIFAT → FAT chains, directory entries, and the
  mini-FAT/mini-stream for streams under the 4096-byte cutoff;
  ``Workbook`` (BIFF8) or ``Book`` (BIFF5) stream located by name.
* BIFF records: BOF/EOF substreams, BOUNDSHEET sheet directory, SST
  shared strings (compressed latin-1 and UTF-16LE, rich-text/ext runs
  skipped), and the cell records NUMBER, RK, MULRK, LABELSST, LABEL
  (BIFF5 inline + BIFF8 unicode), BOOLERR, BLANK/MULBLANK, and FORMULA
  (cached numeric results).
* SST CONTINUE records ([MS-XLS] 2.5.293): strings split across record
  boundaries resume with a fresh fHighByte flag (a string may switch
  latin-1↔UTF-16 mid-string); headers/rich runs span records directly.
  The writer emits conformant CONTINUE splits past the 8224-byte
  record max, so >8KB string tables round-trip.

Documented boundary: encrypted workbooks (FILEPASS) raise.

The DataFrame surface mirrors :func:`sources.xlsx.read_xlsx` — first
row as field names, optional sheet selection — so ``.xls`` and
``.xlsx`` load identically, like the reference's two excel branches.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF


# ------------------------------------------------------------------
# OLE2 / compound file ([MS-CFB])
# ------------------------------------------------------------------

def _ole2_streams(buf: bytes) -> dict[str, bytes]:
    """Compound file → {stream name: bytes} for all stream entries."""
    if buf[:8] != bytes.fromhex("D0CF11E0A1B11AE1"):
        raise ValueError("not an OLE2 compound file (.xls)")
    (ssz_pow,) = struct.unpack_from("<H", buf, 30)
    (mssz_pow,) = struct.unpack_from("<H", buf, 32)
    ssz, mssz = 1 << ssz_pow, 1 << mssz_pow
    (n_fat,) = struct.unpack_from("<I", buf, 44)
    (dir_start,) = struct.unpack_from("<I", buf, 48)
    (mini_cutoff,) = struct.unpack_from("<I", buf, 56)
    (minifat_start,) = struct.unpack_from("<I", buf, 60)
    (difat_start,) = struct.unpack_from("<I", buf, 68)

    def sector(sect: int) -> bytes:
        off = (sect + 1) * ssz
        return buf[off : off + ssz]

    # DIFAT: first 109 FAT sector ids in the header, then chained sectors
    difat = list(struct.unpack_from("<109I", buf, 76))
    nxt = difat_start
    while nxt not in (_ENDOFCHAIN, _FREESECT):
        s = sector(nxt)
        vals = struct.unpack("<%dI" % (ssz // 4), s)
        difat += vals[:-1]
        nxt = vals[-1]
    fat: list[int] = []
    for sect in difat[:n_fat]:
        if sect in (_ENDOFCHAIN, _FREESECT):
            continue
        fat += struct.unpack("<%dI" % (ssz // 4), sector(sect))

    def chain(start: int) -> bytes:
        out = bytearray()
        sect = start
        seen = 0
        while sect not in (_ENDOFCHAIN, _FREESECT):
            out += sector(sect)
            sect = fat[sect]
            seen += 1
            if seen > len(fat) + 1:
                raise ValueError("corrupt FAT chain")
        return bytes(out)

    dirdata = chain(dir_start)
    entries = []
    for off in range(0, len(dirdata) - 127, 128):
        (name_len,) = struct.unpack_from("<H", dirdata, off + 64)
        if name_len < 2:
            continue
        name = dirdata[off : off + name_len - 2].decode("utf-16-le", "replace")
        etype = dirdata[off + 66]
        (start,) = struct.unpack_from("<I", dirdata, off + 116)
        (size,) = struct.unpack_from("<I", dirdata, off + 120)
        entries.append((name, etype, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    ministream = chain(root[2])[: root[3]] if root else b""
    minifat: list[int] = []
    if minifat_start not in (_ENDOFCHAIN, _FREESECT):
        mf = chain(minifat_start)
        minifat = list(struct.unpack("<%dI" % (len(mf) // 4), mf))

    def mini_chain(start: int) -> bytes:
        out = bytearray()
        sect = start
        seen = 0
        while sect not in (_ENDOFCHAIN, _FREESECT):
            out += ministream[sect * mssz : (sect + 1) * mssz]
            sect = minifat[sect]
            seen += 1
            if seen > len(minifat) + 1:
                raise ValueError("corrupt miniFAT chain")
        return bytes(out)

    streams = {}
    for name, etype, start, size in entries:
        if etype != 2:  # stream entries only
            continue
        data = mini_chain(start) if size < mini_cutoff else chain(start)
        streams[name] = data[:size]
    return streams


# ------------------------------------------------------------------
# BIFF records ([MS-XLS])
# ------------------------------------------------------------------

def _records(data: bytes):
    pos = 0
    n = len(data)
    while pos + 4 <= n:
        op, ln = struct.unpack_from("<HH", data, pos)
        yield op, pos, data[pos + 4 : pos + 4 + ln]
        pos += 4 + ln


def _rk_value(v: int) -> float:
    val: float
    if v & 2:  # 30-bit signed integer
        iv = v >> 2
        if iv & 0x20000000:
            iv -= 0x40000000
        val = float(iv)
    else:  # top 30 bits of an IEEE double
        val = struct.unpack("<d", struct.pack("<II", 0, v & 0xFFFFFFFC))[0]
    return val / 100.0 if v & 1 else val


class _SegCursor:
    """Byte cursor over an SST record payload plus its CONTINUE record
    payloads. Non-character fields (string headers, rich-run/ExtRst
    skips) read straight across segment boundaries; CHARACTER data must
    use :meth:`read_chars`, which honors the [MS-XLS] 2.5.293 rule that
    every continuation of an rgb character array into a CONTINUE record
    restarts with a fresh fHighByte option byte (a string may switch
    between compressed latin-1 and UTF-16 mid-string)."""

    def __init__(self, segs: list[bytes], pos: int = 0):
        self.segs = segs
        self.i = 0
        self.p = pos

    def _norm(self) -> None:
        while self.i < len(self.segs) - 1 and self.p >= len(self.segs[self.i]):
            self.p -= len(self.segs[self.i])
            self.i += 1

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n:
            self._norm()
            seg = self.segs[self.i]
            take = min(n, len(seg) - self.p)
            if take <= 0:
                raise ValueError("SST truncated")
            out += seg[self.p : self.p + take]
            self.p += take
            n -= take
        return bytes(out)

    def skip(self, n: int) -> None:
        self.p += n  # may overshoot this segment; _norm resolves lazily

    def read_chars(self, cch: int, wide: bool) -> str:
        out: list[str] = []
        while cch:
            if self.p >= len(self.segs[self.i]):
                # record boundary mid-rgb → the CONTINUE starts with a
                # fresh fHighByte flag for the remaining characters
                if self.i >= len(self.segs) - 1:
                    raise ValueError("SST truncated")
                self.p -= len(self.segs[self.i])
                self.i += 1
                wide = bool(self.segs[self.i][self.p] & 1)
                self.p += 1
            seg = self.segs[self.i]
            avail = len(seg) - self.p
            width = 2 if wide else 1
            take = min(cch, avail // width)
            if take == 0 and avail > 0:
                raise ValueError("SST char array split mid-character")
            raw = seg[self.p : self.p + take * width]
            out.append(raw.decode("utf-16-le" if wide else "latin-1"))
            self.p += take * width
            cch -= take
        return "".join(out)


def _read_xlustring(cur: _SegCursor) -> str:
    """XLUnicodeRichExtendedString (BIFF8), CONTINUE-aware."""
    (cch,) = struct.unpack("<H", cur.read(2))
    flags = cur.read(1)[0]
    nrich = struct.unpack("<H", cur.read(2))[0] if flags & 0x08 else 0
    next_ = struct.unpack("<i", cur.read(4))[0] if flags & 0x04 else 0
    text = cur.read_chars(cch, bool(flags & 0x01))
    cur.skip(4 * nrich + next_)
    return text


def _parse_sst(segs: list[bytes]) -> list[str]:
    """SST record + following CONTINUE payloads → unique string list."""
    (_total, nuniq) = struct.unpack_from("<ii", segs[0], 0)
    cur = _SegCursor(segs, 8)
    return [_read_xlustring(cur) for _ in range(nuniq)]


def _unicode_string(payload: bytes, pos: int) -> tuple[str, int]:
    """Single-record XLUnicodeRichExtendedString (LABEL inline strings):
    returns (text, next pos)."""
    cur = _SegCursor([payload], pos)
    text = _read_xlustring(cur)
    return text, cur.p


def parse_xls(path: str, sheet: str | None = None) -> list[list]:
    """.xls → dense list-of-rows (None-padded), mirroring
    ``xlsx.parse_xlsx``. ``sheet`` selects by BOUNDSHEET name (default:
    first worksheet substream)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    streams = _ole2_streams(buf)
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        raise ValueError(f".xls has no Workbook/Book stream (found {list(streams)})")

    recs = list(_records(wb))
    biff_ver = 8
    sst: list[str] = []
    sheets: list[tuple[int, str]] = []  # (stream offset, name)
    # ---- globals substream: version, SST, BOUNDSHEET directory
    k = 0
    while k < len(recs):
        op, pos, payload = recs[k]
        if op == 0x0809 and pos == 0:
            (ver,) = struct.unpack_from("<H", payload, 0)
            biff_ver = 8 if ver >= 0x0600 else 5
        elif op == 0x002F:  # FILEPASS
            raise NotImplementedError("encrypted .xls (FILEPASS) not supported")
        elif op == 0x0085:  # BOUNDSHEET
            (sh_off,) = struct.unpack_from("<I", payload, 0)
            if biff_ver == 8:
                cch = payload[6]
                hi = payload[7] & 1
                name = (
                    payload[8 : 8 + 2 * cch].decode("utf-16-le")
                    if hi
                    else payload[8 : 8 + cch].decode("latin-1")
                )
            else:
                cch = payload[6]
                name = payload[7 : 7 + cch].decode("latin-1")
            sheets.append((sh_off, name))
        elif op == 0x00FC:  # SST (BIFF8) + its CONTINUE records
            segs = [payload]
            while k + 1 < len(recs) and recs[k + 1][0] == 0x003C:
                segs.append(recs[k + 1][2])
                k += 1
            sst = _parse_sst(segs)
        elif op == 0x000A:
            break  # end of globals
        k += 1

    if not sheets:
        raise ValueError("no BOUNDSHEET records in workbook globals")
    if sheet is not None:
        match = [o for o, nm in sheets if nm == sheet]
        if not match:
            raise ValueError(f"sheet {sheet!r} not found ({[n for _, n in sheets]})")
        start = match[0]
    else:
        start = sheets[0][0]

    cells: dict[tuple[int, int], object] = {}
    in_sheet = False
    for op, pos, payload in recs:
        if pos < start:
            continue
        if op == 0x0809:
            if in_sheet:
                break
            in_sheet = True
            continue
        if not in_sheet:
            continue
        if op == 0x000A:  # EOF of this sheet
            break
        if op == 0x0203:  # NUMBER
            r, c = struct.unpack_from("<HH", payload, 0)
            cells[(r, c)] = struct.unpack_from("<d", payload, 6)[0]
        elif op == 0x027E:  # RK
            r, c = struct.unpack_from("<HH", payload, 0)
            cells[(r, c)] = _rk_value(struct.unpack_from("<I", payload, 6)[0])
        elif op == 0x00BD:  # MULRK
            r, c0 = struct.unpack_from("<HH", payload, 0)
            ncell = (len(payload) - 6) // 6
            for i in range(ncell):
                (rk,) = struct.unpack_from("<I", payload, 4 + i * 6 + 2)
                cells[(r, c0 + i)] = _rk_value(rk)
        elif op == 0x00FD:  # LABELSST
            r, c = struct.unpack_from("<HH", payload, 0)
            (isst,) = struct.unpack_from("<I", payload, 6)
            cells[(r, c)] = sst[isst]
        elif op == 0x0204:  # LABEL (inline string)
            r, c = struct.unpack_from("<HH", payload, 0)
            if biff_ver == 8:
                cells[(r, c)], _ = _unicode_string(payload, 6)
            else:
                (cch,) = struct.unpack_from("<H", payload, 6)
                cells[(r, c)] = payload[8 : 8 + cch].decode("latin-1")
        elif op == 0x0205:  # BOOLERR
            r, c = struct.unpack_from("<HH", payload, 0)
            if payload[7] == 0:  # boolean (1 = error code -> None)
                cells[(r, c)] = bool(payload[6])
        elif op == 0x0006:  # FORMULA: cached numeric result only
            r, c = struct.unpack_from("<HH", payload, 0)
            res = payload[6:14]
            if res[6:8] != b"\xff\xff":
                cells[(r, c)] = struct.unpack("<d", res)[0]

    if not cells:
        return []
    nrows = max(r for r, _ in cells) + 1
    ncols = max(c for _, c in cells) + 1
    return [[cells.get((r, c)) for c in range(ncols)] for r in range(nrows)]


def read_xls(
    spark,
    path: str,
    sheet: str | None = None,
    skip: int = 0,
    last: int | None = None,
    xfield: str | None = None,
    yfield: str | None = None,
):
    """.xls → Spark DataFrame with the same surface as
    :func:`sources.xlsx.read_xlsx` (first row = header, xy geokey)."""
    from pythongis_spark.sources.xlsx import _rows_to_df

    rows = parse_xls(path, sheet=sheet)[skip:]
    if last is not None:
        rows = rows[: last + 2]
    if not rows:
        raise ValueError("empty sheet")
    return _rows_to_df(spark, rows, xfield, yfield)


# ------------------------------------------------------------------
# writer (minimal BIFF8 inside a minimal OLE2 container)
# ------------------------------------------------------------------

def assemble_xls(rows_spec: list[tuple]) -> bytes:
    """Assemble a real BIFF8 .xls from (row, col, value) cell specs:
    str → LABELSST (first string UTF-16, rest latin-1-compressible),
    bool → BOOLERR, number → NUMBER; tuples ('rk', v) / ('mulrk',
    [v...]) / ('formula', x) emit those records (test/fixture use).
    The OLE2 container is a single-FAT 512-byte-sector compound file
    ([MS-CFB]) with the Workbook stream padded past the mini cutoff."""

    def rec(op, payload=b""):
        return struct.pack("<HH", op, len(payload)) + payload

    sst_list: list[str] = []
    for r, c, v in rows_spec:
        if isinstance(v, str) and v not in sst_list:
            sst_list.append(v)
    # SST payload split into ≤8224-byte records ([MS-XLS] record max):
    # between strings where possible, mid-rgb with a fresh fHighByte
    # flag byte when a single string is longer than one record
    MAXREC = 8224
    sst_records: list[bytes] = []
    cur = bytearray(struct.pack("<ii", len(sst_list), len(sst_list)))
    for i, s in enumerate(sst_list):
        try:
            raw = s.encode("latin-1")
            flags = 0
        except UnicodeEncodeError:
            raw = s.encode("utf-16-le")
            flags = 1
        if i == 0:  # always exercise the UTF-16 branch once
            raw, flags = s.encode("utf-16-le"), 1
        if len(cur) + 3 > MAXREC:  # header never straddles
            sst_records.append(bytes(cur))
            cur = bytearray()
        cur += struct.pack("<HB", len(s), flags)
        width = 2 if flags & 1 else 1
        pos = 0
        while pos < len(raw):
            room = (MAXREC - len(cur)) // width * width
            if room <= 0:
                sst_records.append(bytes(cur))
                cur = bytearray([flags & 1])  # continuation grbit
                room = (MAXREC - 1) // width * width
            take = min(len(raw) - pos, room)
            cur += raw[pos : pos + take]
            pos += take
    sst_records.append(bytes(cur))

    name = b"Sheet1"
    globals_part = (
        rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
        + rec(0x00FC, sst_records[0])
        + b"".join(rec(0x003C, seg) for seg in sst_records[1:])
    )
    bs_pos = len(globals_part)
    globals_part += rec(0x0085, struct.pack("<IHB", 0, 0, len(name)) + b"\x00" + name)
    globals_part += rec(0x000A)
    sheet_off = len(globals_part)

    sheet = rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
    for r, c, v in rows_spec:
        if isinstance(v, str):
            sheet += rec(0x00FD, struct.pack("<HHHI", r, c, 0, sst_list.index(v)))
        elif isinstance(v, bool):
            sheet += rec(0x0205, struct.pack("<HHHBB", r, c, 0, int(v), 0))
        elif isinstance(v, tuple) and v[0] == "rk":
            sheet += rec(0x027E, struct.pack("<HHHI", r, c, 0, v[1]))
        elif isinstance(v, tuple) and v[0] == "mulrk":
            body = struct.pack("<HH", r, c)
            for rk in v[1]:
                body += struct.pack("<HI", 0, rk)
            body += struct.pack("<H", c + len(v[1]) - 1)
            sheet += rec(0x00BD, body)
        elif isinstance(v, tuple) and v[0] == "formula":
            sheet += rec(
                0x0006,
                struct.pack("<HHH", r, c, 0) + struct.pack("<d", v[1]) + b"\x00" * 8,
            )
        elif v is None:
            continue
        else:
            sheet += rec(0x0203, struct.pack("<HHH", r, c, 0) + struct.pack("<d", float(v)))
    sheet += rec(0x000A)

    wb = bytearray(globals_part + sheet)
    wb[bs_pos + 4 : bs_pos + 8] = struct.pack("<I", sheet_off)
    wb_b = bytes(wb)
    # pad past the 4096-byte mini cutoff so the stream lives in plain
    # FAT sectors (zero bytes parse as op-0 records and are ignored)
    n_sect = max(8, (len(wb_b) + 511) // 512)
    wb_b = wb_b.ljust(n_sect * 512, b"\x00")

    FREE, END, FATSECT = 0xFFFFFFFF, 0xFFFFFFFE, 0xFFFFFFFD
    # sector map: 0 = FAT, 1 = directory, 2..(2+n_sect-1) = workbook
    n_fat_entries = 2 + n_sect
    n_fat_sectors = 1
    if n_fat_entries > 128:
        raise NotImplementedError("write_xls supports sheets up to ~64KB")
    fat = [FATSECT, END] + [i + 1 for i in range(2, 1 + n_sect)] + [END]
    fat += [FREE] * (128 - len(fat))
    fat_sector = struct.pack("<128I", *fat[:128])

    def direntry(nm, etype, start, size, child=-1):
        nmb = nm.encode("utf-16-le") + b"\x00\x00"
        e = nmb.ljust(64, b"\x00")
        # color byte 1 = black (a single black node is a valid RB tree)
        e += struct.pack("<H", len(nmb)) + bytes([etype, 1])
        e += struct.pack("<3i", -1, -1, child)
        e = e[:80].ljust(116, b"\x00")
        e += struct.pack("<II", start & 0xFFFFFFFF, size)
        return e.ljust(128, b"\x00")

    # the root storage's child pointer MUST reach the Workbook stream —
    # conformant MS-CFB readers (Excel, olefile) walk the directory tree
    # from root.child and would otherwise see an empty container
    dir_sector = (
        direntry("Root Entry", 5, END, 0, child=1)
        + direntry("Workbook", 2, 2, len(wb_b))
        + b"\x00" * 256
    )[:512]

    header = bytearray(512)
    header[0:8] = bytes.fromhex("D0CF11E0A1B11AE1")
    struct.pack_into("<H", header, 24, 0x3E)
    struct.pack_into("<H", header, 26, 3)
    struct.pack_into("<H", header, 28, 0xFFFE)
    struct.pack_into("<H", header, 30, 9)
    struct.pack_into("<H", header, 32, 6)
    struct.pack_into("<I", header, 44, n_fat_sectors)
    struct.pack_into("<I", header, 48, 1)
    struct.pack_into("<I", header, 56, 4096)
    struct.pack_into("<I", header, 60, END)
    struct.pack_into("<I", header, 68, END)
    struct.pack_into("<I", header, 76, 0)
    for i in range(1, 109):
        struct.pack_into("<I", header, 76 + 4 * i, FREE)
    return bytes(header) + fat_sector + dir_sector + wb_b


def write_xls(pdf: pd.DataFrame, path: str) -> None:
    """pandas DataFrame → BIFF8 .xls (header row from columns; numbers,
    strings, booleans, None). Driver-side export like the other
    single-file writers."""
    spec: list[tuple] = []
    for c, col in enumerate(pdf.columns):
        spec.append((0, c, str(col)))
    for r, (_, row) in enumerate(pdf.iterrows(), start=1):
        for c, col in enumerate(pdf.columns):
            v = row[col]
            if v is None or (isinstance(v, float) and np.isnan(v)):
                continue
            if isinstance(v, (bool, np.bool_)):
                spec.append((r, c, bool(v)))
            elif isinstance(v, (int, float, np.integer, np.floating)):
                spec.append((r, c, float(v)))
            else:
                spec.append((r, c, str(v)))
    with open(path, "wb") as fh:
        fh.write(assemble_xls(spec))
