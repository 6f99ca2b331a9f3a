"""Minimal dBase III (.dbf) codec + .cpg encoding resolution.

The reference delegates attributes to the ``dbase`` crate (re-exported at
shapefile-rs ``src/lib.rs:60``); records surface as an ordered name→value map
(tests/read_tests.rs:841-844).  We implement, from the public dBase III file
layout, the subset the reference exercises: Character, Numeric, Float,
Logical, Date fields; ``.cpg`` label overrides the encoding (GBK fixture
analog, ``src/reader.rs:664-684`` + tests/read_tests.rs:832-845).

Values map as: Character→str (rstrip), Numeric(dec=0)→int, Numeric→float,
Float→float, Logical→bool, Date→datetime.date, empty→None.
"""

from __future__ import annotations

import datetime
import struct
from dataclasses import dataclass
from typing import Iterable, List, Optional, Sequence

from .shptypes import ShapefileError


@dataclass(frozen=True)
class DbfField:
    name: str  # <= 10 chars
    ftype: str  # C, N, F, L, D
    length: int
    decimals: int = 0


def resolve_encoding(cpg_label: Optional[str]) -> str:
    """Map a .cpg label to a Python codec (src/reader.rs:664-684 analog)."""
    if not cpg_label:
        return "ascii"
    label = cpg_label.strip().strip("\x00").lower()
    if not label:
        return "ascii"
    aliases = {
        "utf-8": "utf-8",
        "utf8": "utf-8",
        "65001": "utf-8",
        "936": "cp936",
        "gbk": "cp936",
        "big5": "big5",
        "950": "cp950",
        "1252": "cp1252",
        "iso-8859-1": "latin-1",
        "8859-1": "latin-1",
    }
    if label in aliases:
        return aliases[label]
    if label.isdigit():
        return f"cp{label}"
    return label


class DbfError(ShapefileError):
    pass


DBT_BLOCK = 512


def read_memo(dbt: bytes, block: int, encoding: str = "ascii") -> Optional[str]:
    """Resolve one dBase III memo: text starts at ``block``·512 and runs to
    the 0x1A terminator.  Out-of-range pointers tolerate as None (crash-safe,
    matching the field-level policy).

    Representable-payload bound (a FORMAT limit, not an implementation
    choice): dBase III stores no memo length — readers scan for the
    terminator — so a payload CONTAINING the byte pair 0x1A 0x1A, or
    ENDING in 0x1A (which abuts the written terminator into a pair),
    cannot round-trip through write_dbt→read_memo; it reads back truncated
    at the first pair.  Lone interior 0x1A bytes DO round-trip (the pair
    scan runs first).  Payloads needing arbitrary bytes belong in dBase
    IV/FoxPro memo formats, which carry explicit lengths."""
    start = block * DBT_BLOCK
    if block <= 0 or start >= len(dbt):
        return None
    # dBase III terminates memo text with the 0x1A 0x1A PAIR — scan for it
    # first so text containing a lone chr(26) round-trips; tolerate legacy
    # single-terminator writers, then end-of-blob
    end = dbt.find(b"\x1a\x1a", start)
    if end == -1:
        end = dbt.find(b"\x1a", start)
    chunk = dbt[start : end if end != -1 else len(dbt)]
    return chunk.decode(encoding, errors="replace")


def write_dbt(memos: Sequence[Optional[str]], encoding: str = "ascii") -> tuple:
    """dBase III memo sidecar writer (fixture/round-trip support): 512-byte
    blocks, text terminated ``0x1A 0x1A``, header block 0 carrying the
    next-free-block pointer.  Returns ``(dbt_bytes, block_indices)`` where
    ``block_indices[i]`` is the value to store in record i's ``M`` field
    (None for absent memos).

    Round-trip caveat: payloads containing 0x1A 0x1A or ending in 0x1A are
    unrepresentable in the terminator-scanned dBase III format — see
    :func:`read_memo` for the exact bound."""
    blocks = bytearray(DBT_BLOCK)
    blocks[16] = 0x03  # dBase III version marker
    indices: List[Optional[int]] = []
    for m in memos:
        if m is None:
            indices.append(None)
            continue
        payload = m.encode(encoding) + b"\x1a\x1a"
        indices.append(len(blocks) // DBT_BLOCK)
        blocks += payload
        blocks += b"\x00" * ((-len(blocks)) % DBT_BLOCK)
    struct.pack_into("<I", blocks, 0, len(blocks) // DBT_BLOCK)
    return bytes(blocks), indices


def read_dbf(data: bytes, encoding: str = "ascii", dbt: Optional[bytes] = None) -> tuple:
    """Returns ``(fields, rows)`` where rows are dicts keyed by field name.

    ``dbt`` is the optional memo sidecar: with it, ``M`` fields resolve
    their block pointers to the memo text (the dbase-crate surface the
    reference re-exports, src/lib.rs:60); without it they stay None."""
    if len(data) < 32:
        raise DbfError("dbf shorter than header")
    num_records = struct.unpack_from("<I", data, 4)[0]
    header_size, record_size = struct.unpack_from("<HH", data, 8)

    fields: List[DbfField] = []
    pos = 32
    while pos < header_size - 1 and pos + 32 <= len(data):
        if data[pos] == 0x0D:
            break
        raw_name = data[pos : pos + 11].split(b"\x00", 1)[0]
        name = raw_name.decode(encoding, errors="replace")
        ftype = chr(data[pos + 11])
        length = data[pos + 16]
        decimals = data[pos + 17]
        fields.append(DbfField(name, ftype, length, decimals))
        pos += 32

    rows = []
    pos = header_size
    for _ in range(num_records):
        if pos + record_size > len(data):
            break
        if data[pos] == 0x2A:  # deleted record flag '*'
            pos += record_size
            continue
        off = pos + 1
        row = {}
        for f in fields:
            raw = data[off : off + f.length]
            off += f.length
            row[f.name] = _parse_value(f, raw, encoding, dbt)
        rows.append(row)
        pos += record_size
    return fields, rows


def _parse_value(f: DbfField, raw: bytes, encoding: str, dbt: Optional[bytes] = None):
    if f.ftype == "C":
        return raw.decode(encoding, errors="replace").rstrip(" \x00")
    text = raw.decode("ascii", errors="replace").strip(" \x00")
    if f.ftype in ("N", "F"):
        if not text or text == "*" * len(text):
            return None
        try:
            if f.ftype == "N" and f.decimals == 0 and "." not in text:
                return int(text)
            return float(text)
        except ValueError:
            return None
    if f.ftype == "L":
        if text in ("Y", "y", "T", "t"):
            return True
        if text in ("N", "n", "F", "f"):
            return False
        return None
    if f.ftype == "D":
        if len(text) == 8 and text.isdigit():
            return datetime.date(int(text[:4]), int(text[4:6]), int(text[6:8]))
        return None
    if f.ftype == "M":
        # Memo fields store a .dbt block pointer (10-char ASCII number in
        # dBase III; 4-byte LE int in FoxPro-width fields).  With the .dbt
        # sidecar the pointer resolves to the memo text; without it (or on
        # a dangling pointer) tolerate as None rather than crash the task.
        if f.length == 4:
            block = struct.unpack("<i", raw[:4])[0] if len(raw) >= 4 else 0
        else:
            block = int(text) if text.isdigit() else 0
        if dbt is None or block <= 0:
            return None
        return read_memo(dbt, block, encoding)
    # FoxPro/dBASE-7 binary field types (the rest of the dbase-crate
    # surface the reference re-exports, src/lib.rs:60): fixed-width
    # little-endian payloads, not text
    if f.ftype == "I":  # Integer: i32 LE
        return struct.unpack("<i", raw[:4])[0] if len(raw) >= 4 else None
    if f.ftype in ("O", "B"):  # Double: f64 LE
        return struct.unpack("<d", raw[:8])[0] if len(raw) >= 8 else None
    if f.ftype == "Y":  # Currency: i64 LE scaled by 10^4
        return struct.unpack("<q", raw[:8])[0] / 10000.0 if len(raw) >= 8 else None
    if f.ftype == "T":  # DateTime: (julian day, ms since midnight), both i32 LE
        if len(raw) < 8:
            return None
        jdn, ms = struct.unpack("<ii", raw[:8])
        ordinal = jdn - 1721425  # JDN(0001-01-01)=1721426
        if not 1 <= ordinal <= datetime.date.max.toordinal():
            return None  # zero/corrupt sidecar values tolerate as None
        day = datetime.date.fromordinal(ordinal)
        return datetime.datetime.combine(day, datetime.time()) + datetime.timedelta(
            milliseconds=ms
        )
    return text


def _format_value(f: DbfField, value) -> bytes:
    if f.ftype == "C":
        s = "" if value is None else str(value)
        b = s.encode("ascii") if all(ord(c) < 128 for c in s) else s.encode("utf-8")
        return b[: f.length].ljust(f.length, b" ")
    if f.ftype in ("N", "F"):
        if value is None:
            return b" " * f.length
        if f.decimals == 0:
            s = str(int(value))
        else:
            s = f"{float(value):.{f.decimals}f}"
        b = s.encode("ascii")
        if len(b) > f.length:
            raise DbfError(f"value {s!r} exceeds field {f.name} width {f.length}")
        return b.rjust(f.length, b" ")
    if f.ftype == "L":
        if value is None:
            return b"?".ljust(f.length, b" ")
        return (b"T" if value else b"F").ljust(f.length, b" ")
    if f.ftype == "D":
        if value is None:
            return b" " * f.length
        return value.strftime("%Y%m%d").encode("ascii")[: f.length].ljust(f.length, b" ")
    if f.ftype == "I":
        return struct.pack("<i", 0 if value is None else int(value))
    if f.ftype in ("O", "B"):
        return struct.pack("<d", 0.0 if value is None else float(value))
    if f.ftype == "Y":
        # round-half-away like currency stores expect; exact for 4-decimal inputs
        q = 0 if value is None else int(round(float(value) * 10000))
        return struct.pack("<q", q)
    if f.ftype == "T":
        if value is None:
            return struct.pack("<ii", 0, 0)
        jdn = value.date().toordinal() + 1721425
        ms = (value.hour * 3600 + value.minute * 60 + value.second) * 1000 + value.microsecond // 1000
        return struct.pack("<ii", jdn, ms)
    if f.ftype == "M":
        # value = .dbt block index (from write_dbt); None = no memo
        if f.length == 4:
            return struct.pack("<i", 0 if value is None else int(value))
        s = "" if value is None else str(int(value))
        return s.encode("ascii").rjust(f.length, b" ")
    raise DbfError(f"unsupported field type {f.ftype}")


def write_dbf(
    fields: Sequence[DbfField],
    rows: Iterable[dict],
    encoding: str = "ascii",
    last_update: tuple = (2026, 1, 1),
) -> bytes:
    """Deterministic dBase III writer (fixed last-update date for
    byte-identical round trips, the write_tests.rs:18-151 analog).  The
    version byte advertises the memo sidecar (0x83) when any field is
    type ``M``, per the dBase III spec."""
    rows = list(rows)
    record_size = 1 + sum(f.length for f in fields)
    header_size = 32 + 32 * len(fields) + 1
    out = bytearray()
    yy, mm, dd = last_update
    version = 0x83 if any(f.ftype == "M" for f in fields) else 0x03
    out += struct.pack(
        "<BBBBIHH", version, (yy - 1900) % 256, mm, dd, len(rows), header_size, record_size
    )
    out += b"\x00" * 20
    for f in fields:
        name_b = f.name.encode(encoding)[:10]
        out += name_b.ljust(11, b"\x00")
        out += f.ftype.encode("ascii")
        out += b"\x00" * 4
        out += struct.pack("<BB", f.length, f.decimals)
        out += b"\x00" * 14
    out += b"\x0d"
    for row in rows:
        out += b" "
        for f in fields:
            value = row.get(f.name)
            if f.ftype == "C" and value is not None and encoding != "ascii":
                s = str(value)
                b = s.encode(encoding)[: f.length].ljust(f.length, b" ")
                out += b
            else:
                out += _format_value(f, value)
    out += b"\x1a"
    return bytes(out)
