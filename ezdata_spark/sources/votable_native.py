"""Pure-stdlib VOTable reader/writer — no astropy required.

The reference reads VOTables via astropy (simpletable.py:1551-1565).
VOTable is a public XML format (IVOA VOTable 1.4); the TABLEDATA
serialization the reference exchanges is plain XML rows, so it parses
with ``xml.etree.ElementTree`` driver-side. VOTables are small
interchange files (catalog query results), so a driver parse +
``createDataFrame`` is the right scale posture — bulk data belongs in
Parquet/FITS/HDF5.

Supported: VOTABLE/RESOURCE/TABLE/FIELD metadata (name, datatype,
arraysize, unit, description), TABLEDATA rows, empty-cell nulls, and
numeric array cells (space-separated per the standard). BINARY/
BINARY2/FITS streams raise a clear error.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T

# IVOA datatype -> (Spark type, python converter)
_VO_TYPES: dict[str, tuple[T.DataType, type]] = {
    "boolean": (T.BooleanType(), bool),
    "unsignedByte": (T.ShortType(), int),
    "short": (T.ShortType(), int),
    "int": (T.IntegerType(), int),
    "long": (T.LongType(), int),
    "float": (T.FloatType(), float),
    "double": (T.DoubleType(), float),
    "char": (T.StringType(), str),
    "unicodeChar": (T.StringType(), str),
}

_SPARK_VO = {
    T.BooleanType: "boolean", T.ByteType: "short", T.ShortType: "short",
    T.IntegerType: "int", T.LongType: "long",
    T.FloatType: "float", T.DoubleType: "double", T.StringType: "char",
}


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _find_all(el, name: str):
    return [c for c in el.iter() if _strip_ns(c.tag) == name]


def _conv_bool(s: str) -> bool:
    return s.strip().lower() in ("t", "true", "1")


def _parse_cell(text: str | None, dt: str, is_array: bool):
    if text is None or text.strip() == "":
        return None
    if dt in ("char", "unicodeChar"):
        return text
    conv = _conv_bool if dt == "boolean" else _VO_TYPES[dt][1]
    if is_array:
        return [conv(tok) for tok in text.split()]
    return conv(text.strip())


def read_votable_native(spark: SparkSession, path: str):
    """VOTable scan without astropy (parity for simpletable.py:1551-1565).

    Returns an EzTable carrying FIELD unit/description metadata.
    """
    from ..table import EzTable

    root = ET.parse(path).getroot()
    tables = _find_all(root, "TABLE")
    if not tables:
        raise ValueError(f"{path}: no TABLE element in VOTABLE")
    table = tables[0]

    fields = []
    for fel in _find_all(table, "FIELD"):
        name = fel.get("name") or fel.get("ID") or f"col{len(fields)}"
        dt = fel.get("datatype", "char")
        if dt not in _VO_TYPES:
            raise NotImplementedError(f"VOTable datatype {dt!r} not supported")
        arraysize = fel.get("arraysize")
        # char arrays are strings, not array<string>
        is_array = arraysize is not None and dt not in ("char", "unicodeChar")
        desc_el = next(iter(_find_all(fel, "DESCRIPTION")), None)
        fields.append({
            "name": name, "dt": dt, "is_array": is_array,
            "unit": fel.get("unit"),
            "desc": desc_el.text.strip() if desc_el is not None and desc_el.text else None,
        })

    data = _find_all(table, "DATA")
    if data and (_find_all(data[0], "BINARY") or _find_all(data[0], "BINARY2")
                 or _find_all(data[0], "FITS")):
        raise NotImplementedError(
            "only the TABLEDATA VOTable serialization is supported without "
            "astropy (BINARY/BINARY2/FITS streams need astropy)"
        )

    rows = []
    for tr in _find_all(table, "TR"):
        tds = [c for c in tr if _strip_ns(c.tag) == "TD"]
        rows.append([
            _parse_cell(td.text, f["dt"], f["is_array"])
            for td, f in zip(tds, fields)
        ])

    schema = T.StructType([
        T.StructField(
            f["name"],
            T.ArrayType(_VO_TYPES[f["dt"]][0]) if f["is_array"] else _VO_TYPES[f["dt"]][0],
            True,
        )
        for f in fields
    ])
    df = spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)
    units = {f["name"]: f["unit"] for f in fields if f["unit"]}
    desc = {f["name"]: f["desc"] for f in fields if f["desc"]}
    return EzTable(df, units=units, desc=desc)


def _fmt_cell(v, dt: str) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, (list, tuple)):
        return " ".join(_fmt_cell(x, dt) for x in v)
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _esc(s: str) -> str:
    # quotes must be escaped too: _esc output lands inside double-quoted
    # attribute values (FIELD name/unit)
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def write_votable(t, path: str) -> None:
    """Write a table as a VOTable 1.4 TABLEDATA file (driver-side collect,
    interchange-scale like the reference's astropy path). Units ride on
    FIELD elements so the native reader round-trips them."""
    df = getattr(t, "df", t)
    units = dict(getattr(t, "units", {}) or {})
    pdf = df.toPandas()

    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<VOTABLE version="1.4" xmlns="http://www.ivoa.net/xml/VOTable/v1.3">',
        "<RESOURCE><TABLE>",
    ]
    specs = []
    for f in df.schema.fields:
        dt = f.dataType
        if isinstance(dt, T.ArrayType):
            el = _SPARK_VO.get(type(dt.elementType))
            if el is None or el == "char":
                raise ValueError(f"write_votable: unsupported array element {dt.elementType}")
            lines.append(
                f'<FIELD name="{_esc(f.name)}" datatype="{el}" arraysize="*"'
                + (f' unit="{_esc(str(units[f.name]))}"' if f.name in units else "")
                + "/>"
            )
            specs.append((f.name, el))
        else:
            vo = _SPARK_VO.get(type(dt))
            if vo is None:
                raise ValueError(f"write_votable: unsupported Spark type {dt} for {f.name!r}")
            extra = ' arraysize="*"' if vo == "char" else ""
            lines.append(
                f'<FIELD name="{_esc(f.name)}" datatype="{vo}"{extra}'
                + (f' unit="{_esc(str(units[f.name]))}"' if f.name in units else "")
                + "/>"
            )
            specs.append((f.name, vo))
    import numpy as np

    lines.append("<DATA><TABLEDATA>")
    # per-column iteration: pdf.iterrows() would coerce each row to one
    # unified dtype (ints become floats next to a float column)
    col_vals = {name: pdf[name].tolist() for name, _ in specs}
    for i in range(len(pdf)):
        cells = []
        for name, dt in specs:
            v = col_vals[name][i]
            if isinstance(v, np.ndarray):
                v = v.tolist()
            elif not isinstance(v, (list, tuple)):
                if v is not None and pd.isna(v):
                    v = None
                elif isinstance(v, np.generic):
                    v = v.item()
            cells.append(f"<TD>{_esc(_fmt_cell(v, dt))}</TD>")
        lines.append("<TR>" + "".join(cells) + "</TR>")
    lines.append("</TABLEDATA></DATA></TABLE></RESOURCE></VOTABLE>")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines))
