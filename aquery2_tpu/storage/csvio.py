"""CSV ingest/export.

Counterpart of the reference's LOAD DATA paths: MonetDB `COPY OFFSET 2`
for plain loads (engine/ast.py:1427-1437) and the generated
`AQCSVReader<N,sep,eol>` C++ loop for `LOAD COMPLEX DATA` with vector
cells (engine/ast.py:1448-1496, vendored csv.h). Here:

* plain loads use pandas' C CSV reader when available (vectorized parse →
  numpy → single device transfer), falling back to a pure-Python reader;
* complex loads (vec columns, element separator) use the Python reader;
* a native C++ scanner (aquery2_tpu/native) can be slotted in via
  AQ_TPU_NATIVE_CSV=1 once built.

Header handling: the reference unconditionally skips the first line
(COPY OFFSET 2). We auto-detect: skip the first line iff it does not
parse under the table schema.
"""

from __future__ import annotations

import numpy as np

from aquery2_tpu import types as T
from aquery2_tpu.storage.table import Column, StringDict, Table, VectorColumn


def _parse_cell(t: T.SQLType, tok: str):
    tok = tok.strip()
    if tok == "" and t.kind != "str":
        return None                     # empty cell → SQL NULL
    if t.kind == "int":
        return int(tok)
    if t.kind == "float":
        return float(tok)
    if t.is_temporal:
        return T.parse_temporal_literal(t, tok)
    if t.kind == "bool":
        return tok.lower() in ("1", "true", "t", "yes")
    return tok  # string


def _line_parses(schema, toks) -> bool:
    if len(toks) != len(schema):
        return False
    try:
        for (_, t), tok in zip(schema, toks):
            if t.is_vector:
                continue
            _parse_cell(t, tok)
        return True
    except (ValueError, TypeError):
        return False


def load_csv_into(table: Table, path: str, field_sep: str = ",",
                  element_sep: str = ";", complex_cells: bool = False) -> int:
    """Append file rows into an existing table; returns row count loaded."""
    schema = table.schema()
    has_vec = any(t.is_vector for _, t in schema)
    if complex_cells or has_vec:
        return _load_python(table, path, field_sep, element_sep)
    n = _load_native(table, path, field_sep)
    if n is not None:
        return n
    n = _load_pandas(table, path, field_sep)
    if n is not None:
        return n
    return _load_python(table, path, field_sep, element_sep)


def _load_native(table: Table, path: str, sep: str) -> int | None:
    """All-numeric fast path via the C++ scanner (aquery2_tpu/native)."""
    schema = table.schema()
    if len(sep) != 1 or any(not t.is_numeric for _, t in schema):
        return None
    from aquery2_tpu import native

    with open(path) as f:
        first = f.readline().rstrip("\n").split(sep)
    skip_header = not _line_parses(schema, first)
    res = native.parse_numeric_csv(
        path, [t.np_dtype for _, t in schema], sep, skip_header)
    if res is None:
        return None
    cols, masks = res
    from aquery2_tpu.storage.table import _append_column

    for (name, t), arr, valid in zip(schema, cols, masks):
        add = Column(name, t, arr, valid=valid)
        table.columns[name] = _append_column(table.columns[name], add)
    return len(cols[0]) if cols else 0


def _load_pandas(table: Table, path: str, sep: str) -> int | None:
    try:
        import pandas as pd
    except ImportError:
        return None
    schema = table.schema()
    # header detection on first line
    with open(path) as f:
        first = f.readline().rstrip("\n").split(sep)
    skip = 0 if _line_parses(schema, first) else 1
    try:
        df = pd.read_csv(
            path, sep=sep, header=None, skiprows=skip,
            names=[n for n, _ in schema], skipinitialspace=True,
            dtype={n: (t.np_dtype if t.is_numeric else object)
                   for n, t in schema if not t.is_temporal},
        )
    except Exception:
        return None
    rows = len(df)
    if rows == 0:
        return 0
    newcols = []
    for name, t in schema:
        col = table.columns[name]
        s = df[name]
        if t.is_string:
            d = col.dictionary if col.dictionary is not None else StringDict()
            arr = d.encode([str(v).strip() for v in s.tolist()])
            add = Column(name, t, arr, dictionary=d)
        elif t.is_temporal:
            vals = [T.parse_temporal_literal(t, str(v)) for v in s.tolist()]
            add = Column(name, t, np.asarray(vals, dtype=t.np_dtype))
        else:
            arr = s.to_numpy().astype(t.np_dtype, copy=False)
            valid = None
            if t.kind == "float":
                nan = np.isnan(arr)
                if nan.any():           # empty cells → NaN → NULL
                    valid = ~nan
                    arr = np.where(nan, 0.0, arr)
            add = Column(name, t, arr, valid=valid)
        newcols.append(add)
    from aquery2_tpu.storage.table import _append_column

    for add in newcols:
        table.columns[add.name] = _append_column(table.columns[add.name], add)
    return rows


def _load_python(table: Table, path: str, field_sep: str, element_sep: str) -> int:
    schema = table.schema()
    host_cols: list[list] = [[] for _ in schema]
    with open(path) as f:
        lines = f.read().splitlines()
    if not lines:
        return 0
    start = 0
    first = lines[0].split(field_sep)
    if not _line_parses(schema, first):
        start = 1
    count = 0
    for line in lines[start:]:
        if not line.strip():
            continue
        toks = line.split(field_sep)
        if len(toks) != len(schema):
            raise ValueError(
                f"{path}: row has {len(toks)} fields, expected {len(schema)}")
        for j, ((_, t), tok) in enumerate(zip(schema, toks)):
            if t.is_vector:
                elems = [e for e in tok.split(element_sep) if e.strip() != ""]
                host_cols[j].append([_parse_cell(t.elem, e) for e in elems])
            else:
                host_cols[j].append(_parse_cell(t, tok))
        count += 1
    # build per-column appends
    from aquery2_tpu.storage.table import _append_column

    for j, (name, t) in enumerate(schema):
        col = table.columns[name]
        if t.is_vector:
            add = VectorColumn.from_lists(name, t, host_cols[j],
                                          dictionary=getattr(col, "dictionary", None))
        elif t.is_string:
            d = col.dictionary if col.dictionary is not None else StringDict()
            arr = d.encode([str(v) for v in host_cols[j]])
            add = Column(name, t, arr, dictionary=d)
        elif any(v is None for v in host_cols[j]):
            add = Column.from_host(name, t, host_cols[j])   # nulls → mask
        else:
            add = Column(name, t, np.asarray(host_cols[j], dtype=t.np_dtype))
        table.columns[name] = _append_column(col, add)
    return count
