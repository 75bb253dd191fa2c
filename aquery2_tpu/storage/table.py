"""Columnar storage model: device-resident columns and tables.

TPU-native counterpart of the reference's C++ containers
(``server/vector_type.hpp`` — malloc-backed vectors with view semantics —
and ``server/table.h`` — ``ColRef``/``TableInfo`` typed column tuples).
Design differences, deliberate (SURVEY.md §7):

* A column is a **padded JAX device array** plus a logical row count. The
  capacity is a shape *bucket* (powers of two, config.bucket_size) so that
  jitted kernels compile once per bucket instead of once per length — the
  TPU answer to the reference's geometric ``vector_type`` growth
  (vector_type.hpp:182-213) *and* to its per-query C++ recompiles.
* Strings are dictionary-encoded: int32 codes on device, the dictionary on
  host (``StringDict``). The reference stores char*/string_view columns
  (table.h, monetdbe_str) — pointers don't exist on TPU.
* Ragged values (grouped vectors, ``vec*`` column types, reference
  ``vector_type<vector_type<T>>`` common/types.py:123-142) are CSR-style:
  one flat padded device array + int64 offsets (``VectorColumn``).
* Column min/max stats for perfect-hash group-by (reference
  ``ColRef::populate_stats`` / ``TableStats`` table.h:60-98) are computed
  lazily on device and cached.

Nulls: a column may carry a validity bitmask; absent mask means all-valid
(the reference has only a `missing`/IS NULL operator, common/types.py:359).
"""

from __future__ import annotations

from typing import Any, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from aquery2_tpu import config
from aquery2_tpu import types as T
from aquery2_tpu.utils import CaseInsensitiveDict


class StringDict:
    """Append-only string dictionary shared by one or more columns.

    Codes are dense int32 starting at 0. ``rank`` maps code → lexicographic
    rank so ORDER BY on a string column can sort codes by rank entirely on
    device (recomputed lazily after appends).
    """

    __slots__ = ("_strings", "_index", "_ranks", "_rank_dirty")

    def __init__(self, strings: Iterable[str] = ()) -> None:
        self._strings: list[str] = []
        self._index: dict[str, int] = {}
        self._ranks: np.ndarray | None = None
        self._rank_dirty = True
        for s in strings:
            self.encode_one(s)

    def __len__(self) -> int:
        return len(self._strings)

    def encode_one(self, s: str) -> int:
        code = self._index.get(s)
        if code is None:
            code = len(self._strings)
            self._index[s] = code
            self._strings.append(s)
            self._rank_dirty = True
        return code

    def lookup(self, s: str) -> int:
        """Code for an existing string, or -1 (never matches any row)."""
        return self._index.get(s, -1)

    def encode(self, values: Sequence[str] | np.ndarray) -> np.ndarray:
        out = np.empty(len(values), dtype=np.int32)
        enc = self.encode_one
        for i, v in enumerate(values):
            out[i] = enc(v if isinstance(v, str) else str(v))
        return out

    def decode(self, codes: np.ndarray) -> np.ndarray:
        arr = np.asarray(self._strings, dtype=object)
        codes = np.asarray(codes)
        ok = (codes >= 0) & (codes < len(arr))
        out = np.where(ok, arr[np.clip(codes, 0, max(len(arr) - 1, 0))], None)
        return out

    @property
    def ranks(self) -> np.ndarray:
        """rank[code] = position of the string in sorted order."""
        if self._rank_dirty or self._ranks is None:
            order = np.argsort(np.asarray(self._strings, dtype=object), kind="stable")
            ranks = np.empty(len(order), dtype=np.int32)
            ranks[order] = np.arange(len(order), dtype=np.int32)
            self._ranks = ranks
            self._rank_dirty = False
        return self._ranks

    def strings(self) -> list[str]:
        return self._strings


def _pad_to(arr: np.ndarray | jax.Array, cap: int, fill: Any = 0) -> jax.Array:
    n = arr.shape[0]
    if n == cap:
        return jnp.asarray(arr)
    if n > cap:
        raise ValueError(f"array length {n} exceeds capacity {cap}")
    if isinstance(arr, np.ndarray):
        out = np.full((cap,), fill, dtype=arr.dtype)
        out[:n] = arr
        return jnp.asarray(out)
    pad = jnp.full((cap - n,), fill, dtype=arr.dtype)
    return jnp.concatenate([arr, pad])


class Column:
    """One named, typed device column.

    data: jax array of shape (capacity,), capacity = bucket(nrows).
    Rows past ``nrows`` are padding (zeros) — every kernel masks by length.
    """

    __slots__ = ("name", "sqltype", "data", "nrows", "dictionary", "valid", "_stats")

    def __init__(
        self,
        name: str,
        sqltype: T.SQLType,
        data: jax.Array | np.ndarray,
        nrows: int | None = None,
        dictionary: StringDict | None = None,
        valid: jax.Array | None = None,
    ) -> None:
        self.name = name
        self.sqltype = sqltype
        n = int(data.shape[0]) if nrows is None else int(nrows)
        cap = config.bucket_size(n)
        self.data: jax.Array = _pad_to(data, cap)
        self.nrows = n
        self.dictionary = dictionary
        self.valid = None if valid is None else _pad_to(valid, cap, False)
        self._stats: tuple[int, int] | None = None  # (min, max) over valid rows

    # -- constructors ------------------------------------------------------

    @classmethod
    def from_host(
        cls, name: str, sqltype: T.SQLType, values: Sequence[Any] | np.ndarray,
        dictionary: StringDict | None = None,
    ) -> "Column":
        # None values become SQL NULLs: stored as 0 + validity False
        valid = None
        if not isinstance(values, np.ndarray) and any(v is None for v in values):
            valid = np.asarray([v is not None for v in values], dtype=bool)
            values = [v if v is not None else 0 for v in values]
            if sqltype.is_string:
                values = [v if isinstance(v, str) else "" for v in values]
        if sqltype.is_string:
            d = dictionary if dictionary is not None else StringDict()
            codes = d.encode(list(values))
            return cls(name, sqltype, codes, dictionary=d, valid=valid)
        if sqltype.is_temporal:
            vals = [
                v if isinstance(v, (int, np.integer)) else T.parse_temporal_literal(sqltype, str(v))
                for v in values
            ]
            arr = np.asarray(vals, dtype=sqltype.np_dtype)
            return cls(name, sqltype, arr, valid=valid)
        arr = np.asarray(values, dtype=sqltype.np_dtype)
        return cls(name, sqltype, arr, valid=valid)

    # -- properties --------------------------------------------------------

    @property
    def capacity(self) -> int:
        return int(self.data.shape[0])

    @property
    def is_vector(self) -> bool:
        return False

    def stats(self) -> tuple[int, int]:
        """(min, max) over the valid prefix — drives perfect-hash group-by
        (reference ColRef::populate_stats, table.h:76-91)."""
        if self._stats is None:
            n = self.nrows
            if n == 0:
                self._stats = (0, 0)
            else:
                d = self.data[: self.capacity]
                idx = jnp.arange(self.capacity)
                big = jnp.iinfo(self.data.dtype).max if self.data.dtype.kind in "iu" else jnp.inf
                small = jnp.iinfo(self.data.dtype).min if self.data.dtype.kind in "iu" else -jnp.inf
                ok = idx < n
                if self.valid is not None:
                    ok = ok & self.valid[: self.capacity]
                mn = jnp.min(jnp.where(ok, d, big))
                mx = jnp.max(jnp.where(ok, d, small))
                self._stats = (int(mn), int(mx))
        return self._stats

    # -- conversion --------------------------------------------------------

    def to_numpy(self) -> np.ndarray:
        """Valid-prefix values on host (decoded for strings/temporal→raw ints)."""
        return np.asarray(self.data[: self.nrows])

    def to_python(self) -> list[Any]:
        """Display values: decoded strings, formatted dates, None for NULLs."""
        raw = self.to_numpy()
        t = self.sqltype
        if t.is_string and self.dictionary is not None:
            out = list(self.dictionary.decode(raw))
        elif t.kind == "date":
            out = [T.format_date(v) for v in raw]
        elif t.kind == "time":
            out = [T.format_time(v) for v in raw]
        elif t.kind == "timestamp":
            out = [T.format_timestamp(v) for v in raw]
        else:
            out = raw.tolist()
        if self.valid is not None:
            ok = np.asarray(self.valid[: self.nrows])
            out = [v if k else None for v, k in zip(out, ok)]
        return out

    def with_name(self, name: str) -> "Column":
        c = Column.__new__(Column)
        c.name = name
        c.sqltype = self.sqltype
        c.data = self.data
        c.nrows = self.nrows
        c.dictionary = self.dictionary
        c.valid = self.valid
        c._stats = self._stats
        return c

    def __repr__(self) -> str:
        return f"Column({self.name}:{self.sqltype.name}, n={self.nrows})"


class VectorColumn:
    """Ragged column: one vector value per row, CSR encoded.

    values: flat padded device array; offsets: int64 array of shape
    (capacity+1,) — row i spans values[offsets[i]:offsets[i+1]].
    Counterpart of reference ``vector_type<vector_type<T>>``.
    """

    __slots__ = ("name", "sqltype", "values", "offsets", "nrows", "dictionary")

    def __init__(
        self,
        name: str,
        sqltype: T.SQLType,  # a vec type; elem dtype = values dtype
        values: jax.Array | np.ndarray,
        offsets: jax.Array | np.ndarray,
        nrows: int | None = None,
        dictionary: StringDict | None = None,
        total: int | None = None,
    ) -> None:
        assert sqltype.is_vector, sqltype
        self.name = name
        self.sqltype = sqltype
        n = (int(offsets.shape[0]) - 1) if nrows is None else int(nrows)
        self.nrows = n
        cap = config.bucket_size(n)
        if total is None:   # pass total to skip this device→host sync
            total = int(np.asarray(offsets[-1])) if offsets.shape[0] else 0
        vcap = config.bucket_size(max(total, 1))
        self.values: jax.Array = _pad_to(values, vcap)
        if isinstance(offsets, jax.Array):
            # keep offsets ON DEVICE: pulling a groups-sized array over a
            # tunneled chip costs ~0.1 s/MB — host code pulls lazily via
            # np.asarray only when it actually formats/exports rows
            off_d = offsets.astype(jnp.int64)
            if off_d.shape[0] < cap + 1:
                last = off_d[-1] if off_d.shape[0] else jnp.zeros((), jnp.int64)
                pad = jnp.full((cap + 1 - off_d.shape[0],), last, jnp.int64)
                off_d = jnp.concatenate([off_d, pad])
            self.offsets = off_d[: cap + 1]
        else:
            off = np.zeros((cap + 1,), dtype=np.int64)
            off[: offsets.shape[0]] = np.asarray(offsets)
            if offsets.shape[0] < cap + 1:
                off[offsets.shape[0]:] = off[offsets.shape[0] - 1] if offsets.shape[0] else 0
            self.offsets = jnp.asarray(off)
        self.dictionary = dictionary

    @classmethod
    def from_lists(
        cls, name: str, sqltype: T.SQLType, lists: Sequence[Sequence[Any]],
        dictionary: StringDict | None = None,
    ) -> "VectorColumn":
        elem = sqltype.elem
        offsets = np.zeros(len(lists) + 1, dtype=np.int64)
        for i, row in enumerate(lists):
            offsets[i + 1] = offsets[i] + len(row)
        flat = np.empty(int(offsets[-1]), dtype=elem.np_dtype)
        pos = 0
        for row in lists:
            for v in row:
                flat[pos] = v
                pos += 1
        return cls(name, sqltype, flat, offsets, nrows=len(lists), dictionary=dictionary)

    @property
    def capacity(self) -> int:
        return int(self.offsets.shape[0]) - 1

    @property
    def is_vector(self) -> bool:
        return True

    def total_values(self) -> int:
        return int(np.asarray(self.offsets[self.nrows]))

    def to_python(self) -> list[list[Any]]:
        vals = np.asarray(self.values)
        offs = np.asarray(self.offsets)
        out = []
        for i in range(self.nrows):
            seg = vals[offs[i]: offs[i + 1]]
            if self.sqltype.elem is not None and self.sqltype.elem.is_string and self.dictionary:
                out.append(list(self.dictionary.decode(seg)))
            else:
                out.append(seg.tolist())
        return out

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.values)[: self.total_values()]

    def with_name(self, name: str) -> "VectorColumn":
        c = VectorColumn.__new__(VectorColumn)
        c.name = name
        c.sqltype = self.sqltype
        c.values = self.values
        c.offsets = self.offsets
        c.nrows = self.nrows
        c.dictionary = self.dictionary
        return c

    def __repr__(self) -> str:
        return f"VectorColumn({self.name}:{self.sqltype.name}, n={self.nrows})"


AnyColumn = Column  # union alias for typing docs; VectorColumn also accepted


class Table:
    """Named collection of equal-length columns.

    Counterpart of reference ``TableInfo`` (server/table.h:345-614) and the
    Python-side ``TableInfo`` (engine/storage.py). Carries ASSUMING
    sortedness metadata: ``sorted_by`` is a tuple of (colname, ascending)
    if the rows are known sorted (reference tracks assumptions per query,
    engine/ast.py:312-316; we keep them as table state so repeated windows
    skip the sort)."""

    def __init__(self, name: str, columns: Iterable[Column | VectorColumn] = ()) -> None:
        self.name = name
        self.columns: CaseInsensitiveDict[Column | VectorColumn] = CaseInsensitiveDict()
        self.sorted_by: tuple[tuple[str, bool], ...] = ()
        for c in columns:
            self.add_column(c)

    # -- schema ------------------------------------------------------------

    def add_column(self, col: Column | VectorColumn) -> None:
        if len(self.columns) and col.nrows != self.nrows:
            raise ValueError(
                f"column {col.name} has {col.nrows} rows, table {self.name} has {self.nrows}"
            )
        self.columns[col.name] = col

    @property
    def nrows(self) -> int:
        for c in self.columns.values():
            return c.nrows
        return 0

    @property
    def ncols(self) -> int:
        return len(self.columns)

    def column_names(self) -> list[str]:
        return list(self.columns)

    def __getitem__(self, name: str) -> Column | VectorColumn:
        return self.columns[name]

    def __contains__(self, name: str) -> bool:
        return name in self.columns

    def schema(self) -> list[tuple[str, T.SQLType]]:
        return [(c.name, c.sqltype) for c in self.columns.values()]

    def has_nulls(self, names: Iterable[str] | None = None) -> bool:
        """True if any (named) column carries a validity mask — used by the
        fused fast paths to fall back to the null-aware general executor."""
        cols = (self.columns.values() if names is None
                else [self.columns[n] for n in names if n in self.columns])
        return any(getattr(c, "valid", None) is not None for c in cols)

    # -- data --------------------------------------------------------------

    def append_rows(self, rows: Sequence[Sequence[Any]]) -> None:
        """INSERT INTO ... VALUES — append host rows to device columns."""
        if not rows:
            return
        cols = list(self.columns.values())
        if any(len(r) != len(cols) for r in rows):
            raise ValueError("row arity mismatch")
        for j, col in enumerate(cols):
            vals = [r[j] for r in rows]
            self.columns[col.name] = _append_host_values(col, vals)

    def append_table(self, other: "Table") -> None:
        """INSERT INTO t SELECT ... — append another table's rows."""
        if other.nrows == 0:
            return
        mine = list(self.columns.values())
        theirs = list(other.columns.values())
        if len(mine) != len(theirs):
            raise ValueError("column count mismatch in append")
        for col, src in zip(mine, theirs):
            self.columns[col.name] = _append_column(col, src)

    def head(self, k: int = 10) -> str:
        from aquery2_tpu.storage.result import Result

        return Result(self).format(limit=k)

    def __repr__(self) -> str:
        cols = ", ".join(f"{c.name}:{c.sqltype.name}" for c in self.columns.values())
        return f"Table({self.name}: [{cols}] x {self.nrows})"


def _append_host_values(col: Column | VectorColumn, vals: Sequence[Any]) -> Column | VectorColumn:
    t = col.sqltype
    if isinstance(col, VectorColumn):
        lists = [v if isinstance(v, (list, tuple)) else [v] for v in vals]
        newpart = VectorColumn.from_lists(col.name, t, lists, dictionary=col.dictionary)
        return _append_column(col, newpart)
    if t.is_string:
        d = col.dictionary if col.dictionary is not None else StringDict()
        arr = d.encode([v if isinstance(v, str) else str(v) for v in vals])
        add = Column(col.name, t, arr, dictionary=d)
    else:
        add = Column.from_host(col.name, t, vals)
    add.dictionary = col.dictionary if col.dictionary is not None else add.dictionary
    return _append_column(col, add)


def _append_column(col: Column | VectorColumn, src: Column | VectorColumn) -> Column | VectorColumn:
    """Concatenate src under col (dictionary-translating string codes)."""
    if isinstance(col, VectorColumn) or isinstance(src, VectorColumn):
        assert isinstance(col, VectorColumn) and isinstance(src, VectorColumn)
        n1, n2 = col.nrows, src.nrows
        t1, t2 = col.total_values(), src.total_values()
        vals = jnp.concatenate([col.values[:t1], src.values[:t2].astype(col.values.dtype)])
        off1 = np.asarray(col.offsets[: n1 + 1])
        off2 = np.asarray(src.offsets[: n2 + 1])
        offsets = np.concatenate([off1, off2[1:] + off1[-1]])
        return VectorColumn(col.name, col.sqltype, vals, offsets, nrows=n1 + n2,
                            dictionary=col.dictionary)
    n1, n2 = col.nrows, src.nrows
    a = col.data[:n1]
    b = src.data[:n2]
    dictionary = col.dictionary
    if col.sqltype.is_string:
        if dictionary is None:
            dictionary = src.dictionary
        elif src.dictionary is not None and src.dictionary is not dictionary:
            # translate src codes into col's dictionary
            remap = np.asarray(
                [dictionary.encode_one(s) for s in src.dictionary.strings()],
                dtype=np.int32,
            )
            b = jnp.asarray(remap)[b] if len(remap) else b
    out = jnp.concatenate([a, b.astype(a.dtype)])
    valid = None
    if col.valid is not None or src.valid is not None:
        va = col.valid[:n1] if col.valid is not None else jnp.ones(n1, jnp.bool_)
        vb = src.valid[:n2] if src.valid is not None else jnp.ones(n2, jnp.bool_)
        valid = jnp.concatenate([va, vb])
    return Column(col.name, col.sqltype, out, nrows=n1 + n2,
                  dictionary=dictionary, valid=valid)
