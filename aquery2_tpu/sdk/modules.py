"""LOAD MODULE implementation: python and C modules.

Reference flow: `LOAD MODULE FROM "libirf.so" FUNCTIONS (newtree(...)->
bool, ...)` emits 'M'/'F' commands; the server dlopens the lib and
resolves symbols into module_function_maps (server.cpp:308-331). Here the
session owns a registry mapping function name → ModuleFunction; the
expression evaluator calls them like builtins (engine/eval.py _call).
"""

from __future__ import annotations

import ctypes
import importlib.util
import os
from dataclasses import dataclass
from typing import Any, Callable

import numpy as np

from aquery2_tpu import types as T
from aquery2_tpu.parser import ast_nodes as A


@dataclass
class ModuleFunction:
    name: str
    params: list[tuple[str, T.SQLType]]
    ret_type: T.SQLType
    fn: Callable
    module_path: str


def load_module(session, stmt: A.LoadModule) -> None:
    path = session.resolve_path(stmt.path)
    if path.endswith(".py") or os.path.exists(path + ".py"):
        if not path.endswith(".py"):
            path = path + ".py"
        mod = _load_python_module(path)
        getter = lambda name: getattr(mod, name)
    elif path.endswith(".so"):
        lib = ctypes.CDLL(path)
        getter = lambda name: _wrap_c_function(lib, name)
    else:
        raise ValueError(f"unsupported module type: {path}")

    session.modules[path] = getter
    for sig in stmt.functions:
        params = [(n, T.from_sql_name(t)) for n, t in sig.params]
        ret = T.from_sql_name(sig.ret_type)
        raw = getter(sig.name)
        if path.endswith(".so"):
            raw = _bind_c_signature(raw, params, ret)
        session.module_functions[sig.name.lower()] = ModuleFunction(
            sig.name.lower(), params, ret, raw, path)
    # reference runs the module's init_session if present (server.cpp:166-174)
    try:
        init = getter("init_session")
    except AttributeError:
        init = None
    if init is not None and path.endswith(".py"):
        init(session)


def _load_python_module(path: str):
    name = "aq_module_" + os.path.basename(path)[:-3]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# --- C ABI (see sdk/aquery_tpu_module.h) ----------------------------------

_C_SCALAR = {
    "int": ctypes.c_int32, "bool": ctypes.c_bool, "tinyint": ctypes.c_int8,
    "smallint": ctypes.c_int16, "bigint": ctypes.c_int64,
    "real": ctypes.c_float, "double": ctypes.c_double,
}


def _wrap_c_function(lib: ctypes.CDLL, name: str):
    try:
        return getattr(lib, name)
    except AttributeError:
        raise AttributeError(f"symbol {name} not found in module") from None


def _bind_c_signature(cfn, params, ret: T.SQLType):
    """Build a python wrapper marshalling numpy arrays to the C ABI:
    scalar → by value; vec<T> → (const T* data, int64 len);
    vecvec<T> → (const T* data, int64 rows, int64 cols) row-major.
    Vector returns: the C side fills a caller-allocated out buffer and
    returns its length: int64 f_out(..., T* out, int64 out_cap)."""

    def wrapper(*args):
        cargs: list[Any] = []
        keepalive: list[np.ndarray] = []   # pin buffers for the call
        n_rows = 0
        for (pname, pt), a in zip(params, args):
            if pt.is_vector and pt.elem is not None and pt.elem.is_vector:
                arr = np.ascontiguousarray(a, dtype=pt.elem.elem.np_dtype)
                assert arr.ndim == 2
                n_rows = arr.shape[0]
                cargs += [arr.ctypes.data_as(ctypes.c_void_p),
                          ctypes.c_int64(arr.shape[0]),
                          ctypes.c_int64(arr.shape[1])]
                keepalive.append(arr)
            elif pt.is_vector:
                arr = np.ascontiguousarray(a, dtype=pt.elem.np_dtype)
                n_rows = max(n_rows, arr.shape[0])
                cargs += [arr.ctypes.data_as(ctypes.c_void_p),
                          ctypes.c_int64(arr.shape[0])]
                keepalive.append(arr)
            else:
                ct = _C_SCALAR.get(pt.name, ctypes.c_double)
                cargs.append(ct(a if not hasattr(a, "item") else a.item()))
        if ret.is_vector:
            out = np.zeros(max(n_rows, 1), dtype=ret.elem.np_dtype)
            cfn.restype = ctypes.c_int64
            m = cfn(*cargs, out.ctypes.data_as(ctypes.c_void_p),
                    ctypes.c_int64(out.shape[0]))
            del keepalive
            return out[:m]
        cfn.restype = _C_SCALAR.get(ret.name, ctypes.c_double)
        res = cfn(*cargs)
        del keepalive
        return res

    return wrapper


# --- call path from the evaluator ----------------------------------------

def call_module_function(ctx, fn: ModuleFunction, arg_exprs: list):
    from aquery2_tpu.engine.eval import Value
    from aquery2_tpu.storage.table import VectorColumn

    args = []
    for e, (pname, pt) in zip(arg_exprs, fn.params):
        if isinstance(e, A.ColumnRef):
            # vector columns pass whole (reference vecvec args, tests/rf.a)
            try:
                si, col = ctx.ws.vector_column(e.name, e.table)
            except Exception:
                col = None
            if col is not None and isinstance(col, VectorColumn):
                args.append(_vector_column_to_host(col))
                continue
        v = ctx.eval(e)
        if v.pack_cols is not None:
            n = ctx.ws.n
            mat = np.stack([np.asarray(c)[:n] for c in v.pack_cols], axis=1)
            args.append(mat)
        elif v.kind == "scalar":
            args.append(v.data)
        else:
            args.append(np.asarray(ctx.to_row(v).data)[: ctx.ws.n])

    res = fn.fn(*args)
    return _wrap_result(ctx, res, fn.ret_type)


def _vector_column_to_host(col):
    vals = np.asarray(col.values)
    offs = np.asarray(col.offsets)
    lens = offs[1: col.nrows + 1] - offs[: col.nrows]
    if col.nrows and (lens == lens[0]).all():
        k = int(lens[0])
        return vals[: col.nrows * k].reshape(col.nrows, k)
    return [vals[offs[i]: offs[i + 1]] for i in range(col.nrows)]


def _wrap_result(ctx, res, ret_type: T.SQLType):
    from aquery2_tpu.engine.eval import Value
    import jax.numpy as jnp

    if res is None:
        return Value("scalar", True, T.BoolT)
    if isinstance(res, (bool, np.bool_)):
        return Value("scalar", bool(res), T.BoolT)
    if isinstance(res, (int, np.integer)):
        return Value("scalar", int(res), T.LongT)
    if isinstance(res, (float, np.floating)):
        return Value("scalar", float(res), T.DoubleT)
    arr = np.asarray(res)
    if arr.ndim == 1 and arr.shape[0] == ctx.ws.n:
        cap = ctx.ws.capacity
        out = np.zeros(cap, dtype=arr.dtype)
        out[: arr.shape[0]] = arr
        elem = ret_type.elem if ret_type.is_vector else ret_type
        return Value("row", jnp.asarray(out), elem)
    # other lengths: return as a single-row vector value
    elem = ret_type.elem if ret_type.is_vector else ret_type
    return Value("scalar", arr.tolist(), T.VectorT(elem))
