"""UDF execution: scalar FUNCTIONs and AGGREGATION FUNCTIONs.

Reference semantics (engine/ast.py:1551-1812): a FUNCTION body is a list
of `:=` assignments whose last expression is the return value; an
AGGREGATION FUNCTION additionally gets `_builtin_len` (group size) and
`_builtin_ret` (output vector) and may use if/elif/else and for loops with
element indexing x[i] and slicing x(a, b).

Execution strategy here:
* scalar FUNCTIONs are **inlined** into the device expression evaluator —
  assignments become local bindings, so `sd(x)=sqrt(covariance(x,x))`
  composes into one traced JAX graph (no dlopen'd lambdas).
* AGGREGATION FUNCTIONs are interpreted per group on host NumPy for now —
  their imperative bodies (data-dependent loops over scalars) do not map
  to XLA control flow without a real lowering pass; this matches the
  capability (tests/udf3.a) while staying exact. TODO(round2): trace
  loop bodies with lax.fori_loop + masked slices for device execution.
* scalar FUNCTIONs called with all-scalar args (tests/jose_gh.a
  `select myCov(1,2)`) also take the host path, which supports control
  flow on scalars.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from aquery2_tpu import types as T
from aquery2_tpu.parser import ast_nodes as A


class UdfError(Exception):
    pass


class Udf:
    def __init__(self, stmt: A.CreateFunction):
        self.name = stmt.name.lower()
        self.params = stmt.params
        self.body = stmt.body
        self.is_aggregation = stmt.is_aggregation

    def __repr__(self):
        kind = "AGGREGATION FUNCTION" if self.is_aggregation else "FUNCTION"
        return f"<{kind} {self.name}({', '.join(self.params)})>"


def _has_control_flow(body) -> bool:
    return any(isinstance(s, (A.UdfIf, A.UdfFor)) for s in body)


def run_scalar_udf(ctx, udf: Udf, args: list):
    """Inline a scalar FUNCTION into the device evaluator."""
    from aquery2_tpu.engine.eval import Value

    if all(v.kind == "scalar" for v in args) or _has_control_flow(udf.body):
        # host path (supports control flow)
        if ctx.session is not None:
            ctx.session.stats.note_udf("scalar_host")
        np_args = [_to_host(ctx, v) for v in args]
        res = _HostEval(ctx, dict(zip(udf.params, np_args))).run(udf.body)
        return _from_host(ctx, res)

    if ctx.session is not None:
        ctx.session.stats.note_udf("scalar_device")
    frame = dict(zip(udf.params, args))
    ctx.env.append(frame)
    try:
        result = None
        for stmt in udf.body:
            if isinstance(stmt, A.UdfAssign):
                if not isinstance(stmt.target, A.ColumnRef):
                    raise UdfError("indexed assignment needs AGGREGATION FUNCTION")
                val = ctx.eval(stmt.value)
                if stmt.op != ":=":
                    cur = frame.get(stmt.target.name)
                    if cur is None:
                        raise UdfError(f"augmented assign to unbound {stmt.target.name}")
                    op = {"+=": "+", "-=": "-", "*=": "*", "/=": "/"}[stmt.op]
                    val = ctx._binop_values(op, cur, val) if hasattr(ctx, "_binop_values") \
                        else _combine(ctx, op, cur, val)
                frame[stmt.target.name] = val
            elif isinstance(stmt, A.UdfExprStmt):
                result = ctx.eval(stmt.expr)
            else:
                raise UdfError("control flow in vector scalar UDF not supported")
        if result is None:
            raise UdfError(f"FUNCTION {udf.name} has no return expression")
        return result
    finally:
        ctx.env.pop()


def _combine(ctx, op, a, b):
    from aquery2_tpu.engine import eval as ev

    node = A.BinOp(op, A.Literal(0), A.Literal(0))  # op carrier
    # direct computation without re-walking AST:
    kind = ev._result_kind(a.kind, b.kind)
    import jax.numpy as jnp

    av = ctx.to_row(a).data if kind == "row" else a.data
    bv = ctx.to_row(b).data if kind == "row" else b.data
    fn = {"+": jnp.add, "-": jnp.subtract, "*": jnp.multiply,
          "/": jnp.true_divide}[op]
    t = T.promote(a.sqltype, b.sqltype) if op != "/" else T.div_type(a.sqltype, b.sqltype)
    return ev.Value(kind, fn(av, bv), t)


def run_aggregation_udf(ctx, udf: Udf, args: list):
    """AGGREGATION FUNCTION: device lowering first (engine/udf_device.py
    traces :=/if/for bodies into one vmapped jitted program), host NumPy
    interpreter as the fallback for untraceable bodies."""
    from aquery2_tpu.engine import udf_device
    from aquery2_tpu.engine.eval import Value

    dv = udf_device.try_run_aggregation_udf(ctx, udf, args)
    if dv is not None:
        if ctx.session is not None:
            ctx.session.stats.note_udf("traced")
        return dv

    if ctx.session is not None:
        ctx.session.stats.note_udf("interpreted")
    offsets = ctx.np_offsets()
    G = ctx.G
    np_args = [_to_host(ctx, v) for v in args]

    per_group_rets: list[np.ndarray] = []
    per_group_scalars: list[Any] = []
    returns_vector = False
    for g in range(G):
        lo, hi = int(offsets[g]), int(offsets[g + 1])
        env: dict[str, Any] = {}
        for p, a in zip(udf.params, np_args):
            env[p] = a[lo:hi] if isinstance(a, np.ndarray) else a
        env["_builtin_len"] = hi - lo
        env["_builtin_ret"] = np.zeros(hi - lo, dtype=np.float64)
        h = _HostEval(ctx, env)
        res = h.run(udf.body)
        if res is None or h.ret_written:
            returns_vector = True
            per_group_rets.append(env["_builtin_ret"])
        else:
            per_group_scalars.append(res)

    if returns_vector:
        import jax.numpy as jnp

        flat = np.concatenate(per_group_rets) if per_group_rets else np.zeros(0)
        cap = ctx.ws.capacity
        out = np.zeros(cap, dtype=np.float64)
        out[: len(flat)] = flat
        return Value("row", jnp.asarray(out), T.DoubleT)
    import jax.numpy as jnp

    arr = np.zeros(ctx.gcap, dtype=np.float64)
    arr[:G] = np.asarray(per_group_scalars, dtype=np.float64)
    return Value("group", jnp.asarray(arr), T.DoubleT)


def _to_host(ctx, v) -> Any:
    if v.kind == "scalar":
        return v.data
    arr = np.asarray(ctx.to_row(v).data)
    return arr


def _from_host(ctx, res):
    from aquery2_tpu.engine.eval import Value

    if isinstance(res, np.ndarray):
        import jax.numpy as jnp

        return Value("row", jnp.asarray(res), T.from_np_dtype(res.dtype))
    if isinstance(res, (bool, np.bool_)):
        return Value("scalar", bool(res), T.BoolT)
    if isinstance(res, (int, np.integer)):
        return Value("scalar", int(res), T.LongT)
    if res is None:
        return Value("scalar", None, T.DoubleT)
    return Value("scalar", float(res), T.DoubleT)


# --- host interpreter for UDF bodies --------------------------------------

class _HostEval:
    """NumPy interpreter for UDF bodies (reference behavior of the
    generated C++ lambdas, engine/ast.py:1610-1801)."""

    def __init__(self, ctx, env: dict[str, Any]):
        self.ctx = ctx          # for nested UDF calls
        self.env = env
        self.ret_written = False

    # statements; returns the value of the last bare expression
    def run(self, body) -> Any:
        last = None
        for stmt in body:
            last = self.stmt(stmt)
        return last

    def stmt(self, s) -> Any:
        if isinstance(s, A.UdfAssign):
            self.assign(s)
            return None
        if isinstance(s, A.UdfExprStmt):
            if isinstance(s.expr, A.Literal) and s.expr.value is None:
                return None  # `Null` → return _builtin_ret
            if isinstance(s.expr, A.ColumnRef) and s.expr.name.lower() == "null":
                return None
            return self.expr(s.expr)
        if isinstance(s, A.UdfIf):
            if self.expr(s.cond):
                return self.run(s.then)
            for c, blk in s.elifs:
                if self.expr(c):
                    return self.run(blk)
            return self.run(s.orelse)
        if isinstance(s, A.UdfFor):
            for a in s.init:
                self.assign(a)
            guard = 0
            while self.expr(s.cond):
                self.run(s.body)
                for a in s.step:
                    self.assign(a)
                guard += 1
                if guard > 100_000_000:
                    raise UdfError("runaway UDF loop")
            return None
        raise UdfError(f"unknown UDF statement {s}")

    def assign(self, s: A.UdfAssign) -> None:
        val = self.expr(s.value)
        if isinstance(s.target, A.ColumnRef):
            name = s.target.name
            if s.op == ":=":
                self.env[name] = val
            else:
                self.env[name] = _AUG[s.op](self.env[name], val)
        elif isinstance(s.target, A.Index):
            base = s.target.base
            assert isinstance(base, A.ColumnRef)
            arr = self.env[base.name]
            idx = int(self.expr(s.target.index))
            if base.name == "_builtin_ret":
                self.ret_written = True
            if s.op == ":=":
                arr[idx] = val
            else:
                arr[idx] = _AUG[s.op](arr[idx], val)
        else:
            raise UdfError("bad assignment target")

    def expr(self, e) -> Any:
        if isinstance(e, A.Literal):
            return e.value
        if isinstance(e, A.ColumnRef):
            if e.name in self.env:
                return self.env[e.name]
            low = e.name.lower()
            if low in self.env:
                return self.env[low]
            if low == "null":
                return None
            raise UdfError(f"unbound variable {e.name} in UDF")
        if isinstance(e, A.Index):
            base = self.expr(e.base)
            return base[int(self.expr(e.index))]
        if isinstance(e, A.UnaryOp):
            v = self.expr(e.operand)
            if e.op == "-":
                return -v
            if e.op == "not":
                return ~v if isinstance(v, np.ndarray) else (not v)
            raise UdfError(f"unary {e.op} in UDF")
        if isinstance(e, A.BinOp):
            a = self.expr(e.left)
            b = self.expr(e.right)
            return _BIN[e.op](a, b)
        if isinstance(e, A.Call):
            return self.call(e)
        raise UdfError(f"cannot interpret {e}")

    def call(self, e: A.Call) -> Any:
        name = e.func
        # slicing: x(a, b) where x is a bound vector (reference subvec form)
        if name in self.env and isinstance(self.env[name], np.ndarray) and len(e.args) == 2:
            a = int(self.expr(e.args[0]))
            b = int(self.expr(e.args[1]))
            return self.env[name][a:b]
        args = [self.expr(a) for a in e.args]
        if name in _HOST_FNS:
            return _HOST_FNS[name](*args)
        # nested UDFs
        sess = getattr(self.ctx, "session", None)
        if sess is not None and name in sess.udfs:
            sub = sess.udfs[name]
            env = dict(zip(sub.params, args))
            return _HostEval(self.ctx, env).run(sub.body)
        raise UdfError(f"unknown function {name} in UDF body")


_AUG = {
    "+=": lambda a, b: a + b,
    "-=": lambda a, b: a - b,
    "*=": lambda a, b: a * b,
    "/=": lambda a, b: a / b,
}

_BIN = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b if not (
        isinstance(a, (int, np.integer)) and isinstance(b, (int, np.integer))
    ) else a / b,
    "%": lambda a, b: a % b,
    "=": lambda a, b: a == b,
    "<>": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    ">": lambda a, b: a > b,
    "<=": lambda a, b: a <= b,
    ">=": lambda a, b: a >= b,
    "and": lambda a, b: np.logical_and(a, b),
    "or": lambda a, b: np.logical_or(a, b),
}


def _h_sums(x):
    return np.cumsum(np.asarray(x, dtype=np.float64 if np.asarray(x).dtype.kind == "f" else np.int64))


def _h_avgs(*args):
    if len(args) == 2:
        w, x = int(args[0]), np.asarray(args[1])
        out = np.empty(len(x), np.float64)
        for i in range(len(x)):
            out[i] = x[max(0, i - w + 1): i + 1].mean()
        return out
    x = np.asarray(args[0])
    return _h_sums(x) / np.arange(1, len(x) + 1)


def _h_avg(x):
    x = np.asarray(x, dtype=np.float64)
    return x.mean() if x.size else 0.0


_HOST_FNS: dict[str, Any] = {
    "avg": _h_avg,
    "mean": _h_avg,
    "sum": lambda x: np.asarray(x).sum(),
    "min": lambda x: np.asarray(x).min(),
    "max": lambda x: np.asarray(x).max(),
    "count": lambda x: np.asarray(x).size,
    "sqrt": lambda x: np.sqrt(x),
    "pow": lambda x, y: np.power(x, y),
    "abs": lambda x: np.abs(x),
    "exp": lambda x: np.exp(x),
    "log": lambda x: np.log(x),
    "sums": _h_sums,
    "avgs": _h_avgs,
    "mins": lambda x: np.minimum.accumulate(x),
    "maxs": lambda x: np.maximum.accumulate(x),
    "first": lambda x: np.asarray(x)[0],
    "last": lambda x: np.asarray(x)[-1],
    "subvec": lambda x, a, b: np.asarray(x)[int(a): int(b)],
}
