"""numpy-eval expression dialect -> Spark SQL translator.

The reference evaluates query strings with Python ``eval`` over the whole
NumPy namespace plus the table's columns and aliases
(``/root/reference/ezdata/simpletable.py:2710-2747``,
``dictdataframe.py:883-934``). This module re-expresses that dialect as
Spark SQL text so Catalyst sees a fully declarative expression: whole-stage
codegen, predicate pushdown, and column pruning all apply. No Python runs
per-row for any mapped function.

Supported grammar (a deliberate, documented subset of "anything eval
accepts"):

- names: column names, engine aliases (resolved recursively), user
  ``exprvars`` (bound as literals), constants ``pi``/``e``/``nan``/``inf``
- literals: int/float/str/bool, tuples/lists (for ``in``)
- arithmetic: ``+ - * / // % **`` (``//`` -> floor(a/b), ``%`` -> numpy
  sign-of-divisor semantics via pmod, ``**`` -> power)
- comparisons: ``== != < <= > >=``, chained comparisons, ``in``/``not in``
- boolean masks: ``& | ^ ~`` (translated to AND/OR/<> /NOT as in the
  vectorized-mask idiom), plus python ``and or not``
- calls: numpy function names (see ``_FN_MAP``), optionally ``np.``- or
  ``numpy.``-qualified; unmapped numpy names fall back to a registered
  Arrow pandas_udf (``ez_np_<name>``) — the slow path, kept off the hot
  path by the breadth of the builtin map
- conditional: ``a if cond else b`` and ``where(cond, a, b)``

Divergences from the reference, by design (documented per SURVEY.md §7):
- NaN vs null: Spark nulls propagate through arithmetic like NaN; the
  oracle harness treats them equivalently.
- names are matched whole (via the AST), not by the reference's
  substring scan (simpletable.py:2731-2734) — strictly more correct.
"""

from __future__ import annotations

import ast
from dataclasses import dataclass, field

__all__ = ["translate", "ExprError", "TranslationResult"]


class ExprError(ValueError):
    """Raised when an expression uses grammar outside the supported subset."""


# numpy name -> Spark SQL function (identical arity unless noted)
_FN_MAP = {
    # logs / exponentials
    "log": "ln",
    "log10": "log10",
    "log2": "log2",
    "log1p": "log1p",
    "exp": "exp",
    "expm1": "expm1",
    # powers / roots
    "sqrt": "sqrt",
    "cbrt": "cbrt",
    "square": None,  # special-cased: x*x
    "power": "power",
    "float_power": "power",
    "hypot": "hypot",
    # rounding / sign
    "abs": "abs",
    "absolute": "abs",
    "fabs": "abs",
    "floor": "floor",
    "ceil": "ceiling",
    "trunc": None,  # special-cased
    "rint": "bround",
    "round": "round",
    "around": "round",
    "sign": "sign",
    # trig
    "sin": "sin",
    "cos": "cos",
    "tan": "tan",
    "arcsin": "asin",
    "arccos": "acos",
    "arctan": "atan",
    "arctan2": "atan2",
    "sinh": "sinh",
    "cosh": "cosh",
    "tanh": "tanh",
    "arcsinh": "asinh",
    "arccosh": "acosh",
    "arctanh": "atanh",
    "degrees": "degrees",
    "radians": "radians",
    "rad2deg": "degrees",
    "deg2rad": "radians",
    # elementwise min/max over args
    "minimum": "least",
    "maximum": "greatest",
    # predicates
    "isnan": "isnan",
    "isfinite": None,  # special-cased
    "isinf": None,  # special-cased
    "isnull": "isnull",
    "logical_and": None,
    "logical_or": None,
    "logical_not": None,
    # misc
    "where": None,  # special-cased -> IF
    "clip": None,  # special-cased -> least(greatest())
    "mod": "pmod",
    "fmod": "mod",
    "exp2": None,  # special-cased -> power(2, x)
    "sinc": None,  # special-cased
    "floor_divide": None,
    "true_divide": None,
    "divide": None,
    "multiply": None,
    "add": None,
    "subtract": None,
    "negative": None,
}

_CONSTANTS = {
    "pi": "pi()",
    "e": "e()",
    "nan": "double('NaN')",
    "NaN": "double('NaN')",
    "inf": "double('Infinity')",
    "Inf": "double('Infinity')",
    "Infinity": "double('Infinity')",
    "True": "true",
    "False": "false",
    "None": "null",
}

_BINOP_SQL = {
    ast.Add: "+",
    ast.Sub: "-",
    ast.Mult: "*",
    ast.Div: "/",
}

_CMP_SQL = {
    ast.Eq: "=",
    ast.NotEq: "<>",
    ast.Lt: "<",
    ast.LtE: "<=",
    ast.Gt: ">",
    ast.GtE: ">=",
}


@dataclass
class TranslationResult:
    sql: str
    columns_used: set[str] = field(default_factory=set)
    fallback_fns: set[str] = field(default_factory=set)  # numpy names needing a pandas_udf


def _quote_ident(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _sql_str(value: str) -> str:
    return "'" + value.replace("\\", "\\\\").replace("'", "\\'") + "'"


class _Emitter(ast.NodeVisitor):
    def __init__(
        self,
        columns: set[str],
        aliases: dict[str, str] | None,
        exprvars: dict[str, object] | None,
        caseless: bool,
    ):
        self.columns = set(columns)
        self.lower_columns = {c.lower(): c for c in columns}
        self.aliases = dict(aliases or {})
        self.lower_aliases = {k.lower(): k for k in self.aliases}
        self.exprvars = dict(exprvars or {})
        self.caseless = caseless
        self.result = TranslationResult(sql="")
        self._alias_depth = 0

    # --- helpers -------------------------------------------------------
    def emit(self, node: ast.AST) -> str:
        method = "visit_" + node.__class__.__name__
        visitor = getattr(self, method, None)
        if visitor is None:
            raise ExprError(f"unsupported syntax: {node.__class__.__name__}")
        return visitor(node)

    def _literal(self, value) -> str:
        if value is True:
            return "true"
        if value is False:
            return "false"
        if value is None:
            return "null"
        if isinstance(value, str):
            return _sql_str(value)
        if isinstance(value, float):
            if value != value:
                return "double('NaN')"
            if value == float("inf"):
                return "double('Infinity')"
            if value == float("-inf"):
                return "double('-Infinity')"
            return repr(value)
        if isinstance(value, int):
            return repr(value)
        if isinstance(value, (list, tuple)):
            return "(" + ", ".join(self._literal(v) for v in value) + ")"
        raise ExprError(f"unsupported literal type: {type(value).__name__}")

    # --- leaves --------------------------------------------------------
    def visit_Constant(self, node: ast.Constant) -> str:
        return self._literal(node.value)

    def visit_Name(self, node: ast.Name) -> str:
        name = node.id
        # 1. user-supplied variables bind tightest (reference: exprvars
        #    merged into eval globals, simpletable.py:2737-2741)
        if name in self.exprvars:
            return self._literal(self.exprvars[name])
        # 2. real columns
        if name in self.columns:
            self.result.columns_used.add(name)
            return _quote_ident(name)
        # 3. aliases — substitute the aliased expression recursively
        #    (simpletable.py:2000-2019; caseless option 2014-2017)
        target = None
        if name in self.aliases:
            target = self.aliases[name]
        elif self.caseless:
            if name.lower() in self.lower_aliases:
                target = self.aliases[self.lower_aliases[name.lower()]]
            elif name.lower() in self.lower_columns:
                real = self.lower_columns[name.lower()]
                self.result.columns_used.add(real)
                return _quote_ident(real)
        if target is not None:
            if self._alias_depth > 16:
                raise ExprError(f"alias cycle detected resolving {name!r}")
            self._alias_depth += 1
            try:
                sub = ast.parse(target, mode="eval").body
                return "(" + self.emit(sub) + ")"
            finally:
                self._alias_depth -= 1
        # 4. constants
        if name in _CONSTANTS:
            return _CONSTANTS[name]
        raise ExprError(f"unknown name {name!r} (not a column, alias, exprvar, or constant)")

    # --- operators -----------------------------------------------------
    def visit_BinOp(self, node: ast.BinOp) -> str:
        op = type(node.op)
        left = self.emit(node.left)
        right = self.emit(node.right)
        if op in _BINOP_SQL:
            return f"({left} {_BINOP_SQL[op]} {right})"
        if op is ast.Pow:
            return f"power({left}, {right})"
        if op is ast.Mod:
            # numpy % follows the divisor's sign -> pmod for positive divisors;
            # Spark pmod matches numpy for divisor > 0 (the common case)
            return f"pmod({left}, {right})"
        if op is ast.FloorDiv:
            return f"floor({left} / {right})"
        if op is ast.BitAnd:
            return f"({left} AND {right})"
        if op is ast.BitOr:
            return f"({left} OR {right})"
        if op is ast.BitXor:
            return f"({left} <> {right})"
        raise ExprError(f"unsupported operator: {op.__name__}")

    def visit_BoolOp(self, node: ast.BoolOp) -> str:
        joiner = " AND " if isinstance(node.op, ast.And) else " OR "
        return "(" + joiner.join(self.emit(v) for v in node.values) + ")"

    def visit_UnaryOp(self, node: ast.UnaryOp) -> str:
        operand = self.emit(node.operand)
        if isinstance(node.op, (ast.Invert, ast.Not)):
            return f"(NOT {operand})"
        if isinstance(node.op, ast.USub):
            return f"(- {operand})"
        if isinstance(node.op, ast.UAdd):
            return operand
        raise ExprError(f"unsupported unary op: {type(node.op).__name__}")

    def visit_Compare(self, node: ast.Compare) -> str:
        parts = []
        left = self.emit(node.left)
        for op, comparator in zip(node.ops, node.comparators):
            right = self.emit(comparator)
            top = type(op)
            if top in _CMP_SQL:
                parts.append(f"{left} {_CMP_SQL[top]} {right}")
            elif top is ast.In:
                parts.append(f"{left} IN {right}")
            elif top is ast.NotIn:
                parts.append(f"{left} NOT IN {right}")
            else:
                raise ExprError(f"unsupported comparison: {top.__name__}")
            left = right
        return "(" + " AND ".join(parts) + ")"

    def visit_IfExp(self, node: ast.IfExp) -> str:
        return f"IF({self.emit(node.test)}, {self.emit(node.body)}, {self.emit(node.orelse)})"

    def visit_Tuple(self, node: ast.Tuple) -> str:
        return "(" + ", ".join(self.emit(e) for e in node.elts) + ")"

    def visit_List(self, node: ast.List) -> str:
        return "(" + ", ".join(self.emit(e) for e in node.elts) + ")"

    # --- calls ---------------------------------------------------------
    def _fn_name(self, func: ast.AST) -> str:
        if isinstance(func, ast.Name):
            return func.id
        if isinstance(func, ast.Attribute):
            # np.log10 / numpy.log10 qualification
            if isinstance(func.value, ast.Name) and func.value.id in ("np", "numpy"):
                return func.attr
            raise ExprError("only np.<fn> attribute calls are supported")
        raise ExprError("unsupported call target")

    # exact arities for the special-cased calls; checked before indexing
    _SPECIAL_ARITY = {
        "where": 3, "clip": 3, "square": 1, "exp2": 1, "trunc": 1,
        "isfinite": 1, "isinf": 1, "sinc": 1, "logical_and": 2,
        "logical_or": 2, "logical_not": 1, "floor_divide": 2,
        "true_divide": 2, "divide": 2, "multiply": 2, "add": 2,
        "subtract": 2, "negative": 1,
    }

    def visit_Call(self, node: ast.Call) -> str:
        if node.keywords:
            raise ExprError("keyword arguments are not supported in expressions")
        name = self._fn_name(node.func)
        args = [self.emit(a) for a in node.args]

        want = self._SPECIAL_ARITY.get(name)
        if want is not None and len(args) != want:
            raise ExprError(f"{name}() takes {want} argument(s), got {len(args)}")

        # special cases ------------------------------------------------
        if name == "where":
            return f"IF({args[0]}, {args[1]}, {args[2]})"
        if name == "clip":
            return f"least(greatest({args[0]}, {args[1]}), {args[2]})"
        if name == "square":
            return f"({args[0]} * {args[0]})"
        if name == "exp2":
            return f"power(2, {args[0]})"
        if name == "trunc":
            return f"(CAST({args[0]} AS BIGINT))"
        if name == "isfinite":
            a = args[0]
            return (
                f"((NOT isnan({a})) AND {a} < double('Infinity') AND {a} > double('-Infinity'))"
            )
        if name == "isinf":
            a = args[0]
            return f"(abs({a}) = double('Infinity'))"
        if name == "sinc":
            # numpy sinc is the normalized sinc: sin(pi x)/(pi x), sinc(0)=1
            a = args[0]
            return f"IF({a} = 0, 1.0, sin(pi() * {a}) / (pi() * {a}))"
        if name == "logical_and":
            return f"({args[0]} AND {args[1]})"
        if name == "logical_or":
            return f"({args[0]} OR {args[1]})"
        if name == "logical_not":
            return f"(NOT {args[0]})"
        if name == "floor_divide":
            return f"floor({args[0]} / {args[1]})"
        if name in ("true_divide", "divide"):
            return f"({args[0]} / {args[1]})"
        if name == "multiply":
            return f"({args[0]} * {args[1]})"
        if name == "add":
            return f"({args[0]} + {args[1]})"
        if name == "subtract":
            return f"({args[0]} - {args[1]})"
        if name == "negative":
            return f"(- {args[0]})"

        mapped = _FN_MAP.get(name)
        if mapped:
            return f"{mapped}({', '.join(args)})"

        # fallback: any other numpy name -> Arrow pandas_udf registered as
        # ez_np_<name> (see functions/numpy_fallback.py). The slow path.
        import numpy as _np

        if hasattr(_np, name) and callable(getattr(_np, name)):
            self.result.fallback_fns.add(name)
            # cast to double: SQL decimal literals (0.5 -> DECIMAL) would
            # otherwise reach the pandas_udf as decimal.Decimal objects
            cast_args = [f"CAST({a} AS DOUBLE)" for a in args]
            return f"ez_np_{name}({', '.join(cast_args)})"
        raise ExprError(f"unknown function {name!r}")


def translate(
    expr: str,
    columns,
    aliases: dict[str, str] | None = None,
    exprvars: dict[str, object] | None = None,
    caseless: bool = False,
) -> TranslationResult:
    """Translate a numpy-dialect expression string into Spark SQL text.

    Parameters mirror the reference's ``evalexpr`` surface
    (simpletable.py:2710-2747): ``columns`` are the frame's column names,
    ``aliases`` the engine alias map (name -> expression string),
    ``exprvars`` user variables bound as literals, ``caseless`` the
    case-insensitive alias resolution option (simpletable.py:2014-2017).
    """
    try:
        tree = ast.parse(expr, mode="eval")
    except SyntaxError as exc:
        raise ExprError(f"cannot parse expression {expr!r}: {exc}") from exc
    emitter = _Emitter(set(columns), aliases, exprvars, caseless)
    emitter.result.sql = emitter.emit(tree.body)
    return emitter.result
