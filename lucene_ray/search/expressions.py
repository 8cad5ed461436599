"""Scripted scoring expressions — the role of the reference's `expressions`
module (`lucene/expressions/src/java/org/apache/lucene/expressions/
Expression.java` + `js/JavascriptCompiler.java`): compile an arithmetic
formula over `_score` and doc-values fields into a vectorized evaluator.

Re-expression: instead of bytecode generation, the formula is parsed with
Python's `ast` into a WHITELISTED node tree (numbers, + - * / % **, unary -,
comparisons, and the function table below) and evaluated with numpy over
the matched docs' value arrays — one vectorized pass per shard, no per-doc
Python.  Unknown names resolve to doc-values columns at execution time.
"""

from __future__ import annotations

import ast

import numpy as np

def _haversin(lat1, lon1, lat2, lon2):
    """Great-circle distance in METERS (`util/SloppyMath.haversinMeters`,
    mean earth radius 6371008.7714 m) — the reference's ``haversinMeters``
    function; its ``haversin`` is the kilometers wrapper
    (JavascriptCompiler.properties: haversin → haversinKilometers,
    haversinMeters → SloppyMath)."""
    r1, r2 = np.radians(lat1), np.radians(lat2)
    dlat = r2 - r1
    dlon = np.radians(lon2) - np.radians(lon1)
    a = (np.sin(dlat / 2) ** 2
         + np.cos(r1) * np.cos(r2) * np.sin(dlon / 2) ** 2)
    return 2 * 6_371_008.7714 * np.arcsin(np.sqrt(a))


# the full JavascriptCompiler.DEFAULT_FUNCTIONS surface
FUNCS = {
    "ln": np.log, "log": np.log, "log10": np.log10, "sqrt": np.sqrt,
    "abs": np.abs, "min": np.minimum, "max": np.maximum, "pow": np.power,
    "exp": np.exp,
    "acos": np.arccos, "acosh": np.arccosh, "asin": np.arcsin,
    "asinh": np.arcsinh, "atan": np.arctan, "atan2": np.arctan2,
    "atanh": np.arctanh, "ceil": np.ceil, "cos": np.cos, "cosh": np.cosh,
    "floor": np.floor, "sin": np.sin, "sinh": np.sinh, "tan": np.tan,
    "tanh": np.tanh,
    "logn": lambda base, x: np.log(x) / np.log(base),
    # reference naming: haversin = kilometers, haversinMeters = meters
    "haversin": lambda a, b, c, d: _haversin(a, b, c, d) / 1000.0,
    "haversinMeters": _haversin,
}

_BINOPS = {
    ast.Add: np.add, ast.Sub: np.subtract, ast.Mult: np.multiply,
    ast.Div: np.true_divide, ast.Mod: np.mod, ast.Pow: np.power,
}

# term-statistic value sources (`queries/function/valuesource/
# TermFreqValueSource.java`, DocFreqValueSource, TotalTermFreqValueSource,
# IDFValueSource, NormValueSource, MaxDocValueSource, NumDocsValueSource):
# calls with a string-literal term argument resolve against the index at
# execution time — the compiled expression records them as "fn:term"
# environment keys the searcher fills per shard / per match set.
TERM_FUNCS = {"tf": 1, "df": 1, "ttf": 1, "idf": 1,
              "norm": 0, "maxdoc": 0, "numdocs": 0}


def _term_key(node: "ast.Call") -> str:
    """Environment key for a term-statistic call: 'tf:merge', 'norm:'."""
    arg = node.args[0].value if node.args else ""
    return f"{node.func.id}:{arg}"


def compile_expression(src: str):
    """Parse `src` once; returns (evaluator, variable names).  The evaluator
    takes a dict of name -> float64 ndarray (must include every variable)
    and returns a float64 ndarray."""
    tree = ast.parse(src, mode="eval")
    names: set[str] = set()

    def check(node):
        if isinstance(node, ast.Expression):
            check(node.body)
        elif isinstance(node, ast.BinOp) and type(node.op) in _BINOPS:
            check(node.left)
            check(node.right)
        elif isinstance(node, ast.UnaryOp) and isinstance(node.op, (ast.USub, ast.UAdd)):
            check(node.operand)
        elif isinstance(node, ast.Call):
            if isinstance(node.func, ast.Name) and node.func.id in TERM_FUNCS \
                    and not node.keywords:
                nargs = TERM_FUNCS[node.func.id]
                if len(node.args) != nargs or any(
                        not (isinstance(a, ast.Constant)
                             and isinstance(a.value, str))
                        for a in node.args):
                    raise ValueError(
                        f"{node.func.id}() takes {nargs} string-literal "
                        f"term argument(s)")
                names.add(_term_key(node))
                return
            if not (isinstance(node.func, ast.Name) and node.func.id in FUNCS) \
                    or node.keywords:
                raise ValueError(f"disallowed call in expression: {ast.dump(node)}")
            for a in node.args:
                check(a)
        elif isinstance(node, ast.Name):
            names.add(node.id)
        elif isinstance(node, ast.Constant) and isinstance(node.value, (int, float)):
            pass
        else:
            raise ValueError(f"disallowed expression node: {type(node).__name__}")

    check(tree)

    def ev(node, env):
        if isinstance(node, ast.Expression):
            return ev(node.body, env)
        if isinstance(node, ast.BinOp):
            return _BINOPS[type(node.op)](ev(node.left, env), ev(node.right, env))
        if isinstance(node, ast.UnaryOp):
            v = ev(node.operand, env)
            return -v if isinstance(node.op, ast.USub) else +v
        if isinstance(node, ast.Call):
            if node.func.id in TERM_FUNCS:
                return env[_term_key(node)]
            return FUNCS[node.func.id](*(ev(a, env) for a in node.args))
        if isinstance(node, ast.Name):
            return env[node.id]
        return np.float64(node.value)

    return (lambda env: np.asarray(ev(tree, env), dtype=np.float64)), sorted(names)
