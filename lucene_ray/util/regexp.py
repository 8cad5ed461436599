"""Lucene regular-expression dialect (`util/automaton/RegExp.java`).

The reference's RegexpQuery does NOT take java.util.regex patterns — it
parses its own grammar (union `|`, concatenation, `? * + {n,m}`, char
classes with ranges, `.` any char, and — flag-gated, all on by default
under `ALL` — intersection `&`, empty language `#`, any string `@`,
numerical intervals `<n-m>`) and compiles it to an automaton intersected
with the term dictionary.  This module is a faithful transcription of that
parser (RegExp.java parseUnionExp..parseCharExp, including the predefined
`\\d \\D \\s \\S \\w \\W` classes RegExp.java expandPredefined defines as
[0-9] / [ \\t\\n\\r] / [a-zA-Z_0-9] and their negations, and the
ASCII_CASE_INSENSITIVE flag applying to chars and quoted strings only)
plus two evaluators:

- a translation to an anchored Python pattern when the AST is
  python-expressible (everything except intersection / interval) — the
  fast path that covers almost every real query; and
- a memoized span matcher for the rest (intersection = AND over the same
  span; interval <n-m> per Automata.makeDecimalInterval: digit strings
  whose value lies in [n, m], fixed-width when both bounds were written
  with equal length, any number of leading zeros otherwise).

There is no complement operator in this snapshot's grammar
(RegExp.java parseComplExp delegates straight to parseCharClassExp; the
deprecated `~` flag is gone) — negated character classes `[^...]` are the
only negation, exactly as the reference builds them
(ANYCHAR & COMPLEMENT(class), single-char)."""

from __future__ import annotations

import re

INTERSECTION = 0x0001
EMPTY = 0x0004
ANYSTRING = 0x0008
AUTOMATON = 0x0010
INTERVAL = 0x0020
ALL = 0xFF
NONE = 0x0000
ASCII_CASE_INSENSITIVE = 0x0100

# node kinds: ("char", c) ("range", lo, hi) ("negclass", e) ("anychar",)
# ("emptylang",) ("string", s) ("anystring",) ("union", a, b)
# ("inter", a, b) ("concat", a, b) ("optional", e) ("repeat", e, mn, mx)
# ("interval", mn, mx, digits)


class _Parser:
    def __init__(self, s: str, flags: int):
        self.s = s
        self.pos = 0
        self.flags = flags

    def parse(self):
        e = self.union_exp()
        if self.pos < len(self.s):
            raise ValueError(f"end-of-string expected at position {self.pos}")
        return e

    # --- helpers mirroring RegExp.java peek/match/next ---
    def peek(self, chars: str) -> bool:
        return self.pos < len(self.s) and self.s[self.pos] in chars

    def match(self, c: str) -> bool:
        if self.pos < len(self.s) and self.s[self.pos] == c:
            self.pos += 1
            return True
        return False

    def next(self) -> str:
        if self.pos >= len(self.s):
            raise ValueError("unexpected end-of-string")
        c = self.s[self.pos]
        self.pos += 1
        return c

    def more(self) -> bool:
        return self.pos < len(self.s)

    def check(self, flag: int) -> bool:
        return bool(self.flags & flag)

    # --- grammar ---
    def union_exp(self):
        e = self.inter_exp()
        if self.match("|"):
            return ("union", e, self.union_exp())
        return e

    def inter_exp(self):
        e = self.concat_exp()
        if self.check(INTERSECTION) and self.match("&"):
            return ("inter", e, self.inter_exp())
        return e

    def concat_exp(self):
        e = self.repeat_exp()
        if self.more() and not self.peek(")|") \
                and (not self.check(INTERSECTION) or not self.peek("&")):
            return ("concat", e, self.concat_exp())
        return e

    def repeat_exp(self):
        e = self.char_class_exp()
        while self.peek("?*+{"):
            if self.match("?"):
                e = ("optional", e)
            elif self.match("*"):
                e = ("repeat", e, 0, -1)
            elif self.match("+"):
                e = ("repeat", e, 1, -1)
            elif self.match("{"):
                start = self.pos
                while self.peek("0123456789"):
                    self.next()
                if start == self.pos:
                    raise ValueError(f"integer expected at position {self.pos}")
                n = int(self.s[start:self.pos])
                m = -1
                if self.match(","):
                    start = self.pos
                    while self.peek("0123456789"):
                        self.next()
                    if start != self.pos:
                        m = int(self.s[start:self.pos])
                else:
                    m = n
                if not self.match("}"):
                    raise ValueError(f"expected '}}' at position {self.pos}")
                e = ("repeat", e, n, m)
        return e

    def char_class_exp(self):
        if self.match("["):
            negate = self.match("^")
            e = self.char_classes()
            if not self.match("]"):
                raise ValueError(f"expected ']' at position {self.pos}")
            return ("negclass", e) if negate else e
        return self.simple_exp()

    def char_classes(self):
        e = self.char_class()
        while self.more() and not self.peek("]"):
            e = ("union", e, self.char_class())
        return e

    def char_class(self):
        pre = self.predefined_class()
        if pre is not None:
            return pre
        c = self.char_exp()
        if self.match("-"):
            return ("range", ord(c), ord(self.char_exp()))
        return self._char(c)

    def predefined_class(self):
        # RegExp.java matchPredefinedCharacterClass + expandPredefined
        if self.match("\\"):
            if self.peek("dDwWsS"):
                k = self.next()
                digits = ("range", ord("0"), ord("9"))
                word = ("union", ("union", ("range", ord("a"), ord("z")),
                                  ("range", ord("A"), ord("Z"))),
                        ("union", ("char", ord("_")), digits))
                space = ("union", ("union", ("char", 32), ("char", 9)),
                         ("union", ("char", 10), ("char", 13)))
                base = {"d": digits, "D": digits, "w": word, "W": word,
                        "s": space, "S": space}[k]
                return ("negclass", base) if k.isupper() else base
            if self.peek("\\"):
                return self._char(self.next())
            if self.pos < len(self.s) and self.s[self.pos].isalpha() \
                    and self.s[self.pos] not in "dDwWsS":
                raise ValueError(f"invalid character class \\{self.next()}")
            # escaped non-alpha: a single character
            return self._char(self.next())
        return None

    def _char(self, c: str):
        # ASCII_CASE_INSENSITIVE folds chars at build (toCaseInsensitiveChar)
        if self.check(ASCII_CASE_INSENSITIVE) and c.isascii() and c.isalpha():
            return ("union", ("char", ord(c.lower())),
                    ("char", ord(c.upper())))
        return ("char", ord(c))

    def simple_exp(self):
        if self.match("."):
            return ("anychar",)
        if self.check(EMPTY) and self.match("#"):
            return ("emptylang",)
        if self.check(ANYSTRING) and self.match("@"):
            return ("anystring",)
        if self.match('"'):
            start = self.pos
            while self.more() and not self.peek('"'):
                self.next()
            if not self.match('"'):
                raise ValueError(f'expected \'"\' at position {self.pos}')
            return self._string(self.s[start:self.pos - 1])
        if self.match("("):
            if self.match(")"):
                return ("string", "")
            e = self.union_exp()
            if not self.match(")"):
                raise ValueError(f"expected ')' at position {self.pos}")
            return e
        if (self.check(AUTOMATON) or self.check(INTERVAL)) and self.match("<"):
            start = self.pos
            while self.more() and not self.peek(">"):
                self.next()
            if not self.match(">"):
                raise ValueError(f"expected '>' at position {self.pos}")
            body = self.s[start:self.pos - 1]
            i = body.find("-")
            if i == -1:
                if not self.check(AUTOMATON):
                    raise ValueError("interval syntax error")
                raise ValueError(
                    "named automata are not supported (no AutomatonProvider)")
            if not self.check(INTERVAL):
                raise ValueError("illegal identifier")
            smin, smax = body[:i], body[i + 1:]
            if not smin or not smax or "-" in smax:
                raise ValueError("interval syntax error")
            imin, imax = int(smin), int(smax)
            digits = len(smin) if len(smin) == len(smax) else 0
            if imin > imax:
                imin, imax = imax, imin
            return ("interval", imin, imax, digits)
        pre = self.predefined_class()
        if pre is not None:
            return pre
        return self._char(self.char_exp())

    def _string(self, s: str):
        if self.check(ASCII_CASE_INSENSITIVE) and any(
                c.isascii() and c.isalpha() for c in s):
            e = ("string", "")
            for c in s:
                e = ("concat", e, self._char(c))
            return e
        return ("string", s)

    def char_exp(self) -> str:
        self.match("\\")
        return self.next()


def _has_structural(node) -> bool:
    k = node[0]
    if k in ("inter", "interval"):
        return True
    return any(_has_structural(x) for x in node[1:] if isinstance(x, tuple))


def _class_members(node, out) -> bool:
    """Flatten a char-class union into [(lo, hi)] ranges; False if the node
    is not a plain class (then the negclass must evaluate structurally)."""
    k = node[0]
    if k == "char":
        out.append((node[1], node[1]))
        return True
    if k == "range":
        out.append((node[1], node[2]))
        return True
    if k == "union":
        return _class_members(node[1], out) and _class_members(node[2], out)
    return False


def _esc(c: int) -> str:
    return re.escape(chr(c))


def _to_pattern(node) -> str:
    """Python-re translation; raises ValueError on structural nodes."""
    k = node[0]
    if k == "char":
        return _esc(node[1])
    if k == "range":
        return f"[{_esc(node[1])}-{_esc(node[2])}]"
    if k == "negclass":
        members: list = []
        if not _class_members(node[1], members):
            raise ValueError("structural")
        inner = "".join(f"{_esc(lo)}-{_esc(hi)}" if lo != hi else _esc(lo)
                        for lo, hi in members)
        return f"[^{inner}]"
    if k == "anychar":
        return "."                      # compiled with DOTALL
    if k == "emptylang":
        return "(?!)"
    if k == "string":
        return re.escape(node[1])
    if k == "anystring":
        return ".*"
    if k == "union":
        return f"(?:{_to_pattern(node[1])}|{_to_pattern(node[2])})"
    if k == "concat":
        return _to_pattern(node[1]) + _to_pattern(node[2])
    if k == "optional":
        return f"(?:{_to_pattern(node[1])})?"
    if k == "repeat":
        _e, mn, mx = node[1], node[2], node[3]
        inner = f"(?:{_to_pattern(_e)})"
        if mx == -1:
            return inner + ("*" if mn == 0 else "+" if mn == 1
                            else f"{{{mn},}}")
        return inner + f"{{{mn},{mx}}}"
    raise ValueError("structural")


class LuceneRegExp:
    """Parsed Lucene-dialect regular expression with anchored matching
    (RegexpQuery intersects the automaton with whole terms)."""

    def __init__(self, pattern: str, flags: int = ALL):
        self.pattern = pattern
        self.flags = flags
        self.ast = _Parser(pattern, flags).parse()
        self._re = None
        if not _has_structural(self.ast):
            self._re = re.compile(_to_pattern(self.ast), re.DOTALL)

    def fullmatch(self, s: str) -> bool:
        if self._re is not None:
            return self._re.fullmatch(s) is not None
        return _match(self.ast, s, 0, len(s), {})

    def prefix_match(self, s: str) -> bool:
        """True when some PREFIX of ``s`` matches (the completion-suggester
        intersection semantics of `suggest/document/RegexCompletionQuery`)."""
        if self._re is not None:
            return self._re.match(s) is not None
        return any(_match(self.ast, s, 0, i, {}) for i in range(len(s) + 1))

    def literal_prefix(self) -> str:
        """Longest literal prefix every match must start with (the
        CompiledAutomaton common-prefix role, for dictionary narrowing)."""
        out: list[str] = []

        def walk(node) -> bool:          # True = prefix continues after node
            k = node[0]
            if k == "char":
                out.append(chr(node[1]))
                return True
            if k == "string":
                out.append(node[1])
                return True
            if k == "concat":
                return walk(node[1]) and walk(node[2])
            return False

        walk(self.ast)
        return "".join(out)


def _match(node, s: str, i: int, j: int, memo: dict) -> bool:
    key = (id(node), i, j)
    got = memo.get(key)
    if got is not None:
        return got
    memo[key] = False                    # cycle guard
    k = node[0]
    if k == "char":
        r = j == i + 1 and ord(s[i]) == node[1]
    elif k == "range":
        r = j == i + 1 and node[1] <= ord(s[i]) <= node[2]
    elif k == "negclass":
        r = j == i + 1 and not _match(node[1], s, i, j, memo)
    elif k == "anychar":
        r = j == i + 1
    elif k == "emptylang":
        r = False
    elif k == "string":
        r = s[i:j] == node[1]
    elif k == "anystring":
        r = True
    elif k == "union":
        r = _match(node[1], s, i, j, memo) or _match(node[2], s, i, j, memo)
    elif k == "inter":
        r = _match(node[1], s, i, j, memo) and _match(node[2], s, i, j, memo)
    elif k == "concat":
        r = any(_match(node[1], s, i, m, memo)
                and _match(node[2], s, m, j, memo)
                for m in range(i, j + 1))
    elif k == "optional":
        r = i == j or _match(node[1], s, i, j, memo)
    elif k == "repeat":
        e, mn, mx = node[1], node[2], node[3]
        cap = mn if mx == -1 else mx      # counts saturate when unbounded
        seen = {(i, 0)}
        frontier = [(i, 0)]
        r = j == i and mn == 0
        while frontier and not r:
            p, c = frontier.pop()
            nc = min(c + 1, cap) if mx == -1 else c + 1
            if mx != -1 and nc > mx:
                continue
            for q in range(p, j + 1):
                if (q, nc) in seen or not _match(e, s, p, q, memo):
                    continue
                if q == j and nc >= mn:
                    r = True
                    break
                seen.add((q, nc))
                frontier.append((q, nc))
    elif k == "interval":
        mn, mx, digits = node[1], node[2], node[3]
        sub = s[i:j]
        if not sub or not sub.isdigit():
            r = False
        elif digits > 0:
            r = len(sub) == digits and mn <= int(sub) <= mx
        else:
            r = mn <= int(sub) <= mx     # any leading zeros accepted
    else:                                # pragma: no cover
        raise AssertionError(k)
    memo[key] = r
    return r


def wildcard_to_pattern(pattern: str) -> tuple[str, str]:
    """WildcardQuery translation (`search/WildcardQuery.java` toAutomaton):
    ``*`` any string, ``?`` any char, ``\\x`` the literal x (a trailing
    backslash is lenient-parsed as a literal backslash).  Returns the
    anchored python pattern and the literal prefix usable for dictionary
    narrowing (stops at the first unescaped wildcard)."""
    out: list[str] = []
    prefix: list[str] = []
    literal_run = True
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "*":
            out.append(".*")
            literal_run = False
        elif c == "?":
            out.append(".")
            literal_run = False
        elif c == "\\" and i + 1 < len(pattern):
            i += 1
            out.append(re.escape(pattern[i]))
            if literal_run:
                prefix.append(pattern[i])
        else:
            out.append(re.escape(c))
            if literal_run:
                prefix.append(c)
        i += 1
    return "".join(out), "".join(prefix)
