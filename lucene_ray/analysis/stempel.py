"""Stempel — algorithmic stemmer table engine (egothor) + Polish stemming.

Role of the reference's stempel module
(`analysis/stempel/src/java/org/apache/lucene/analysis/stempel/StempelStemmer.java`,
`org/egothor/stemmer/Trie.java`, `MultiTrie.java`, `MultiTrie2.java`,
`Row.java`, `Cell.java`, `Diff.java`): a trained stemming table maps a word
(read right-to-left for suffix languages) to a *patch command* — a
character-pair program (`Diff.apply`) that edits the word in place into its
stem.  The shipped `stemmer_20000.tbl` is the egothor-built Polish table
(Apache-2.0, built from a 20k-word training set); `PolishAnalyzer`
(`analysis/stempel/.../pl/PolishAnalyzer.java`) runs standard → lowercase →
stop(carrot2 set) → stempel(minLength=3).

Binary format (java.io.DataInput, all big-endian):
  file   := UTF(method) trie
  method contains 'M' → MultiTrie2, else plain Trie
  MultiTrie2 := bool(forward) int(BY) int(n) Trie[n]
  Trie   := bool(forward) int(root) int(n) UTF(cmd)[n] int(m) Row[m]
  Row    := int(n) { char cmd:int cnt:int ref:int skip:int }[n]

Lookup (`Trie.getLastOnPath`, `MultiTrie2.getLastOnPath:140-180`): walk the
rows one character at a time (right-to-left when forward=false), remember
the last command seen; MultiTrie2 chains up to BY command fragments across
its sub-tries, stopping at the EOM ('*') sentinel, with the reference's
`cannotFollow` ('-'/'D' never follows itself) and `lengthPP` key-skip
rules.  `Diff.apply` then interprets the concatenated command pairs
('-x' skip, 'Rx' replace, 'Dx' delete run, 'Ix' insert) from the END of
the word backwards.

The table file and stop set are data resources (not code) bundled exactly
as shipped; parsing and lookup are reimplemented here in Python with the
rows as plain dicts.  Validated on the reference's PolishAnalyzer test
vectors.
"""

from __future__ import annotations

import os
import struct

EOM = "*"


class _Trie:
    __slots__ = ("forward", "root", "cmds", "rows")

    def __init__(self, forward, root, cmds, rows):
        self.forward = forward
        self.root = root
        self.cmds = cmds
        self.rows = rows

    def get_last_on_path(self, key: str) -> str | None:
        """`Trie.getLastOnPath` (`Trie.java:267-289`)."""
        rows = self.rows
        if not (0 <= self.root < len(rows)) or not key:
            return None
        now = rows[self.root]
        last = None
        seq = key if self.forward else key[::-1]
        for i in range(len(key) - 1):
            ch = seq[i]
            cell = now.get(ch)
            if cell is not None and cell[0] >= 0:
                last = self.cmds[cell[0]]
            if cell is None or cell[1] < 0 or not (0 <= cell[1] < len(rows)):
                return last
            now = rows[cell[1]]
        cell = now.get(seq[len(key) - 1])
        if cell is not None and cell[0] >= 0:
            return self.cmds[cell[0]]
        return last


class _MultiTrie2:
    __slots__ = ("forward", "by", "tries")

    def __init__(self, forward, by, tries):
        self.forward = forward
        self.by = by
        self.tries = tries

    def _skip(self, s: str, count: int) -> str:
        if count > len(s):
            raise IndexError
        return s[count:] if self.forward else s[:len(s) - count]

    @staticmethod
    def _length_pp(cmd: str) -> int:
        """`MultiTrie2.lengthPP:318-336`: how many KEY characters a command
        fragment consumes ('-'/'D' consume their run, 'R' one, 'I' none)."""
        ln = 0
        i = 0
        while i < len(cmd):
            c = cmd[i]
            i += 1
            if c in "-D":
                ln += ord(cmd[i]) - ord("a") + 1
            elif c == "R":
                ln += 1
            # 'I' adds nothing; parameter char always consumed
            i += 1
        return ln

    @staticmethod
    def _cannot_follow(after: str, goes: str) -> bool:
        return after in "-D" and after == goes

    def get_last_on_path(self, key: str) -> str | None:
        """`MultiTrie2.getLastOnPath:140-180` — concatenate per-level
        command fragments; IndexOutOfBounds in the reference silently ends
        the walk (the try/catch), mirrored by the IndexError guard."""
        result = []
        lastkey = key
        p = []
        lastch = " "
        try:
            for t in self.tries:
                r = t.get_last_on_path(lastkey)
                if r is None or (len(r) == 1 and r[0] == EOM):
                    break
                if self._cannot_follow(lastch, r[0]):
                    break
                lastch = r[-2]
                p.append(r)
                if r[0] == "-":
                    if len(p) > 1:
                        key = self._skip(key, self._length_pp(p[-2]))
                    key = self._skip(key, self._length_pp(r))
                result.append(r)
                if key:
                    lastkey = key
        except IndexError:
            pass
        return "".join(result) if result else None


def diff_apply(word: str, diff: str | None) -> str:
    """`Diff.apply` (`Diff.java:103-151`): interpret the patch pairs from
    the end of the word backwards; out-of-bounds aborts silently leaving
    the partial edit (reference catch blocks)."""
    if diff is None:
        return word
    dest = list(word)
    pos = len(dest) - 1
    if pos < 0:
        return word
    try:
        for i in range(len(diff) // 2):
            cmd = diff[2 * i]
            param = diff[2 * i + 1]
            par_num = ord(param) - ord("a") + 1
            if cmd == "-":
                pos = pos - par_num + 1
            elif cmd == "R":
                if not (0 <= pos < len(dest)):
                    raise IndexError
                dest[pos] = param
            elif cmd == "D":
                o = pos
                pos -= par_num - 1
                if pos < 0 or o >= len(dest):
                    raise IndexError
                del dest[pos:o + 1]
            elif cmd == "I":
                pos += 1
                if not (0 <= pos <= len(dest)):
                    raise IndexError
                dest.insert(pos, param)
            pos -= 1
    except IndexError:
        pass
    return "".join(dest)


class _Reader:
    __slots__ = ("b", "o")

    def __init__(self, b: bytes):
        self.b = b
        self.o = 0

    def bool_(self):
        v = self.b[self.o] != 0
        self.o += 1
        return v

    def int_(self):
        v = struct.unpack_from(">i", self.b, self.o)[0]
        self.o += 4
        return v

    def char_(self):
        v = struct.unpack_from(">H", self.b, self.o)[0]
        self.o += 2
        return chr(v)

    def utf_(self):
        n = struct.unpack_from(">H", self.b, self.o)[0]
        self.o += 2
        raw = self.b[self.o:self.o + n]
        self.o += n
        # modified UTF-8: plain UTF-8 decode suffices for these tables
        # (no embedded NULs / surrogates in command strings)
        return raw.decode("utf-8")


def _read_trie(r: _Reader) -> _Trie:
    forward = r.bool_()
    root = r.int_()
    cmds = [r.utf_() for _ in range(r.int_())]
    rows = []
    for _ in range(r.int_()):
        row = {}
        for _ in range(r.int_()):
            ch = r.char_()
            cmd = r.int_()
            _cnt = r.int_()
            ref = r.int_()
            skip = r.int_()
            row[ch] = (cmd, ref, skip)
        rows.append(row)
    return _Trie(forward, root, cmds, rows)


def load_trie(path: str):
    """`StempelStemmer.load`: method string with 'M' → MultiTrie2."""
    with open(path, "rb") as f:
        r = _Reader(f.read())
    method = r.utf_().upper()
    if "M" not in method:
        return _read_trie(r)
    forward = r.bool_()
    by = r.int_()
    tries = [_read_trie(r) for _ in range(r.int_())]
    return _MultiTrie2(forward, by, tries)


_POLISH = None


def _polish_trie():
    global _POLISH
    if _POLISH is None:
        _POLISH = load_trie(os.path.join(os.path.dirname(__file__), "data",
                                         "stempel_polish.tbl"))
    return _POLISH


def stempel_stem(word: str, min_length: int = 3) -> str:
    """`StempelFilter.incrementToken` (`StempelFilter.java:71-84`) over the
    Polish table: words shorter than minLength (default 3) pass through;
    a null/empty stem keeps the original token (`StempelStemmer.stem`)."""
    if len(word) < min_length:
        return word
    cmd = _polish_trie().get_last_on_path(word)
    if cmd is None:
        return word
    out = diff_apply(word, cmd)
    return out if out else word
