"""Extendable query parser (`queryparser/ext/ExtendableQueryParser.java`,
`Extensions.java`, `ExtensionQuery.java`, `ParserExtension.java`): the
classic dialect with pluggable per-field extensions.

An extension is registered under a key; a field written as
``<field><delimiter><key>`` (delimiter escaped with a backslash inside the
classic grammar, ``Extensions.buildExtensionField``) routes that field's
query text to the extension instead of the standard term path:

    ext = Extensions()                      # default delimiter ':'
    ext.add("near", MyNearExtension())
    parse_extendable(r'aField\\:near:"foo bar"', extensions=ext)

``splitExtensionField`` splits the unescaped field on the FIRST delimiter:
no delimiter -> no extension (plain field); empty field part -> the default
query field (`Extensions.java` splitExtensionField semantics).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

DEFAULT_EXTENSION_FIELD_DELIMITER = ":"


@dataclass(frozen=True)
class ExtensionQuery:
    """What a ParserExtension receives (`ext/ExtensionQuery.java`): the
    resolved target field and the raw (unescaped, unquoted) query text."""
    field: str
    raw_query_string: str


class ParserExtension:
    """Extension callback (`ext/ParserExtension.java`): parse(ExtensionQuery)
    -> query object.  Subclass or pass any callable to Extensions.add."""

    def parse(self, query: ExtensionQuery):
        raise NotImplementedError


class Extensions:
    """Registry of ParserExtensions keyed by extension key
    (`ext/Extensions.java`)."""

    def __init__(self, delimiter: str = DEFAULT_EXTENSION_FIELD_DELIMITER):
        if len(delimiter) != 1:
            raise ValueError("extension field delimiter must be one char")
        self.delimiter = delimiter
        self._map: dict[str, object] = {}

    def add(self, key: str, extension) -> None:
        self._map[key] = extension

    def get_extension(self, key: str):
        return self._map.get(key)

    def split_extension_field(self, default_field: str,
                              field: str) -> tuple[str, str | None]:
        """(field, extension_key) on the FIRST delimiter; no delimiter ->
        (field, None); empty field part -> the default field."""
        i = field.find(self.delimiter)
        if i < 0:
            return field, None
        return (field[:i] if i > 0 else default_field), field[i + 1:]

    def build_extension_field(self, key: str, field: str = "") -> str:
        """Escaped composite field for the classic grammar
        (`Extensions.buildExtensionField`: field + delimiter + key, then
        escape the WHOLE composite)."""
        return self.escape(field + self.delimiter + key)

    @staticmethod
    def escape(s: str) -> str:
        return re.sub(r'([+\-!(){}\[\]^"~*?:\\/&|])', r"\\\1", s)


def unescape(s: str) -> str:
    """Drop single-char backslash escapes (QueryParserBase.discardEscapeChar
    subset: no unicode escapes)."""
    return re.sub(r"\\(.)", r"\1", s)


def try_extension(word: str, default_field: str, extensions: Extensions):
    """Resolve one composite ``field:value`` token against the extension
    registry.  Returns the extension's query, or None when the token does
    not name a registered extension (the classic path then applies).
    Raises ValueError on an unbalanced quoted value (the reference's
    ParseException for unescaped delimiters, TestExtendableQueryParser
    testUnescapedExtDelimiter)."""
    # split field from value at the LAST unescaped ':' before the value;
    # the classic field separator is always ':' regardless of ext delimiter
    m = re.fullmatch(r'((?:[^:\\]|\\.)*):("?)(.*)', word, re.DOTALL)
    if not m:
        return None
    raw_field, quote, value = m.groups()
    if quote:
        if not value.endswith('"') or len(value) < 1:
            raise ValueError(f"unbalanced quote in {word!r}")
        value = value[:-1]
    elif '"' in value:
        # an UNESCAPED delimiter left quote chars inside the value part —
        # the reference grammar rejects this (TestExtendableQueryParser
        # testUnescapedExtDelimiter ParseException)
        raise ValueError(f"unescaped extension delimiter in {word!r}")
    field_part = unescape(raw_field)
    fld, key = extensions.split_extension_field(default_field, field_part)
    if key is None:
        return None
    ext = extensions.get_extension(unescape(key))
    if ext is None:
        return None
    eq = ExtensionQuery(fld or default_field, unescape(value))
    return ext.parse(eq) if hasattr(ext, "parse") else ext(eq)


def parse_extendable(text: str, field: str = "text",
                     extensions: Extensions | None = None):
    """ExtendableQueryParser.parse: classic dialect + extension dispatch
    on composite fields.  With no extensions this IS parse_classic."""
    from .query import _parse_classic

    return _parse_classic(text, field, complex_phrases=False,
                          extensions=extensions or Extensions())
