"""Flink SQL logical type parser/printer with synonym equivalence, plus a
bidirectional mapping to ``pyspark.sql.types``.

Re-implements (Spark-first, no code copied) the semantics of the reference's
``decodable/client/types.py`` (807 LoC regex dispatcher):

- case-sensitive UPPERCASE keywords (``types.py:40-61``; lowercase rejected
  per ``tests/unit/decodable/client/test_types.py:28-29``),
- synonym equality: ``DECIMAL``≡``DEC``≡``NUMERIC`` (``types.py:290-293``),
  ``VARCHAR(2147483647)``≡``STRING`` (``types.py:132-134``),
  ``VARBINARY(2147483647)``≡``BYTES`` (``types.py:205-207``),
  ``FLOAT``≡``DOUBLE`` (``types.py:433-435`` — a documented reference quirk;
  we honor it for equality but map the two to distinct Spark types),
  ``TIMESTAMP(p) WITH [LOCAL] TIME ZONE``≡``TIMESTAMP_LTZ(p)``
  (``types.py:546-548``, ``types.py:580-582``),
  ``ARRAY<t>``≡``t ARRAY`` postfix form (``types.py:680-697``),
- defaults: ``DECIMAL``≡``DECIMAL(10)``≡``DECIMAL(10, 0)``
  (``test_types.py:51-58``), ``CHAR``/``VARCHAR`` default length 1,
  ``TIMESTAMP`` default precision 6,
- modifiers ``NOT NULL`` and ``PRIMARY KEY`` wrapping any type
  (``types.py:64-91``, ``types.py:743-762``),
- ``ROW<name type, ...>`` fully parsed (the reference left it as a TODO at
  ``types.py:731-740``; we must do better).

This module is pure Python (no SparkSession needed) so the parser unit tests
run instantly.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

MAX_LENGTH = 2147483647  # Flink's max VARCHAR/VARBINARY length == "unbounded"


class FlinkTypeError(ValueError):
    """Raised when a type string cannot be parsed."""


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FType:
    """Base class for parsed Flink logical types.

    Equality is canonical-form equality: synonyms compare equal.
    """

    def canonical(self) -> tuple[Any, ...]:
        raise NotImplementedError

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, FType):
            return NotImplemented
        return self.canonical() == other.canonical()

    def __hash__(self) -> int:
        return hash(self.canonical())

    def to_spark(self) -> T.DataType:
        raise NotImplementedError

    @property
    def nullable(self) -> bool:
        return True

    @property
    def primary_key(self) -> bool:
        return False


@dataclass(frozen=True, eq=False)
class Atomic(FType):
    """A parameterizable scalar type: CHAR(1), DECIMAL(10, 2), TIMESTAMP(3)…"""

    name: str
    params: tuple[int, ...] = ()
    # name as written (e.g. "DEC"), kept for round-trip printing
    written: str = ""
    written_params: tuple[int, ...] | None = None
    suffix: str = ""  # e.g. "WITH LOCAL TIME ZONE", printing only

    _SPARK = {
        "BOOLEAN": T.BooleanType(),
        "TINYINT": T.ByteType(),
        "SMALLINT": T.ShortType(),
        "INT": T.IntegerType(),
        "BIGINT": T.LongType(),
        "FLOAT": T.FloatType(),
        "DOUBLE": T.DoubleType(),
        "DATE": T.DateType(),
        "BYTES": T.BinaryType(),
        "BINARY": T.BinaryType(),
        "STRING": T.StringType(),
    }

    def canonical(self) -> tuple[Any, ...]:
        name, params = self.name, self.params
        # FLOAT ≡ DOUBLE: reference treats them as synonyms (types.py:433-435)
        if name == "FLOAT":
            name = "DOUBLE"
        if name == "VARCHAR" and params and params[0] == MAX_LENGTH:
            name, params = "STRING", ()
        if name == "VARBINARY" and params and params[0] == MAX_LENGTH:
            name, params = "BYTES", ()
        return ("atomic", name, params)

    def __repr__(self) -> str:
        name = self.written or self.name
        params = self.written_params if self.written_params is not None else None
        out = f"{name}({', '.join(str(p) for p in params)})" if params else name
        if self.suffix:
            out += f" {self.suffix}"
        return out

    def to_spark(self) -> T.DataType:
        name, params = self.name, self.params
        if name in self._SPARK:
            return self._SPARK[name]
        if name in ("CHAR", "VARCHAR"):
            return T.StringType()
        if name == "VARBINARY":
            return T.BinaryType()
        if name == "DECIMAL":
            p = params[0] if params else 10
            s = params[1] if len(params) > 1 else 0
            return T.DecimalType(p, s)
        if name == "TIME":
            # No Spark TIME type: nanos-of-day as LongType (SURVEY §7.3)
            return T.LongType()
        if name == "TIMESTAMP":
            return T.TimestampNTZType()
        if name == "TIMESTAMP_LTZ":
            return T.TimestampType()
        raise FlinkTypeError(f"no Spark mapping for {self!r}")


@dataclass(frozen=True, eq=False)
class Interval(FType):
    """INTERVAL types; the reference parses only the bare keyword
    (``types.py:780-792``) — we additionally keep the unit text."""

    spec: str = ""  # e.g. "DAY TO SECOND", "" for bare INTERVAL

    _YM_UNITS = ("YEAR", "MONTH")

    def canonical(self) -> tuple[Any, ...]:
        return ("interval", self.spec)

    def __repr__(self) -> str:
        return f"INTERVAL {self.spec}".strip()

    def to_spark(self) -> T.DataType:
        head = self.spec.split(" ")[0] if self.spec else "DAY"
        if head in self._YM_UNITS:
            return T.YearMonthIntervalType()
        return T.DayTimeIntervalType()


@dataclass(frozen=True, eq=False)
class Array(FType):
    element: FType = field(default_factory=lambda: Atomic("STRING"))
    postfix: bool = False  # written as "t ARRAY" (types.py:680-697)

    def canonical(self) -> tuple[Any, ...]:
        return ("array", self.element.canonical())

    def __repr__(self) -> str:
        if self.postfix:
            return f"{self.element!r} ARRAY"
        return f"ARRAY<{self.element!r}>"

    def to_spark(self) -> T.DataType:
        return T.ArrayType(self.element.to_spark(), containsNull=self.element.nullable)


@dataclass(frozen=True, eq=False)
class Map(FType):
    key: FType = field(default_factory=lambda: Atomic("STRING"))
    value: FType = field(default_factory=lambda: Atomic("STRING"))

    def canonical(self) -> tuple[Any, ...]:
        return ("map", self.key.canonical(), self.value.canonical())

    def __repr__(self) -> str:
        return f"MAP<{self.key!r}, {self.value!r}>"

    def to_spark(self) -> T.DataType:
        return T.MapType(
            self.key.to_spark(), self.value.to_spark(), valueContainsNull=self.value.nullable
        )


@dataclass(frozen=True, eq=False)
class Multiset(FType):
    """MULTISET<t> → count-map encoding MapType(t, IntegerType) in Spark."""

    element: FType | None = None  # None = bare keyword, as the reference parses

    def canonical(self) -> tuple[Any, ...]:
        return ("multiset", self.element.canonical() if self.element else None)

    def __repr__(self) -> str:
        if self.element is None:
            return "MULTISET"
        return f"MULTISET<{self.element!r}>"

    def to_spark(self) -> T.DataType:
        elem = self.element.to_spark() if self.element else T.StringType()
        return T.MapType(elem, T.IntegerType(), valueContainsNull=False)


@dataclass(frozen=True, eq=False)
class Row(FType):
    """ROW<name type, ...> → StructType (reference TODO at types.py:731-740)."""

    fields: tuple[tuple[str, FType], ...] = ()

    def canonical(self) -> tuple[Any, ...]:
        return ("row", tuple((n, t.canonical()) for n, t in self.fields))

    def __repr__(self) -> str:
        inner = ", ".join(f"{n} {t!r}" for n, t in self.fields)
        return f"ROW<{inner}>"

    def to_spark(self) -> T.DataType:
        return T.StructType(
            [T.StructField(n, t.to_spark(), nullable=t.nullable) for n, t in self.fields]
        )


@dataclass(frozen=True, eq=False)
class NotNull(FType):
    inner: FType = field(default_factory=lambda: Atomic("STRING"))

    def canonical(self) -> tuple[Any, ...]:
        return ("notnull", self.inner.canonical())

    def __repr__(self) -> str:
        return f"{self.inner!r} NOT NULL"

    def to_spark(self) -> T.DataType:
        return self.inner.to_spark()

    @property
    def nullable(self) -> bool:
        return False

    @property
    def primary_key(self) -> bool:
        return self.inner.primary_key


@dataclass(frozen=True, eq=False)
class PrimaryKey(FType):
    """``<t> PRIMARY KEY`` modifier (types.py:743-762). Implies NOT NULL for
    nullability purposes; kept distinct for round-trip printing."""

    inner: FType = field(default_factory=lambda: Atomic("STRING"))

    def canonical(self) -> tuple[Any, ...]:
        return ("pk", self.inner.canonical())

    def __repr__(self) -> str:
        return f"{self.inner!r} PRIMARY KEY"

    def to_spark(self) -> T.DataType:
        return self.inner.to_spark()

    @property
    def nullable(self) -> bool:
        return False

    @property
    def primary_key(self) -> bool:
        return True


# ---------------------------------------------------------------------------
# Parser: tokenizer + recursive descent
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"\s*(<|>|\(|\)|,|[A-Za-z_][A-Za-z0-9_]*|\d+|`[^`]*`|\S)")

_SIMPLE = {
    "STRING",
    "BYTES",
    "BOOLEAN",
    "TINYINT",
    "SMALLINT",
    "INT",
    "INTEGER",
    "BIGINT",
    "FLOAT",
    "DOUBLE",
    "DATE",
}
# name -> (canonical name, max params, defaults)
_PARAM = {
    "CHAR": ("CHAR", 1, (1,)),
    "VARCHAR": ("VARCHAR", 1, (1,)),
    "BINARY": ("BINARY", 1, (1,)),
    "VARBINARY": ("VARBINARY", 1, (1,)),
    "DECIMAL": ("DECIMAL", 2, (10, 0)),
    "DEC": ("DECIMAL", 2, (10, 0)),
    "NUMERIC": ("DECIMAL", 2, (10, 0)),
    "TIME": ("TIME", 1, (0,)),
    "TIMESTAMP": ("TIMESTAMP", 1, (6,)),
    "TIMESTAMP_LTZ": ("TIMESTAMP_LTZ", 1, (6,)),
}
_PARAM_REQUIRED = {"CHAR", "VARCHAR", "BINARY", "VARBINARY"}  # if parens given, need an arg

_INTERVAL_UNITS = {"YEAR", "MONTH", "DAY", "HOUR", "MINUTE", "SECOND", "TO"}


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.tokens = self._tokenize(text)
        self.pos = 0

    @staticmethod
    def _tokenize(text: str) -> list[str]:
        tokens = []
        i = 0
        while i < len(text):
            m = _TOKEN_RE.match(text, i)
            if not m:
                break
            tokens.append(m.group(1))
            i = m.end()
        return tokens

    def peek(self) -> str | None:
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def next(self) -> str:
        tok = self.peek()
        if tok is None:
            raise FlinkTypeError(f"unexpected end of type string: {self.text!r}")
        self.pos += 1
        return tok

    def expect(self, tok: str) -> None:
        got = self.next()
        if got != tok:
            raise FlinkTypeError(f"expected {tok!r}, got {got!r} in {self.text!r}")

    def parse(self) -> FType:
        t = self.parse_type()
        if self.pos != len(self.tokens):
            raise FlinkTypeError(
                f"trailing tokens {self.tokens[self.pos:]} in {self.text!r}"
            )
        return t

    def parse_type(self) -> FType:
        t = self._parse_base()
        # postfix modifiers, left to right: ARRAY / MULTISET / NOT NULL / PRIMARY KEY
        while True:
            tok = self.peek()
            if tok == "ARRAY":
                self.next()
                t = Array(t, postfix=True)
            elif tok == "MULTISET":
                self.next()
                t = Multiset(t)
            elif tok == "NOT":
                self.next()
                self.expect("NULL")
                t = NotNull(t)
            elif tok == "PRIMARY":
                self.next()
                self.expect("KEY")
                t = PrimaryKey(t)
            else:
                return t

    def _parse_params(self, name: str, maxp: int) -> tuple[int, ...] | None:
        """Parse an optional ``(n[, m])``; None if absent."""
        if self.peek() != "(":
            return None
        self.next()
        params: list[int] = []
        if self.peek() == ")":
            raise FlinkTypeError(f"{name}() requires an argument in {self.text!r}")
        while True:
            tok = self.next()
            if not tok.isdigit():
                raise FlinkTypeError(f"expected integer parameter, got {tok!r}")
            params.append(int(tok))
            tok = self.next()
            if tok == ")":
                break
            if tok != ",":
                raise FlinkTypeError(f"expected ',' or ')', got {tok!r}")
            if len(params) >= maxp:
                raise FlinkTypeError(f"too many parameters for {name} in {self.text!r}")
        return tuple(params)

    def _parse_base(self) -> FType:
        tok = self.next()

        if tok in _SIMPLE:
            name = "INT" if tok == "INTEGER" else tok
            return Atomic(name, written=tok)

        if tok in _PARAM:
            canon, maxp, defaults = _PARAM[tok]
            written = self._parse_params(tok, maxp)
            params = tuple(written) + defaults[len(written or ()) :] if written else defaults
            t = Atomic(canon, params, written=tok, written_params=written)
            if canon == "TIMESTAMP":
                return self._parse_timestamp_suffix(t)
            return t

        if tok == "ARRAY":
            self.expect("<")
            elem = self.parse_type()
            self.expect(">")
            return Array(elem)

        if tok == "MAP":
            self.expect("<")
            key = self.parse_type()
            self.expect(",")
            value = self.parse_type()
            self.expect(">")
            return Map(key, value)

        if tok == "MULTISET":
            if self.peek() == "<":
                self.next()
                elem = self.parse_type()
                self.expect(">")
                return Multiset(elem)
            return Multiset(None)

        if tok == "ROW":
            if self.peek() not in ("<", "("):
                return Row(())
            close = ">" if self.next() == "<" else ")"
            fields: list[tuple[str, FType]] = []
            while True:
                name = self.next()
                if name.startswith("`"):
                    name = name[1:-1]
                ftype = self.parse_type()
                fields.append((name, ftype))
                tok2 = self.next()
                if tok2 == close:
                    break
                if tok2 != ",":
                    raise FlinkTypeError(f"expected ',' or {close!r}, got {tok2!r}")
            return Row(tuple(fields))

        if tok == "INTERVAL":
            units: list[str] = []
            while self.peek() in _INTERVAL_UNITS:
                units.append(self.next())
                # optional precision after a unit, e.g. SECOND(3)
                if self.peek() == "(":
                    p = self._parse_params("INTERVAL", 1)
                    units[-1] += f"({p[0]})"
            return Interval(" ".join(units))

        raise FlinkTypeError(f"cannot parse Flink type {self.text!r} (at token {tok!r})")

    def _parse_timestamp_suffix(self, t: Atomic) -> Atomic:
        """Handle ``TIMESTAMP(p) WITH [LOCAL] TIME ZONE`` / ``WITHOUT TIME ZONE``."""
        if self.peek() not in ("WITH", "WITHOUT"):
            return t
        word = self.next()
        local = False
        if word == "WITH" and self.peek() == "LOCAL":
            self.next()
            local = True
        self.expect("TIME")
        self.expect("ZONE")
        if word == "WITHOUT":
            return t
        # WITH [LOCAL] TIME ZONE ≡ TIMESTAMP_LTZ (types.py:546-548, 580-582)
        suffix = "WITH LOCAL TIME ZONE" if local else "WITH TIME ZONE"
        return Atomic(
            "TIMESTAMP_LTZ",
            t.params,
            written=t.written or "TIMESTAMP",
            written_params=t.written_params,
            suffix=suffix,
        )


def parse(type_str: str) -> FType:
    """Parse a Flink SQL type string. Case-sensitive UPPERCASE keywords only
    (``Char(10)`` and ``string`` are rejected, per the reference's tests)."""
    if not isinstance(type_str, str) or not type_str.strip():
        raise FlinkTypeError(f"empty type string: {type_str!r}")
    return _Parser(type_str.strip()).parse()


def to_spark(type_str: str | FType) -> T.DataType:
    """Flink type string (or parsed FType) → Spark DataType."""
    t = parse(type_str) if isinstance(type_str, str) else type_str
    return t.to_spark()


def nullable(type_str: str | FType) -> bool:
    t = parse(type_str) if isinstance(type_str, str) else type_str
    return t.nullable


# ---------------------------------------------------------------------------
# Reverse: Spark DataType → Flink type string
# ---------------------------------------------------------------------------

_FROM_SPARK: dict[type, str] = {
    T.BooleanType: "BOOLEAN",
    T.ByteType: "TINYINT",
    T.ShortType: "SMALLINT",
    T.IntegerType: "INT",
    T.LongType: "BIGINT",
    T.FloatType: "FLOAT",
    T.DoubleType: "DOUBLE",
    T.DateType: "DATE",
    T.BinaryType: "BYTES",
    T.StringType: "STRING",
    T.TimestampType: "TIMESTAMP_LTZ(6)",
    T.TimestampNTZType: "TIMESTAMP(6)",
    T.DayTimeIntervalType: "INTERVAL DAY TO SECOND",
    T.YearMonthIntervalType: "INTERVAL YEAR TO MONTH",
    T.NullType: "STRING",
}


def from_spark(dt: T.DataType, nullable: bool = True) -> str:
    """Spark DataType → Flink type string (inverse of :func:`to_spark`)."""
    s: str
    if isinstance(dt, T.DecimalType):
        s = f"DECIMAL({dt.precision}, {dt.scale})"
    elif isinstance(dt, T.VarcharType):
        s = f"VARCHAR({dt.length})"
    elif isinstance(dt, T.CharType):
        s = f"CHAR({dt.length})"
    elif isinstance(dt, T.ArrayType):
        s = f"ARRAY<{from_spark(dt.elementType, dt.containsNull)}>"
    elif isinstance(dt, T.MapType):
        s = f"MAP<{from_spark(dt.keyType, False)}, {from_spark(dt.valueType, dt.valueContainsNull)}>"
    elif isinstance(dt, T.StructType):
        inner = ", ".join(
            f"{f.name} {from_spark(f.dataType, f.nullable)}" for f in dt.fields
        )
        s = f"ROW<{inner}>"
    else:
        try:
            s = _FROM_SPARK[type(dt)]
        except KeyError:
            raise FlinkTypeError(f"no Flink mapping for Spark type {dt}") from None
    if not nullable:
        s += " NOT NULL"
    return s
