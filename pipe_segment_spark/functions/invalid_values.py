"""Declarative per-type invalid-value rule table, compiled to Catalyst
``when()`` chains and to the mirror DuckDB SQL.

Reference: transform/invalid_values.py:97-200 — a dict of message-type ->
field -> validator, with fixed-point comparisons
(``float_to_fixed_point``, invalid_values.py:27-44), ``@@@...`` sentinel
values, an IMO zfill+range check, and group rules (VMS lat=lon=0 -> both
NULL). Recast per-field over the tokenized schema:

    n_tok  — the numeric payload           (lat/lon/speed bounds analog)
    rate   — n_tok / len(tokens), double   (fixed-point-compared field)
    ident  — ident_value string            (sentinel analog)
    imo    — zfill(msgid digits, 10)       (IMO range rule, verbatim bounds)

Fixed-point analog: ``round(value, precision)`` before comparison. Both
engines round positive halves away from zero (Spark HALF_UP BigDecimal,
DuckDB half-away-from-zero), so compiled rules are bit-identical; the
reference's Decimal.quantize uses banker's rounding — a documented
divergence on exact .5 boundaries only.

Each rule instance is a plain data object so the table reads like the
reference's and compiles to BOTH engines from one source of truth.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Bounds:
    """invalid iff v < lo OR v >= hi (reference lat/lon/course/speed)."""

    lo: float
    hi: float

    def spark(self, v: Column) -> Column:
        return (v < self.lo) | (v >= self.hi)

    def sql(self, v: str) -> str:
        return f"({v} < {self.lo} OR {v} >= {self.hi})"


@dataclass(frozen=True)
class FixedBounds:
    """invalid iff round(v, precision) out of [lo, hi) — the
    validate_fixed_position_field analog."""

    precision: int
    lo: float
    hi: float

    def spark(self, v: Column) -> Column:
        r = F.round(v, self.precision)
        return (r < self.lo) | (r >= self.hi)

    def sql(self, v: str) -> str:
        r = f"round({v}, {self.precision})"
        return f"({r} < {self.lo} OR {r} >= {self.hi})"


@dataclass(frozen=True)
class Sentinel:
    """invalid iff v == sentinel (reference '@@@@@@@' fields)."""

    value: str

    def spark(self, v: Column) -> Column:
        return v == self.value

    def sql(self, v: str) -> str:
        return f"({v} = '{self.value}')"


@dataclass(frozen=True)
class ModSentinel:
    """invalid iff v % modulus == 0 (periodic placeholder analog)."""

    modulus: int

    def spark(self, v: Column) -> Column:
        return v % self.modulus == 0

    def sql(self, v: str) -> str:
        return f"({v} % {self.modulus} = 0)"


@dataclass(frozen=True)
class StrLenBounds:
    """invalid iff len(v) outside [lo, hi) (reference name/shiptype/callsign
    length sanity checks)."""

    lo: int
    hi: int

    def spark(self, v: Column) -> Column:
        n = F.length(v)
        return (n < self.lo) | (n >= self.hi)

    def sql(self, v: str) -> str:
        n = f"length({v})"
        return f"({n} < {self.lo} OR {n} >= {self.hi})"


@dataclass(frozen=True)
class ImoRange:
    """invalid iff NOT ('0000000001' <= zfill(v, 10) < '1073741824') —
    the reference AIS.5 imo rule verbatim (invalid_values.py:132-134)."""

    def spark(self, v: Column) -> Column:
        z = F.lpad(v, 10, "0")
        return ~((z >= "0000000001") & (z < "1073741824"))

    def sql(self, v: str) -> str:
        z = f"lpad({v}, 10, '0')"
        return f"(NOT ({z} >= '0000000001' AND {z} < '1073741824'))"


# type (source) -> field -> rule; mirrors
# INVALID_VALUE_RULES_BY_MESSAGE_TYPE's shape (reference
# invalid_values.py:97-200: ~25 field rules over the message types; this
# table carries 25 instances over 6 rule kinds). ``tok0``/``tok1`` are the
# fixed-position-field pair (lat/lon analog) with per-source precision
# variants, exactly like the reference's per-type
# validate_fixed_position_field precisions.
RULES: dict[str, dict[str, object]] = {
    "click": {
        "n_tok": Bounds(2, 90),
        "rate": FixedBounds(1, 0.5, 12.0),
        "ident": Sentinel("name_0"),
        "tok0": FixedBounds(3, 0.5, 45.0),
        "tok1": FixedBounds(3, 0.5, 42.0),
        "dest": Sentinel("dst_0"),
    },
    "view": {
        "n_tok": Bounds(1, 95),
        "rate": FixedBounds(0, 1.0, 14.0),
        "tok0": FixedBounds(2, 0.5, 45.0),
        "tok1": FixedBounds(2, 0.5, 42.0),
        "ident": StrLenBounds(2, 6),
    },
    "error": {
        "n_tok": ModSentinel(10),
        "imo": ImoRange(),
        "tok0": FixedBounds(0, 0.5, 45.0),
        "dest": StrLenBounds(2, 16),
    },
    "purchase": {
        "n_tok": Bounds(3, 97),
        "rate": FixedBounds(2, 0.5, 13.0),
        "tok0": FixedBounds(1, 0.5, 45.0),
        "tok1": FixedBounds(1, 0.5, 42.0),
        "imo": ImoRange(),
    },
    "signup": {
        "n_tok": Bounds(1, 90),
        "ident": Sentinel("name_0"),
        "tok0": FixedBounds(4, 0.5, 45.0),
        "rate": FixedBounds(1, 1.0, 15.0),
        "dest": Sentinel("dst_0"),
    },
}

# types whose (tok0, tok1) pair is invalid TOGETHER when both round to zero
# at precision 0 (reference VMS lat=lon=0 group rule,
# invalid_values.py:163-177): both fields -> NULL as a unit
GROUP_RULE_TYPES = ("click", "purchase", "signup")


def group_rule_spark(source: Column, tok0: Column, tok1: Column) -> Column:
    """Boolean condition: the (source, tok0=tok1=0) group rule fires."""
    both_zero = (F.round(tok0, 0) == 0.0) & (F.round(tok1, 0) == 0.0)
    return source.isin(*GROUP_RULE_TYPES) & both_zero


def group_rule_sql(source: str, tok0: str, tok1: str) -> str:
    srcs = ", ".join(f"'{t}'" for t in GROUP_RULE_TYPES)
    return (
        f"({source} IN ({srcs}) AND round({tok0}, 0) = 0.0 "
        f"AND round({tok1}, 0) = 0.0)"
    )


def compile_spark_mask(field: str, value: Column, source: Column) -> Column:
    """value -> NULL when the (source, field) rule fires, else value."""
    expr = None
    for src, rules in RULES.items():
        rule = rules.get(field)
        if rule is None:
            continue
        cond = (source == src) & rule.spark(value)
        expr = F.when(cond, F.lit(None)) if expr is None else expr.when(
            cond, F.lit(None)
        )
    return value if expr is None else expr.otherwise(value)


def compile_sql_mask(field: str, value: str, source: str = "source") -> str:
    """The identical mask as DuckDB CASE text."""
    whens = []
    for src, rules in RULES.items():
        rule = rules.get(field)
        if rule is None:
            continue
        whens.append(f"WHEN {source} = '{src}' AND {rule.sql(value)} THEN NULL")
    if not whens:
        return value
    return "CASE " + " ".join(whens) + f" ELSE {value} END"
