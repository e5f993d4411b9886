"""ANN scale-path validation: bucketed top-k recall vs the brute-force
baseline on the same fixtures, and the scale-aware LSH width at >= 12 bits
on a larger synthetic embedding table (VERDICT r02 asks #4/#5)."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from pipe_segment_spark.queries.corpus_q import (
    LSH_HI,
    LSH_LO,
    lsh_bits_for,
    q_ann_bucketed_topk,
    q_ann_cosine_topk,
    q_dedup_embedding_near,
    O_DEDUP_EMBEDDING_NEAR,
)
from tests.conftest import SF_DIR


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["q_id"], set()).add(r["c_id"])
    return out


def test_bucketed_topk_recall_vs_brute_force(spark):
    """Multiprobe bucketed retrieval must recover a meaningful share of the
    exact top-5 on the same fixture (recorded in PLANS.md). It is an ANN —
    100% is not expected; 0 would mean the bucket join is broken."""
    brute = _topk_sets(q_ann_cosine_topk(spark, SF_DIR))
    bucketed = _topk_sets(q_ann_bucketed_topk(spark, SF_DIR))
    assert set(bucketed) == set(brute)  # every query returns something
    hits = sum(len(bucketed[q] & brute[q]) for q in brute)
    total = sum(len(brute[q]) for q in brute)
    recall = hits / total
    print(f"bucketed-topk recall@5 = {recall:.3f} ({hits}/{total})")
    # r5 regime-switched probe order: sparse tier-3 fixtures probe in
    # systematic (popcount, margin) order -> measured 0.700 here (r4's
    # pure margin order was 0.600); floor pins most of the recovery
    assert recall >= 0.6


def test_lsh_bits_formula():
    assert lsh_bits_for(0) == LSH_LO
    assert lsh_bits_for(500) == LSH_LO  # gate fixture -> unchanged 8 bits
    assert lsh_bits_for(2000) == LSH_LO
    assert lsh_bits_for(16 * (1 << 12)) == 12
    assert lsh_bits_for(100_000) == 12
    assert lsh_bits_for(10**9) == LSH_HI  # clamped
    assert lsh_bits_for(10**12) == LSH_HI


def test_embedding_near_dup_at_12_bits(spark, tmp_path):
    """Engine == oracle on a 70k-vector synthetic table where the derived
    width is >= 12 bits (the r2 fixed-8-bit scheme would put ~270 vectors
    per bucket here; the scale-aware width keeps it ~17)."""
    n = 70_000
    assert lsh_bits_for(n) >= 12
    emb_dir = str(tmp_path / "embeddings.parquet")
    # deterministic centered vectors; ONE parquet file feeds both engines
    spark.range(n).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 7).cast("int").alias("label"),
        # md5-mixed per (id, dim): modular-arithmetic formulas leave the
        # sign-comparison bits correlated -> mega-buckets -> quadratic pair
        # join; a hash gives ~uniform buckets (the scenario the width is for)
        F.expr(
            "transform(sequence(1, 64), i -> "
            "cast((cast(conv(substring(md5(concat(cast(id as string), ':', "
            "cast(i as string))), 1, 8), 16, 10) as double) / 4294967295.0 "
            "- 0.5) as float))"
        ).alias("embedding"),
    ).coalesce(4).write.parquet(emb_dir)

    spark_rows = sorted(
        (r["bucket"], r["id_a"], r["id_b"], r["cos"])
        for r in q_dedup_embedding_near(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{emb_dir}/*.parquet'"
    )
    duck_rows = sorted(
        tuple(r) for r in con.sql(O_DEDUP_EMBEDDING_NEAR).fetchall()
    )
    assert len(spark_rows) == len(duck_rows)
    assert spark_rows == duck_rows


def test_probe_tier_budget():
    from pipe_segment_spark.queries.corpus_q import probe_tier_for

    # gate fixture: 500 vecs / 8 bits -> sparse buckets -> deep probing
    assert probe_tier_for(500, 8) == 3
    # realistic population (~17/bucket at 12 bits): pairs tier
    assert probe_tier_for(16 * (1 << 12), 12) == 2
    assert probe_tier_for(70_000, 12) == 2
    # wide tables (bits >= 15, N >= ~0.5M): 1-bit probing already clears
    # the candidate budget — probe count stays ~bits per query at scale
    assert probe_tier_for(10**9, 24) == 1
    assert probe_tier_for(10**12, 24) == 1
    # mid-sparse: pairs tier
    assert probe_tier_for(4_000, 8) == 2


def test_bucketed_topk_recall_at_realistic_population(spark, tmp_path):
    """Recall of the bucketed retrieval vs brute force at a bucket
    population the width formula actually targets (70k vectors -> 12 bits,
    ~17/bucket, probe tier auto). The gate fixture's sparse buckets are the
    worst case; this is the number that matters for the 100-TB story."""
    from pipe_segment_spark.queries.corpus_q import (
        q_ann_bucketed_topk as q_bucketed,
    )

    n = 70_000
    emb_dir = str(tmp_path / "embeddings.parquet")
    spark.range(n).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 7).cast("int").alias("label"),
        F.expr(
            "transform(sequence(1, 64), i -> "
            "cast((cast(conv(substring(md5(concat(cast(id as string), ':', "
            "cast(i as string))), 1, 8), 16, 10) as double) / 4294967295.0 "
            "- 0.5) as float))"
        ).alias("embedding"),
    ).coalesce(8).write.parquet(emb_dir)

    brute = _topk_sets(q_ann_cosine_topk(spark, str(tmp_path)))
    bucketed = _topk_sets(q_bucketed(spark, str(tmp_path)))
    assert set(bucketed) == set(brute)
    hits = sum(len(bucketed[q] & brute[q]) for q in brute)
    total = sum(len(brute[q]) for q in brute)
    recall = hits / total
    print(f"bucketed-topk recall@5 @70k/12bits = {recall:.3f} ({hits}/{total})")
    # md5-uniform vectors are the adversarial case for LSH (no cluster
    # structure at all); the bucketed path must still find a meaningful
    # share of the exact top-5. Margin-ranked probing (r4) lifted this
    # fixture 0.183 -> 0.245 at the same probe budget, and the r5 regime
    # switch keeps it (tier 2 here -> margin order): measured 0.245. The
    # floor locks in most of that gain.
    assert recall >= 0.22


def test_probe_count_budget_and_row_count_source():
    """probe_count_for keeps the tier system's probe budget (capped by the
    2^L perturbation pool), and table_row_count derives N from parquet
    footers without a Spark job (VERDICT r03 asks #6/#7)."""
    from pipe_segment_spark.queries.corpus_q import (
        ANN_MARGIN_POOL_BITS,
        probe_count_for,
        table_row_count,
    )

    # gate fixture: tier 3 at 500/8 -> 1+8+28+56 = 93 probes (pool 256)
    assert probe_count_for(500, 8) == 93
    # 70k/12: tier 2 -> 1+12+66 = 79 probes
    assert probe_count_for(70_000, 12) == 79
    # production: tier 1 -> 1+bits probes
    assert probe_count_for(10**9, 24) == 25
    # pool cap: P never exceeds 2^min(bits, POOL_BITS)
    assert probe_count_for(1, 8) <= 1 << min(8, ANN_MARGIN_POOL_BITS)

    n = table_row_count("/root/testdata/sf0.001", "embeddings")
    assert n > 0
    # cached second call returns the identical value
    assert table_row_count("/root/testdata/sf0.001", "embeddings") == n


def test_ivf_nprobe_budget():
    """ivf_nprobe_for = clamp(ceil(IVF_TARGET_CANDIDATES/(N/C)), 2, C):
    integer-exact (oracle twin uses the same (a*c + n - 1) // n), saturates
    to C (exact search) at tiny N, floors at 2 at production N."""
    from pipe_segment_spark.queries.corpus_q import (
        ivf_clusters_for,
        ivf_nprobe_for,
    )

    # gate fixture: 500 vecs -> C=16 -> ceil(1024*16/500)=33 -> clamp to C
    assert ivf_clusters_for(500) == 16
    assert ivf_nprobe_for(500, 16) == 16
    # 70k -> C=512 -> ceil(1024*512/70000) = ceil(7.49) = 8
    assert ivf_clusters_for(70_000) == 512
    assert ivf_nprobe_for(70_000, 512) == 8
    # 1M -> C=4096 -> ceil(1024*4096/1e6) = 5
    assert ivf_nprobe_for(1_000_000, 4096) == 5
    # production: one cell already exceeds the budget -> floor of 2,
    # scanned fraction FALLS with N (2/4096 of the corpus)
    assert ivf_nprobe_for(10**9, 4096) == 2
    assert ivf_nprobe_for(10**12, 4096) == 2


def test_ivf_topk_recall_vs_brute_force(spark):
    """IVF-flat retrieval (deterministic one-step-Lloyd coarse quantizer,
    budget-derived nprobe — saturates to C on this fixture, i.e. exact
    search) must recover the exact top-5 on the gate fixture — recorded
    in PLANS.md alongside the LSH path."""
    from pipe_segment_spark.queries.corpus_q import q_ann_ivf_topk

    brute = _topk_sets(q_ann_cosine_topk(spark, SF_DIR))
    ivf = _topk_sets(q_ann_ivf_topk(spark, SF_DIR))
    assert set(ivf) == set(brute)
    hits = sum(len(ivf[q] & brute[q]) for q in brute)
    total = sum(len(brute[q]) for q in brute)
    recall = hits / total
    print(f"ivf-topk recall@5 = {recall:.3f} ({hits}/{total})")
    # budget-derived nprobe (r5) saturates to C at gate-fixture N, i.e.
    # every cell is probed and the exact re-rank makes retrieval exact:
    # measured 1.000 (r4's hard-coded nprobe=2 gave 0.367)
    assert recall >= 0.99


def test_ivf_topk_recall_at_realistic_population(spark, tmp_path):
    """IVF recall at a population where the cluster formula targets ~137
    vectors/cluster (70k -> C=512, nprobe=2 -> ~274 candidates/query) on
    the adversarial md5-uniform vectors."""
    from pipe_segment_spark.queries.corpus_q import (
        ivf_clusters_for,
        q_ann_ivf_topk,
    )

    n = 70_000
    assert ivf_clusters_for(n) == 512
    emb_dir = str(tmp_path / "embeddings.parquet")
    spark.range(n).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 7).cast("int").alias("label"),
        F.expr(
            "transform(sequence(1, 64), i -> "
            "cast((cast(conv(substring(md5(concat(cast(id as string), ':', "
            "cast(i as string))), 1, 8), 16, 10) as double) / 4294967295.0 "
            "- 0.5) as float))"
        ).alias("embedding"),
    ).coalesce(8).write.parquet(emb_dir)

    brute = _topk_sets(q_ann_cosine_topk(spark, str(tmp_path)))
    ivf = _topk_sets(q_ann_ivf_topk(spark, str(tmp_path)))
    assert set(ivf) == set(brute)
    hits = sum(len(ivf[q] & brute[q]) for q in brute)
    total = sum(len(brute[q]) for q in brute)
    recall = hits / total
    print(f"ivf-topk recall@5 @70k/C512 = {recall:.3f} ({hits}/{total})")
    # uniform vectors have no cluster structure at all — the coarse
    # quantizer's cells are essentially random Voronoi cells. The r5
    # budget-derived nprobe (= 8 here, ~3.8% of the corpus scanned)
    # measured 0.316 vs the r4 hard-coded nprobe=2's 0.125; the floor
    # pins most of the lift (engine==oracle exactness is the
    # correctness bar, tested by the gate)
    assert recall >= 0.25


def test_ann_oracle_exactness_dense_regime(spark, tmp_path):
    """Engine == DuckDB oracle for BOTH ANN retrieval queries on a fixture
    that exercises the DENSE branches (r5): 4,000 vectors -> LSH tier 2
    (margin-ranked probe order, pcnt constant 0 — NOT the gate fixture's
    sparse tier-3 popcount-first branch) and IVF nprobe 5 (the budgeted
    mid path — neither the gate's saturated C nor the production floor).
    The driver gate only ever runs the sparse/saturated branches, so
    without this test a defect in the oracle's tier/nprobe CASE arms
    would be invisible."""
    from pipe_segment_spark.queries.corpus_q import (
        O_ANN_BUCKETED_TOPK,
        O_ANN_IVF_TOPK,
        ivf_clusters_for,
        ivf_nprobe_for,
        lsh_bits_for,
        probe_tier_for,
        q_ann_bucketed_topk,
        q_ann_ivf_topk,
    )

    n = 4_000
    bits = lsh_bits_for(n)
    assert probe_tier_for(n, bits) == 2  # dense LSH branch
    assert ivf_nprobe_for(n, ivf_clusters_for(n)) == 5  # budgeted IVF path

    emb_dir = str(tmp_path / "embeddings.parquet")
    spark.range(n).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 7).cast("int").alias("label"),
        F.expr(
            "transform(sequence(1, 64), i -> "
            "cast((cast(conv(substring(md5(concat(cast(id as string), ':', "
            "cast(i as string))), 1, 8), 16, 10) as double) / 4294967295.0 "
            "- 0.5) as float))"
        ).alias("embedding"),
    ).coalesce(2).write.parquet(emb_dir)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{emb_dir}/*.parquet'")
    for q_fn, o_sql, name in (
        (q_ann_bucketed_topk, O_ANN_BUCKETED_TOPK, "bucketed"),
        (q_ann_ivf_topk, O_ANN_IVF_TOPK, "ivf"),
    ):
        spark_rows = sorted(
            (r["q_id"], r["c_id"], r["c_label"], r["cos"], r["rank"])
            for r in q_fn(spark, str(tmp_path)).collect()
        )
        duck_rows = sorted(tuple(r) for r in con.sql(o_sql).fetchall())
        assert len(spark_rows) == len(duck_rows), name
        assert spark_rows == duck_rows, name


def _mk_embeddings(spark, path: str, n: int):
    """Deterministic md5-derived embedding table (same recipe as the dense
    regime fixture)."""
    spark.range(n).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 7).cast("int").alias("label"),
        F.expr(
            "transform(sequence(1, 64), i -> "
            "cast((cast(conv(substring(md5(concat(cast(id as string), ':', "
            "cast(i as string))), 1, 8), 16, 10) as double) / 4294967295.0 "
            "- 0.5) as float))"
        ).alias("embedding"),
    ).coalesce(2).write.parquet(path)


def test_ivf_training_regimes_bit_identical(spark, tmp_path, monkeypatch):
    """r6 regime switch: the single-row higher-order-fold training
    (C <= IVF_LOCAL_TRAIN_MAX_C) and the distributed Lloyd plan must
    produce BIT-IDENTICAL retrieval output on the same table — the switch
    is a physical-plan choice, never a semantic one. Forces both branches
    on one 4,000-vector fixture (C = 16) by patching the threshold."""
    from pipe_segment_spark.queries import corpus_q as cq

    emb_dir = str(tmp_path / "embeddings.parquet")
    _mk_embeddings(spark, emb_dir, 4_000)
    assert cq.ivf_clusters_for(4_000) <= cq.IVF_LOCAL_TRAIN_MAX_C

    def run():
        return sorted(
            (r["q_id"], r["c_id"], r["c_label"], r["cos"], r["rank"])
            for r in cq.q_ann_ivf_topk(spark, str(tmp_path)).collect()
        )

    local_rows = run()
    monkeypatch.setattr(cq, "IVF_LOCAL_TRAIN_MAX_C", 0)  # force distributed
    dist_rows = run()
    assert local_rows == dist_rows
    assert len(local_rows) > 0


def test_ivf_oracle_exactness_distributed_training_regime(spark, tmp_path):
    """Engine == DuckDB oracle for IVF on a fixture whose C exceeds
    IVF_LOCAL_TRAIN_MAX_C (20,000 vectors -> C = 128), i.e. the
    DISTRIBUTED training branch — every other oracle fixture (gate tables,
    dense-regime test) lands in the single-row regime, so without this the
    distributed branch would be oracle-unpinned after the r6 switch."""
    from pipe_segment_spark.queries.corpus_q import (
        IVF_LOCAL_TRAIN_MAX_C,
        O_ANN_IVF_TOPK,
        ivf_clusters_for,
        q_ann_ivf_topk,
    )

    n = 20_000
    assert ivf_clusters_for(n) > IVF_LOCAL_TRAIN_MAX_C
    emb_dir = str(tmp_path / "embeddings.parquet")
    _mk_embeddings(spark, emb_dir, n)

    spark_rows = sorted(
        (r["q_id"], r["c_id"], r["c_label"], r["cos"], r["rank"])
        for r in q_ann_ivf_topk(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{emb_dir}/*.parquet'")
    duck_rows = sorted(tuple(r) for r in con.sql(O_ANN_IVF_TOPK).fetchall())
    assert len(spark_rows) == len(duck_rows)
    assert spark_rows == duck_rows
