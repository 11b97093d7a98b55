"""Round-6 additions: IVF-gated late-interaction retrieval and the
environment-skew canaries."""

from audience_manager_platform_spark.operators import envprobe as E
from audience_manager_platform_spark.operators.hybrid import (
    chunk_maxsim_ivf_topk,
    chunk_maxsim_topk,
)
from audience_manager_platform_spark.sources import load_table


def test_chunk_maxsim_ivf_subset_of_exact(spark, sf_dir):
    """Cell gating loses chunks, never invents or re-scores them: every
    (query, doc) the gated path returns must appear in the exact scan's
    pooled table with a maxsim >= the gated maxsim (equality whenever
    the best chunk's cell was probed), and best_chunk_idx must be a
    chunk the exact path scored for that pair."""
    docs = load_table(spark, sf_dir, "documents")
    qids = [0, 100, 200]
    exact = {
        (r.query_id, r.doc_id): r.maxsim
        for r in chunk_maxsim_topk(docs, qids, k=10**6).collect()
    }
    gated = chunk_maxsim_ivf_topk(docs, qids, k=5).collect()
    assert gated, "gated path returned nothing"
    for r in gated:
        assert r.doc_id != r.query_id
        assert (r.query_id, r.doc_id) in exact
        assert r.maxsim <= exact[(r.query_id, r.doc_id)]
    # the gate must actually bite at default settings (4/16 cells):
    # at least one query's top-1 differs OR every returned score equals
    # exact — either way the result is well-formed top-k per query
    by_q = {}
    for r in gated:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_chunk_maxsim_ivf_partition_invariant(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    key = lambda rows: sorted(  # noqa: E731
        (r.query_id, r.rank, r.doc_id, r.maxsim) for r in rows
    )
    a = key(chunk_maxsim_ivf_topk(docs.repartition(1), [0, 100], k=3).collect())
    b = key(chunk_maxsim_ivf_topk(docs.repartition(7), [0, 100], k=3).collect())
    assert a == b
    assert a, "empty result"


def test_env_probe_vector_is_boundary_heavy():
    """The canary vector must keep its adversarial cases: exact .5
    boundaries after the 1e6 scaling and the r4 repro magnitude."""
    import math

    vals = dict(E.PROBE_VECTOR)
    # exact representable .5 boundaries (multiply is exact for these)
    assert vals["c02_half_ulp_small"] * 1e6 == 0.5
    assert vals["c03_one_and_half"] * 1e6 == 1.5
    # r4 magnitude class present with both signs
    assert vals["c08_r4_repro_pos"] == -vals["c09_r4_repro_neg"]
    assert abs(vals["c08_r4_repro_pos"] * 1e6) > 1e12
    # floor-micro stays within int64 for every probe value
    for _, v in E.PROBE_VECTOR:
        assert abs(math.floor(v * 1e6 + 0.5)) < 2**53


def test_env_probes_match_oracles(spark, duck):
    """All four probes green against their own oracles in-process (the
    same check the driver runs)."""
    for q, sql in [
        (E.probe_floor_micro, E.probe_floor_micro_sql()),
        (E.probe_round_half, E.probe_round_half_sql()),
        (E.probe_arrow_floor, E.probe_arrow_floor_sql()),
        (E.probe_versions, E.probe_versions_sql()),
    ]:
        got = {tuple(r) for r in q(spark).collect()}
        want = {tuple(r) for r in duck.sql(sql).fetchall()}
        assert got == want, q.__name__


def test_hamming_code_matches_vector_signs(spark, sf_dir):
    """The packed BIGINT code must agree bit-for-bit with the vector's
    signs, including bit 63 (the two's-complement wrap both engines
    need as a pre-wrapped literal)."""
    from pyspark.sql import functions as F

    from audience_manager_platform_spark.operators.similarity import (
        _sign_code_expr,
        _vec_double,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    rows = (
        emb.select("vec_id", _vec_double().alias("v"))
        .select("vec_id", "v", _sign_code_expr("v").alias("code"))
        .limit(20)
        .collect()
    )
    assert rows
    for r in rows:
        expect = 0
        for i, x in enumerate(r.v):
            if x > 0:
                expect |= 1 << i
        # reinterpret as signed 64-bit (bit 63 set -> negative)
        if expect >= 1 << 63:
            expect -= 1 << 64
        assert r.code == expect, r.vec_id


def test_hamming_topk_reranks_within_shortlist(spark, sf_dir):
    """Every returned neighbor must come from the Hamming shortlist
    (subset property), carry the exact 6dp cosine, and rank densely."""
    from audience_manager_platform_spark.operators.similarity import (
        cosine_topk,
        hamming_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 1, 2]
    got = hamming_topk(emb, qids, k=5).collect()
    assert got
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in cosine_topk(emb, qids, k=10**6).collect()
    }
    by_q = {}
    for r in got:
        assert 0 <= r.hamming <= 64
        # re-rank cosine equals the exact scan's 6dp cosine for the pair
        assert r.cosine == exact[(r.query_id, r.neighbor_id)]
        by_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_hamming_topk_partition_invariant(spark, sf_dir):
    from audience_manager_platform_spark.operators.similarity import (
        hamming_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    key = lambda rows: sorted(map(tuple, rows))  # noqa: E731
    a = key(hamming_topk(emb.repartition(1), [0, 1], k=4).collect())
    b = key(hamming_topk(emb.repartition(13), [0, 1], k=4).collect())
    assert a == b and a


def test_matryoshka_recall_monotone_tail(spark, sf_dir):
    """The full-dim prefix must reproduce the exact scan (recall 1.0),
    every recall must be in [0, 1], and hits must be <= total pairs."""
    from audience_manager_platform_spark.operators.similarity import (
        EMBED_DIM,
        matryoshka_recall,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 1, 2, 3, 4]
    rows = {r.dim_prefix: r for r in matryoshka_recall(emb, qids, k=5).collect()}
    assert set(rows) == {8, 16, 32, 64}
    for m, r in rows.items():
        assert 0.0 <= r.recall_at_k <= 1.0, m
        assert 0 <= r.hits <= len(qids) * 5
    assert rows[EMBED_DIM].recall_at_k == 1.0


def test_ivf_ingest_stream_matches_batch_and_replays_idempotently(
    spark, sf_dir, tmp_path
):
    """The settled inverted-lists log must equal the one-shot batch
    assignment exactly, and re-processing the same files with a FRESH
    checkpoint (worst-case replay) must not change the log."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from audience_manager_platform_spark.operators.similarity import (
        _assign_inline,
        _vec_double,
        kmeans_fit_model,
    )
    from audience_manager_platform_spark.streaming.jobs import (
        ivf_ingest_stream,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    model = kmeans_fit_model(emb, iters=1)
    land = tmp_path / "land"
    land.mkdir()
    for i in range(3):
        emb.filter(F.col("vec_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / f"chunk{i}"))
        src = glob.glob(str(tmp_path / f"chunk{i}" / "*.parquet"))[0]
        shutil.copy(src, land / f"{i:02d}.parquet")

    def run(ckpt):
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(land))
        )
        q = ivf_ingest_stream(
            stream, model, str(tmp_path / "lists"), str(tmp_path / ckpt)
        )
        q.awaitTermination(400)
        q.stop()

    run("ckpt1")
    log = {
        (r.vec_id, r.cent_id, r.csim)
        for r in spark.read.parquet(str(tmp_path / "lists")).collect()
    }
    batch = {
        (r.vec_id, r.cent_id, r.csim)
        for r in _assign_inline(
            emb.select("vec_id", _vec_double().alias("v")), model
        )
        .select("vec_id", "cent_id", "csim")
        .collect()
    }
    assert log == batch and log
    run("ckpt2")  # full replay: fresh checkpoint re-reads every file
    log2_rows = spark.read.parquet(str(tmp_path / "lists")).collect()
    assert len(log2_rows) == len(log)
    assert {(r.vec_id, r.cent_id, r.csim) for r in log2_rows} == log


def test_chunk_maxsim_recall_bounds(spark, sf_dir):
    """Gated recall is in [0, 1] per query, and with n_probes == n_cells
    (no gating) it must be exactly 1.0 everywhere."""
    from pyspark.sql import functions as F  # noqa: F401

    from audience_manager_platform_spark.operators.hybrid import (
        MAXSIM_CELLS,
        chunk_cell_index,
        chunk_maxsim_ivf_topk,
        chunk_maxsim_recall_eval,
        chunk_maxsim_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    qids = [0, 100, 200]
    idx = chunk_cell_index(docs)
    rows = chunk_maxsim_recall_eval(docs, qids, k=3, index=idx).collect()
    assert {r.query_id for r in rows} <= set(qids)
    for r in rows:
        assert 0.0 <= r.recall_at_k <= 1.0
    # probing every cell removes the gate entirely -> exact results
    full = chunk_maxsim_ivf_topk(
        docs, qids, k=3, n_probes=MAXSIM_CELLS, index=idx
    )
    exact = chunk_maxsim_topk(docs, qids, k=3)
    key = lambda rs: sorted(  # noqa: E731
        (r.query_id, r.rank, r.doc_id, r.maxsim) for r in rs
    )
    assert key(full.collect()) == key(exact.collect())
