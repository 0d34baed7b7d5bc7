"""Physical-plan regression tests: the scale-critical plan shapes asserted
by SCALE.md must survive refactors. Each test inspects the executed/compiled
plan string rather than timing (stable under CI load)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def events(spark):
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_segment_dedup_boilerplate_broadcasts(docs):
    from quackosm_spark.operators.dedup import remove_frequent_segments

    plan = _plan(remove_frequent_segments(docs, seg_words=3, min_docs=3))
    # r11 shape: the boilerplate set broadcasts as a LEFT join that FLAGS
    # segments (dropped inside the reassembly agg) — one corpus scan fewer
    # than the old LeftAnti + re-attach formulation, and still no shuffle
    # of the corpus beyond the count + reassembly exchanges.
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan
    # the old third-scan re-attach join (corpus left-join reassembled) is gone:
    # only the flag join remains, so exactly one join node in the whole plan
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan


def test_segment_first_dedup_single_scan_no_join(docs):
    from quackosm_spark.operators.dedup import drop_duplicate_segments

    plan = _plan(drop_duplicate_segments(docs, seg_words=3))
    # r11 shape: ONE corpus scan, segment window + reassembly groupBy —
    # later copies die inside the aggregate, no re-attach join
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 2


def test_substring_dedup_single_attach_join(docs):
    from quackosm_spark.operators.dedup import remove_repeated_substrings

    plan = _plan(remove_repeated_substrings(docs, window=8))
    # r11 shape: the covered-position flag join is the ONLY join; the old
    # ids.distinct re-attach (third corpus scan) is gone
    assert plan.count("Join") == 1
    assert plan.count("Scan parquet") == 2


def test_latest_by_key_partial_aggregates_before_exchange(events):
    from quackosm_spark.operators.temporal import latest_by_key

    plan = _plan(latest_by_key(events.select("event_id", "user_id", "ts", "value"),
                               ["user_id"], ["ts", "event_id"]))
    # partial max_by must appear (map-side combine), and only once shuffled
    assert "partial_max_by" in plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_asof_join_single_exchange_no_join_node(events):
    from quackosm_spark.operators.temporal import asof_join

    ev = events.select("event_id", "user_id", "ts", "value")
    out = asof_join(ev, ev, on="user_id", left_ts="ts", right_ts="ts",
                    value_cols={"value": "prev_value"}, strict=True)
    plan = _plan(out)
    assert "Join" not in plan  # union+window formulation: no join operator
    assert plan.count("Exchange hashpartitioning") == 1


def test_deterministic_sample_is_scan_stage_filter(docs):
    from quackosm_spark.operators.mix import deterministic_sample

    plan = _plan(deterministic_sample(docs, rates={"en": 0.5}, default_rate=0.1))
    assert "Exchange" not in plan  # pure predicate: zero shuffles


def test_bm25_scoring_has_no_explode_or_join(docs):
    from quackosm_spark.operators.search import bm25_scores

    plan = _plan(bm25_scores(docs, ["spark", "window"]))
    assert "Generate explode" not in plan and "Join" not in plan


def test_contamination_benchmark_side_broadcasts(docs):
    from quackosm_spark.operators.dedup import contamination_matches

    benchmark = docs.where(F.col("doc_id") % 97 == 0)
    train = docs.where(F.col("doc_id") % 97 != 0)
    plan = _plan(contamination_matches(train, benchmark, n=3))
    assert "BroadcastHashJoin" in plan


def test_bucketed_join_has_zero_exchanges(spark, tmp_path):
    """The write-once-shuffle-never pattern: two tables bucketed on the
    join key sort-merge-join with NO Exchange in the executed plan."""
    from quackosm_spark.sinks.bucketed import read_bucketed, write_bucketed

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        write_bucketed(o, "t_orders_bucketed", "o_orderkey", buckets=8)
        write_bucketed(li, "t_lineitem_bucketed", "l_orderkey", buckets=8)
        a = read_bucketed(spark, "t_orders_bucketed")
        b = read_bucketed(spark, "t_lineitem_bucketed")
        j = a.join(b, a.o_orderkey == b.l_orderkey).select(
            "o_orderkey", "l_quantity"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert plan.count("Exchange") == 0          # the whole point
        assert "Bucketed: true" in plan
        assert j.count() == li.count()              # inner join, FK complete
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_bucketed")


def test_zorder_write_shrinks_per_file_value_ranges(spark, tmp_path):
    """Z-order clustering: every output file covers a small tile of the
    (user_id, value) domain, so footer min-max stats prune range queries
    on EITHER column; an unclustered write spans ~the full domain per file."""
    import pyarrow.parquet as pq
    from quackosm_spark.sinks.cluster import cluster_write

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "user_id", "value"
    )
    plain_dir, z_dir = str(tmp_path / "plain"), str(tmp_path / "zorder")
    ev.repartition(8).write.parquet(plain_dir)
    cluster_write(ev, z_dir, ["user_id", "value"], num_files=8)

    def avg_span(d, col):
        import glob
        spans, glo, ghi = [], None, None
        for f in sorted(glob.glob(d + "/part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            mns = [md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups)]
            mxs = [md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups)]
            lo, hi = min(mns), max(mxs)
            spans.append(hi - lo)
            glo = lo if glo is None else min(glo, lo)
            ghi = hi if ghi is None else max(ghi, hi)
        return sum(spans) / len(spans) / ((ghi - glo) or 1)

    for col in ("user_id", "value"):
        plain_frac = avg_span(plain_dir, col)
        z_frac = avg_span(z_dir, col)
        assert plain_frac > 0.6          # unclustered: files span most of the domain
        assert z_frac < 0.55             # z-ordered: tiles (both dims shrink)
        assert z_frac < plain_frac * 0.75
    # data intact
    assert spark.read.parquet(z_dir).count() == ev.count()


def test_slippy_tiles_stay_in_codegen(events):
    """q85's tile/quadkey assignment must be a scan-stage projection: no
    UDFs (BatchEvalPython/ArrowEvalPython), no Exchange, one codegen span."""
    from quackosm_spark.geometry import tiles

    pts = events.select(
        "event_id",
        ((F.col("value") % 180.0) - 90.0).alias("lat"),
        (((F.col("event_id") / 17) % 3600) / 10.0 - 180.0).alias("lon"),
    )
    df = pts.select(
        tiles.tile_x(F.col("lon"), 8).alias("x"),
        tiles.tile_y(F.col("lat"), 8).alias("y"),
        tiles.quadkey(F.col("lon"), F.col("lat"), 8).alias("qk"),
    )
    plan = _plan(df)
    assert "EvalPython" not in plan          # no Python UDF boundary
    assert "Exchange" not in plan            # map-only
    # `*(1) Project` = inside WholeStageCodegen span 1
    assert plan.lstrip().startswith("*(1)")


def test_makevalid_repair_is_map_only(events):
    """q83's repair kernel is an Arrow-batched projection: exactly one
    Python boundary, no shuffle introduced by the geometry work."""
    import __spark_entry__ as E

    df = E.q83_makevalid(events.sparkSession, SF_DIR)
    plan = _plan(df)
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") == 1


def test_ngram_jaccard_guarded_pins_candidate_parallelism(docs):
    """The max_df guarded path must show (a) the hot-shingle broadcast and
    (b) a user-pinned round-robin/hash repartition on the candidate index
    (the AQE fan-out lesson, SCALE.md §7b)."""
    from quackosm_spark.operators.dedup import ngram_jaccard_pairs

    plan = _plan(ngram_jaccard_pairs(docs, threshold=0.3, max_df=50))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "REPARTITION_BY_NUM" in plan or "hashpartitioning" in plan


def test_interleave_sources_window_is_bucketed_not_per_source(docs):
    """r06: the per-source rn must come from a (source, md5-bucket)
    window + collected offsets — a window partitioned by source ALONE
    serializes a 20 TB source through one task's sort."""
    import re

    from quackosm_spark.operators.mix import interleave_sources

    plan = _plan(interleave_sources(docs))
    assert re.search(r"windowspecdefinition\(source#\d+, _bkt#\d+", plan)
    assert not re.search(r"windowspecdefinition\(source#\d+, _ok", plan)
    assert "global=true" not in plan  # no global sort anywhere


def test_assign_token_shards_no_global_sort(docs):
    """r03: the shard manifest's running sum must be the two-pass parallel
    prefix sum — one hash exchange on the range bucket and a PARTITIONED
    window; a global (global=true) Sort would serialize the corpus."""
    from quackosm_spark.operators.mix import assign_token_shards

    plan = assign_token_shards(
        docs, target_tokens=1000
    )._jdf.queryExecution().executedPlan().toString()
    assert "global=true" not in plan
    assert "windowspecdefinition(_bucket" in plan


def test_gopher_rules_is_map_only(docs):
    from quackosm_spark.operators.text import gopher_rules

    plan = _plan(gopher_rules(docs))
    assert "Exchange" not in plan  # the whole battery is one scan stage


def test_gopher_passes_filter_is_scan_stage(docs):
    from quackosm_spark.operators.text import gopher_passes

    plan = _plan(docs.where(gopher_passes("text", min_words=5)))
    assert "Exchange" not in plan
    assert "Filter" in plan


def test_dsir_weight_join_broadcasts_bucket_table(docs):
    from quackosm_spark.operators.text import dsir_logweights

    plan = _plan(dsir_logweights(docs, target_source="src0", buckets=512))
    # the ≤512-row logratio table must broadcast; the only hash exchange
    # left is the per-doc aggregation
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_dedup_keep_best_window_partitions_by_cluster(docs):
    from quackosm_spark.operators.dedup import dedup_keep_best

    plan = _plan(dedup_keep_best(docs.where(F.col("doc_id") % 5 == 0)))
    assert "Window" in plan
    # the retention window shuffles BY CLUSTER (local sort within
    # partitions), never through a single-partition global sort
    assert "hashpartitioning(cluster_id" in plan
    assert "rangepartitioning" not in plan


def test_ridge_suffstats_single_tiny_exchange(docs):
    """The Gram-sum aggregate must partial-combine map-side and move ONE
    1-row partial per partition through a single Exchange — never the
    corpus (SCALE.md sufficient-statistics ML note). Asserted on the
    EXACT aggregate the fitters execute (ml.suffstats_agg)."""
    from pyspark.sql import functions as F
    from quackosm_spark.operators.ml import suffstats_agg

    feats = docs.select(
        F.col("n_chars").cast("double").alias("x1"),
        F.length("text").cast("double").alias("x2"),
        F.size(F.split("text", " ")).cast("double").alias("y"),
    )
    plan = _plan(suffstats_agg(feats, ["x1", "x2"], "y"))
    assert "partial_sum" in plan
    assert plan.count("Exchange") == 1 and "SinglePartition" in plan
    assert "Sort" not in plan and "Window" not in plan


def test_groupwise_fit_one_grouped_exchange_no_window(docs):
    from pyspark.sql import functions as F
    from quackosm_spark.operators.ml import groupwise_linear_fit

    feats = docs.select(
        "source",
        F.col("n_chars").alias("x"),
        F.size(F.split("text", " ")).alias("y"),
    )
    plan = _plan(groupwise_linear_fit(feats, "source", "x", "y"))
    assert "partial_sum" in plan  # map-side combine of the 5 sums
    assert plan.count("Exchange hashpartitioning(source") == 1
    assert "Window" not in plan and "SortMergeJoin" not in plan


def test_binary_auc_window_runs_over_distinct_scores_only(docs):
    """CONTINUOUS-score strategy (forced via threshold=0): the ordered
    cumulative window must sit ABOVE the distinct-score aggregation
    (corpus collapses first) AND be PARTITIONED by the range bucket
    (two-pass prefix sum) — an unpartitioned Window.orderBy serializes a
    continuous-score table through one task."""
    from pyspark.sql import functions as F
    from quackosm_spark.operators.ml import binary_auc

    scored = docs.select(
        (F.col("n_chars") % 17).cast("double").alias("score"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    plan = _plan(binary_auc(scored, "score", "y", small_distinct_threshold=0))
    lines = plan.splitlines()
    win = next(i for i, l in enumerate(lines) if "Window" in l)
    # the grouped aggregate (keyed on score) appears BELOW the window
    grouped = [
        i for i, l in enumerate(lines)
        if "HashAggregate" in l and "keys=[" in l and "score" in l
    ]
    assert grouped and min(grouped) > win  # deeper in the tree = later line
    import re

    assert re.search(r"windowspecdefinition\(_bkt#\d+, score#\d+", plan)
    assert not re.search(r"windowspecdefinition\(score#\d+ ASC", plan)
    # score groupBy + bucket repartition + single-partition final agg;
    # the bucket-offset table rides a BroadcastExchange
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("Exchange SinglePartition") == 1


def test_binary_auc_discrete_path_windows_distinct_table_only(docs):
    """DISCRETE-score strategy (r7 runtime switch): the plain ordered
    window is allowed ONLY because it runs over the distinct-score
    aggregate (bounded by the score domain) — the plan must still show
    the corpus collapsing below the window, and no bucket machinery."""
    from pyspark.sql import functions as F
    from quackosm_spark.operators.ml import binary_auc

    scored = docs.select(
        (F.col("n_chars") % 17).cast("double").alias("score"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    plan = _plan(binary_auc(scored, "score", "y"))  # 17 distinct → fast path
    lines = plan.splitlines()
    win = next(i for i, l in enumerate(lines) if "Window" in l)
    grouped = [
        i for i, l in enumerate(lines)
        if "HashAggregate" in l and "keys=[" in l and "score" in l
    ]
    assert grouped and min(grouped) > win  # distinct-first invariant holds
    assert "_bkt" not in plan  # no bucket join/exchange on this path


def test_spatial_candidates_are_ring_free(spark, events):
    """r06: the big cell equi-join must ship (point, poly_id) candidates
    WITHOUT the K-vertex ring; the ring re-attaches at refine keyed on
    poly_id. Old shape had a Project carrying both ring and cell — no
    plan line may mention both columns anymore."""
    from pyspark.sql import functions as F
    from quackosm_spark.operators.spatial import points_in_polygons_join

    pts = events.select(
        F.col("event_id").alias("point_id"),
        (F.col("value") % 90).alias("lon"),
        (F.col("value") % 45).alias("lat"),
    )
    # data-dependent vertices — a pure-literal ring constant-folds out of
    # the plan and the assertion below would vacuously pass
    off = F.col("event_id") % 3
    ring = F.array(
        *[
            F.struct((F.lit(x) + off).alias("x"), (F.lit(y) + off).alias("y"))
            for x, y in [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
        ]
    )
    polys = events.limit(3).select(
        F.col("event_id").alias("poly_id"), ring.alias("ring")
    )
    plan = _plan(points_in_polygons_join(pts, polys, zoom=4))
    assert "ring#" in plan and "cell#" in plan
    assert not any(
        "ring#" in line and "cell#" in line for line in plan.splitlines()
    )


def test_bigram_logprob_has_no_forced_broadcast(docs):
    """r06: the per-word prefix-count table must NOT carry a broadcast
    hint — web-scale vocabularies (1e8+ distinct words) make a forced
    broadcast an executor OOM AQE cannot undo. AQE may still *choose* to
    localize the join at small scale; the contract is that nothing
    mandates it."""
    from quackosm_spark.operators.text import bigram_logprob

    out = bigram_logprob(docs)
    logical = out._jdf.queryExecution().analyzed().toString()
    # the ONLY permitted hint is the 1-row vocabulary-size scalar (_v):
    # every ResolvedHint must sit directly on a global (no-grouping-key)
    # Aggregate producing _v — never on the per-word count tables
    lines = logical.splitlines()
    for i, line in enumerate(lines):
        if "Hint" in line:
            child = lines[i + 1]
            assert "Aggregate [cast(count(distinct" in child and "_v#" in child, (
                f"unexpected broadcast hint above: {child}"
            )


def test_weighted_sample_ungrouped_is_two_phase_topk(docs):
    """r06: the ungrouped weighted sample must not funnel the corpus
    through one constant-key window partition (Catalyst's
    WindowGroupLimit rewrite does not fire for a constant partition
    key). Phase 1 is salt-partitioned and group-limited map-side; the
    only constant-key window runs over the ≤1024·k candidates."""
    import re

    from quackosm_spark.operators.mix import weighted_sample

    plan = _plan(weighted_sample(docs, k=5, weight_col="n_chars"))
    assert plan.count("WindowGroupLimit") >= 2  # partial + final on salt
    assert re.search(r"windowspecdefinition\(_salt#\d+", plan)


def test_quality_deciles_no_group_only_ranking_window(docs):
    """r07: ntile/percent_rank over Window.partitionBy(group) alone
    serializes a dominant group ("en" is half of most web corpora) through
    one task's sort. The rank must come from a (group, quality-bucket)
    window + aggregated offsets; ntile/percent_rank become arithmetic."""
    import re

    from quackosm_spark.operators.stats import quality_deciles

    plan = _plan(quality_deciles(docs))
    assert "ntile(" not in plan and "percent_rank(" not in plan
    # the only window ordered by the quality score is bucket-partitioned
    assert re.search(r"windowspecdefinition\(lang#\d+, _bkt#\d+, quality#\d+", plan)
    assert not re.search(r"windowspecdefinition\(lang#\d+, quality#\d+", plan)
    assert "global=true" not in plan


def test_winsorize_no_exact_percentile_aggregate(events):
    """r07: F.percentile buffers every distinct group value in one merging
    task — on a raw continuous column that is the moral equivalent of
    collecting the column. The bounds must come from the bucketed two-pass
    order-statistic kernel instead."""
    import re

    from quackosm_spark.operators.stats import winsorize

    plan = _plan(winsorize(events, "value", "event_type"))
    assert "percentile(" not in plan
    # any window ordered by the raw value is partitioned by the range bucket
    for m in re.finditer(r"windowspecdefinition\(([^)]*)__val#\d+ ASC", plan):
        assert "_bkt#" in m.group(1)
    assert "global=true" not in plan


def test_exact_quantiles_no_exact_percentile_aggregate(events):
    """r07: same property for temporal.exact_quantiles (q45 runs it on raw
    continuous event values)."""
    import re

    from quackosm_spark.operators.temporal import exact_quantiles

    plan = _plan(exact_quantiles(events, "value", ["event_type"], [0.25, 0.5, 0.95]))
    assert "percentile(" not in plan
    for m in re.finditer(r"windowspecdefinition\(([^)]*)__val#\d+ ASC", plan):
        assert "_bkt#" in m.group(1)
    assert "global=true" not in plan


def test_ivf_index_probe_scan_is_dynamically_pruned(spark, tmp_path):
    """r09: matching against a cell-partitioned persisted ivf_index must
    read ONLY the probed cells — Spark's dynamic partition pruning
    attaches a dynamicpruning subquery to the scan's PartitionFilters
    (the probe keys come from a join, so a static filter can't express
    it). This is the property that makes the index an INDEX at 100 TB:
    nprobe/num_cells of the history is scanned, not all of it."""
    import numpy as np

    from quackosm_spark.operators import similarity as S

    rng = np.random.RandomState(5)
    pts = rng.randn(200, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in p]) for i, p in enumerate(pts)],
        "vec_id: long, embedding: array<double>",
    )
    cents = S.train_ivf_centroids(df, num_cells=8)
    p = str(tmp_path / "ivfidx")
    S.ivf_index(df, cents).write.partitionBy("cell").parquet(p)
    idx = spark.read.parquet(p)
    out = S.match_against_ivf_index(
        df.where("vec_id = 3"), idx, cents, k=3, nprobe=2
    )
    plan = _plan(out)
    # locations are abbreviated in toString(), so key on the scan whose
    # PartitionFilters mention the cell column
    scan = [
        ln for ln in plan.splitlines()
        if "FileScan parquet" in ln and "PartitionFilters" in ln
        and "cell#" in ln
    ]
    assert scan and "dynamicpruning" in scan[0]


def test_pagerank_round_reuses_cached_edge_partitioning(spark):
    """r12 shape (VERDICT r11 #3): the per-round PageRank plan must not
    re-exchange the edge table. contrib_edges (edges pre-joined with
    outdeg, loop-invariant) is persisted hash-partitioned on the join key
    src, so under the at-scale join strategy (broadcast disabled) the
    round's ONLY row-data Exchange is the hashpartitioning(dst)
    contribution aggregate; the dangling mass is an in-plan broadcast
    1-row aggregate, not a driver collect."""
    from pyspark import StorageLevel

    from quackosm_spark.operators.graph import _pagerank_round

    e = (
        spark.range(400)
        .selectExpr(
            "concat('n', id % 40) AS src", "concat('n', (id * 7) % 40) AS dst"
        )
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.selectExpr("src AS node")
        .union(e.selectExpr("dst AS node"))
        .distinct()
        .repartition("node")
        .sortWithinPartitions("node")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("deg")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    contrib = (
        e.join(outdeg.withColumnRenamed("node", "src"), "src")
        .select("src", "dst", "deg")
        .repartition("src")
        .sortWithinPartitions("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    contrib.count()
    pr = nodes.withColumn("pr", F.lit(1.0 / n)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    pr.count()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
        plan = _plan(_pagerank_round(nodes, contrib, outdeg, pr, n, 0.85))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # strip the cached setup lineage printed under InMemoryRelation: the
    # round's own operators are the ':'-chained top tree (indent < 30);
    # nested lineage re-prints start much deeper
    tree = "\n".join(
        ln
        for ln in plan.splitlines()
        if (":" in ln[:30] and ln.startswith((":", "+", " ")))
        or ln.startswith(("Adaptive", "Project", "+-", "Broadcast"))
    )
    # the dangling mass rides the plan as a broadcast cross join
    assert "BroadcastNestedLoopJoin" in plan
    # exactly ONE hashpartitioning Exchange in the round's own tree (the
    # dst contribution aggregate); the edges/contrib side and the rank
    # table read their cached partitioning with no Exchange
    round_exchanges = [
        ln for ln in tree.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(round_exchanges) == 1, round_exchanges
    assert "hashpartitioning(dst" in round_exchanges[0]
    # the cached tables' ordering is preserved too (r12): the only Sort in
    # the round tree is the O(V) aggregated-inflow side of the nodes join —
    # the O(E) contrib side and the rank table read from cache unsorted
    round_sorts = [ln for ln in tree.splitlines() if ln.lstrip(" :+-").startswith("Sort ") or "+- Sort " in ln]
    assert len(round_sorts) <= 1, round_sorts
