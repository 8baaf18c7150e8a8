"""Structural invariants for the round-4 late-batch operators
(batches 125-144) — properties that must hold on ANY input, checked
on the fixture beyond the oracle's value-equality gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkastreamer_spark.registry import REGISTRY, _ensure_loaded
from kafkastreamer_spark.tables import load_table

_ensure_loaded()


def _run(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


def test_survival_risk_set_accounting(spark, sf_dir):
    """n_risk is strictly decreasing in t, starts at the order count,
    and every order leaves the risk set exactly once (sum of events
    plus censorings equals the cohort)."""
    rows = _run("orders_survival_nelson_aalen", spark, sf_dir).collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert rows[0]["n_risk"] == n_orders
    assert sum(r["d_events"] + r["c_censored"] for r in rows) == n_orders
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_risk"] == prev["n_risk"] - (
            prev["d_events"] + prev["c_censored"]
        )
        assert cur["cumhaz_fp8"] >= prev["cumhaz_fp8"]


def test_er_clusters_partition_the_records(spark, sf_dir):
    """Entity clusters are a PARTITION of part records: sizes sum to
    the table count and every entity id is one of its member names."""
    rows = _run("er_part_entity_clusters", spark, sf_dir).collect()
    n_parts = load_table(spark, sf_dir, "part").count()
    assert sum(r["n_records"] for r in rows) == n_parts
    names = {
        r["p_name"]
        for r in load_table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .collect()
    }
    assert all(r["entity"] in names for r in rows)
    assert sum(r["n_names"] for r in rows) == len(names)


def test_auc_is_a_probability(spark, sf_dir):
    """AUC lands in [0, 1] fixed point and both classes are populated
    (the fixture guarantee the label redesign bought)."""
    r = _run("ml_click_purchase_auc", spark, sf_dir).collect()[0]
    assert r["n_pos"] > 0 and r["n_neg"] > 0
    assert 0 <= r["auc_fp8"] <= 100_000_000
    assert 0 <= r["brier_fp6"] <= 1_000_000


def test_t_closeness_tv_bounds(spark, sf_dir):
    """Total-variation distance is in [0, 1] fixed point for every
    quasi-identifier group, and group sizes sum to the joined total."""
    rows = _run("governance_t_closeness_audit", spark, sf_dir).collect()
    assert rows, "no QI groups"
    for r in rows:
        assert 0 <= r["tv_fp6"] <= 1_000_000
        assert (r["t02_status"] == "violates") == (r["tv_fp6"] > 200_000)


def test_gsp_support_dominance(spark, sf_dir):
    """Gapped support can never exceed the user count, and every
    contiguous-trigram path's support is <= the same pattern's gapped
    support (a contiguous occurrence IS a gapped occurrence)."""
    gapped = {
        r["pattern"]: r["support_users"]
        for r in _run("seq_pattern_gsp_support", spark, sf_dir).collect()
    }
    n_users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert all(0 < s <= n_users for s in gapped.values())
    # users containing contiguous trigram t1>t2>t3 (distinct users)
    contig = (
        load_table(spark, sf_dir, "events")
        .withColumn(
            "nxt",
            F.lead("event_type").over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
            ),
        )
        .withColumn(
            "nxt2",
            F.lead("event_type", 2).over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
            ),
        )
        .filter(F.col("nxt2").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "nxt", "nxt2").alias("pattern"),
            "user_id",
        )
        .distinct()
        .groupBy("pattern")
        .count()
        .collect()
    )
    for r in contig:
        assert gapped.get(r["pattern"], 0) >= r["count"], r["pattern"]


def test_leakage_safe_split_has_zero_cluster_leaks(spark, sf_dir):
    rows = _run("split_leakage_safe", spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in rows) == load_table(
        spark, sf_dir, "documents"
    ).count()
    assert all(r["leaky_by_cluster_hash"] == 0 for r in rows)


def test_kcore_ladder_monotone(spark, sf_dir):
    r = _run("graph_kcore_peel", spark, sf_dir).collect()[0]
    ladder = [r["n_nodes"], r["n_round1"], r["n_round2"], r["n_round3"]]
    assert ladder == sorted(ladder, reverse=True)
    assert r["n_parts_in_core"] + r["n_suppliers_in_core"] == r["n_round3"]


def test_pvm_bridge_reconciles(spark, sf_dir):
    """The five effects plus the reported rounding gap reconstruct the
    revenue delta EXACTLY (the gap column is the honesty valve), and
    the gap itself stays below 0.1% of base revenue."""
    r = _run("lineitem_price_volume_mix", spark, sf_dir).collect()[0]
    total = (
        r["price_eff"]
        + r["volume_eff"]
        + r["mix_eff"]
        + r["new_eff"]
        + r["lost_eff"]
        + r["rounding_gap_fp"]
    )
    assert total == r["delta_fp"]
    assert abs(r["rounding_gap_fp"]) < r["rev0_fp"] // 1000


def test_conformal_threshold_validity(spark, sf_dir):
    """The held-out exceed rate respects the conformal direction —
    but the finite-sample guarantee only binds once the calibration
    fold is big enough (needs n_cal >= 1/alpha - 1 just for the
    quantile to exist; the rate check below waits for n_cal >= 50, so
    it engages at sf0.01+ and skips the 15-user sf0.001 fixture)."""
    r = _run("ml_conformal_threshold", spark, sf_dir).collect()[0]
    assert r["n_cal"] > 0 and r["n_eval"] > 0
    assert r["n_eval_exceed"] <= r["n_eval"]
    if r["n_cal"] >= 50:
        assert r["exceed_pct4"] <= 3000  # 0.30 ceiling vs alpha=0.10


def test_percentile_by_source_is_uniform(spark, sf_dir):
    """Within each source the percentile column is a permutation of
    the uniform grid — rank k of n maps to (k-1)*1e4 div (n-1)."""
    rows = _run(
        "quality_length_percentile_by_source", spark, sf_dir
    ).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        n = rs[0]["n_in_source"]
        assert len(rs) == n
        got = sorted(r["pctile_fp4"] for r in rs)
        want = sorted((10000 * (k - 1)) // (n - 1) for k in range(1, n + 1))
        assert got == want, src


def test_growth_accounting_identity(spark, sf_dir):
    for r in _run("events_growth_accounting", spark, sf_dir).collect():
        assert r["mau"] == r["n_new"] + r["n_retained"] + r["n_resurrected"]
        assert r["n_churned"] >= 0 or r["mau"] == r["n_new"]


def test_borda_total_is_conserved(spark, sf_dir):
    """Borda points are zero-sum across the field: the column sums of
    three row_number ballots are fixed, so the score total must equal
    3n^2 - 3n(n+1)/2 regardless of the data."""
    rows = _run("supplier_borda_scorecard", spark, sf_dir).collect()
    n = len(rows)
    assert sum(r["borda_score"] for r in rows) == 3 * n * n - 3 * n * (
        n + 1
    ) // 2


def test_trade_balance_antisymmetry(spark, sf_dir):
    rows = _run("nation_trade_balance_matrix", spark, sf_dir).collect()
    net = {(r["supp_nation"], r["cust_nation"]): r["net_export_fp"] for r in rows}
    for (a, b), v in net.items():
        if (b, a) in net:
            assert net[(b, a)] == -v, (a, b)


def test_qte_quantiles_monotone(spark, sf_dir):
    rows = _run("orders_quantile_treatment_effect", spark, sf_dir).collect()
    qs = sorted(rows, key=lambda r: r["q"])
    for prev, cur in zip(qs, qs[1:]):
        assert cur["treat_fp"] >= prev["treat_fp"]
        assert cur["control_fp"] >= prev["control_fp"]


def test_bootstrap_ci_ordered(spark, sf_dir):
    r = _run("events_bootstrap_mean_ci", spark, sf_dir).collect()[0]
    assert r["n_replicates"] == 100
    assert r["lo_fp"] <= r["hi_fp"]
    assert r["lo_fp"] <= r["point_fp"] <= r["hi_fp"]


def test_fertility_en_premium_zero(spark, sf_dir):
    rows = _run("text_tokenizer_fertility_by_lang", spark, sf_dir).collect()
    en = [r for r in rows if r["lang"] == "en"]
    assert en and en[0]["premium_vs_en_fp4"] == 0


def test_spatial_knn_positive_distances(spark, sf_dir):
    rows = _run("join_spatial_grid_knn", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["nn_dist2"] >= 0
        assert r["nn_id"] != r["vec_id"]


def test_haar_block_counts_halve(spark, sf_dir):
    rows = {r["level"]: r for r in
            _run("events_haar_wavelet_energy", spark, sf_dir).collect()}
    assert rows[1]["n_blocks"] >= rows[2]["n_blocks"] >= rows[3]["n_blocks"]
    assert all(r["detail_energy"] >= 0 for r in rows.values())


def test_attribution_conserves_revenue(spark, sf_dir):
    """Credited value across channels plus direct equals total
    purchase revenue EXACTLY — the integer remainder rule means no
    fixed-point unit is ever created or lost."""
    rows = _run("events_multitouch_attribution", spark, sf_dir).collect()
    total_credited = sum(r["credited_fp"] for r in rows)
    want = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(
            F.sum(F.floor(F.col("value") * 10000).cast("long")).alias("t")
        )
        .collect()[0]["t"]
    )
    assert total_credited == (want or 0)


def test_skyline_is_mutually_nondominated(spark, sf_dir):
    """No frontier point strictly dominates another frontier point
    (higher price AND lower ship gap)."""
    pts = [
        (r["price_fp"], r["ship_days"])
        for r in _run("orders_pareto_skyline", spark, sf_dir).collect()
    ]
    for x1, y1 in pts:
        for x2, y2 in pts:
            assert not (x2 > x1 and y2 < y1), ((x1, y1), (x2, y2))


def test_demand_classification_covers_all_parts(spark, sf_dir):
    rows = _run("lineitem_demand_classification", spark, sf_dir).collect()
    n_parts_with_sales = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert len(rows) == n_parts_with_sales
    assert {r["demand_class"] for r in rows} <= {
        "smooth", "erratic", "intermittent", "lumpy",
    }


def test_waterfall_matches_capstone_survivors(spark, sf_dir):
    """The waterfall's final stage count equals the corpus-prep
    capstone's total surviving documents — the two views of the same
    chain can never disagree."""
    wf = {
        r["stage_name"]: r["n_out"]
        for r in _run("pipeline_corpus_prep_waterfall", spark, sf_dir).collect()
    }
    final = sum(
        r["n_docs"]
        for r in _run("pipeline_corpus_prep", spark, sf_dir).collect()
    )
    assert wf["temperature_mix"] == final
    order = ["input", "repetition_filter", "exact_dedup",
             "source_cap", "temperature_mix"]
    counts = [wf[s] for s in order]
    assert counts == sorted(counts, reverse=True)


def test_isotropy_identity_matches_bruteforce_pairs(spark, sf_dir):
    """Oracle-independent truth check for embedding_isotropy_audit:
    the oracle mirrors the same ||sum q||^2 identity, so a shared
    formula bug would pass the hash compare. Here the per-label mean
    pairwise cosine is recomputed by BRUTE-FORCE pair enumeration in
    exact integer arithmetic on the same quantized vectors, and must
    equal the one-pass result bit-for-bit."""
    from kafkastreamer_spark.queries.relational18 import _ISO_SCALE

    got = {
        r["label"]: (r["n_vecs"], r["mean_cos_fp4"])
        for r in _run("embedding_isotropy_audit", spark, sf_dir).collect()
    }
    rows = load_table(spark, sf_dir, "embeddings").collect()
    by_label: dict = {}
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        dot = sum(x * x for x in v)
        if dot <= 0:
            continue
        nrm = dot ** 0.5
        import math

        q = [math.floor(x / nrm * _ISO_SCALE) for x in v]
        by_label.setdefault(int(r["label"]), []).append(q)
    for label, qs in by_label.items():
        n = len(qs)
        if n < 2:
            assert label not in got
            continue
        s = 0
        for i in range(n):
            for j in range(n):
                if i != j:
                    s += sum(a * b for a, b in zip(qs[i], qs[j]))
        # same truncate-toward-zero quotient as both engines
        num = 10000 * s
        den = n * (n - 1) * _ISO_SCALE * _ISO_SCALE
        want = abs(num) // den * (1 if num >= 0 else -1)
        assert got[label] == (n, want), f"label {label}"


def test_memorization_ngrams_really_repeat(spark, sf_dir):
    """Every reported n-gram must literally occur (as a whitespace
    token run) in at least n_docs distinct documents — verified by
    independent Python tokenization, not the query's own shingling."""
    rep = _run("dedup_memorization_ngram_report", spark, sf_dir).collect()
    assert rep and all(r["n_docs"] >= 2 for r in rep)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    import re as _re

    grams_by_doc = []
    for d in docs:
        w = _re.split(r"\s+", d["text"].lower())
        grams_by_doc.append(
            (d["doc_id"], {" ".join(w[i : i + 8]) for i in range(len(w) - 7)})
        )
    for r in rep[:10]:  # spot-check the top 10
        holders = [doc_id for doc_id, g in grams_by_doc if r["ngram"] in g]
        assert len(holders) == r["n_docs"], r["ngram"]
        assert min(holders) == r["rep_doc"]


def test_epoch_schedule_allocates_within_budget(spark, sf_dir):
    """The per-source targets must sum to <= the budget (floor
    division never over-allocates) and cover >= 99.9% of it, and a
    source's epoch factor must exceed 1.0 exactly when its target
    exceeds its availability."""
    from kafkastreamer_spark.queries.relational18 import _MIX_BUDGET

    rows = _run("sample_epoch_mixture_schedule", spark, sf_dir).collect()
    total = sum(r["target_tokens"] for r in rows)
    assert total <= _MIX_BUDGET
    assert total >= _MIX_BUDGET * 0.999
    for r in rows:
        assert (r["epochs_fp4"] > 10000) == (r["target_tokens"] > r["n_tokens"])
