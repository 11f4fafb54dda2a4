"""Original IPLoM (Makanju et al.) — relational Spark re-expression.

Reference: /root/reference/loglead/parsers/iplom/IPLoM.py (driver-looped,
one Python list per partition). Steps and their Spark shapes:

  S1 (:156-201)  partition by token count            -> part_key column
  S2 (:204-262)  ONE split on the position with the  -> posexplode + groupBy
                 fewest (>1) distinct tokens            argmin + broadcast join
                 (partitions <= step2Support skip)
  S3 (:264-459)  bijection split: pick positions      -> pair-relation stats are
                 (p1,p2) by cardinality-frequency       two groupBy aggs; the
                 (DetermineP1P2 :556-673), classify     (p1,p2) choice runs on
                 each (t1,t2) token pair as 1-1 /       the collected per-part
                 1-M / M-1 / M-M, split on the side     column-cardinality table
                 chosen by Get_Rank_Posistion           (partition-count-sized,
                 (:525-554)                             like a template table)
  S4 (:461-502)  template: per position,              -> same aggregate as
                 countDistinct==1 ? token : '<*>'       PL-IPLoM

Differences from the reference, by design:
  * tokenization is the caller's token-array column (the reference re-splits
    on [\\s=:,] at :173; our enhancer chain owns tokenization);
  * the trailing line-id token the reference appends (:178) is an artifact of
    its output bookkeeping, not of the algorithm — ids here are row-intrinsic;
  * PST (partition-support outlier fold, default 0 = off in the reference
    too) folds small partitions into an 'outlier' key relationally.

The only driver-side work is DetermineP1P2 over the (part_key, pos,
n_distinct) table — O(#partitions x token_len) rows, the same order as the
template table itself, never data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pos_cardinalities(base: DataFrame, tokens_col: str) -> DataFrame:
    """(part_key, pos, d): distinct-token count per column of each partition."""
    return (
        base.select("part_key", F.posexplode(tokens_col).alias("pos", "tok"))
        .groupBy("part_key", "pos")
        .agg(F.countDistinct("tok").alias("d"))
    )


def _step2(base: DataFrame, tokens_col: str, step2_support: int) -> DataFrame:
    """One S2 round: split each partition on the lowest-cardinality column
    when that cardinality is > 1 (IPLoM.py:226-237: first position with the
    strictly smallest distinct count). Adds ``_split2`` marking split parts."""
    cards = _pos_cardinalities(base, tokens_col)
    sizes = base.groupBy("part_key").agg(F.count(F.lit(1)).alias("n"))
    split_pos = (
        cards.groupBy("part_key")
        .agg(F.min_by(F.struct("pos", "d"), F.struct("d", "pos")).alias("m"))
        .join(sizes, "part_key")
        .select(
            "part_key",
            F.when((F.col("m.d") > 1) & (F.col("n") > step2_support), F.col("m.pos")).alias("split_pos"),
        )
    )
    # unhinted part_key-sized joins throughout this miner: bounded on
    # masked logs, unbounded on degenerate corpora — AQE picks broadcast
    # at runtime when the table is actually small
    out = base.join(split_pos, "part_key", "left")
    return (
        out.withColumn("_split2", F.col("split_pos").isNotNull())
        .withColumn(
            "part_key",
            F.when(
                F.col("_split2"),
                F.concat(
                    F.col("part_key"), F.lit("|s2:"), F.element_at(F.col(tokens_col), F.col("split_pos") + 1)
                ),
            ).otherwise(F.col("part_key")),
        )
        .drop("split_pos")
    )


def _determine_p1p2(
    card_rows: list, len_by_part: dict, split2_parts: set, ct: float
) -> dict[str, tuple[int, int]]:
    """Faithful port of DetermineP1P2 + Get_Mapping_Position
    (IPLoM.py:556-673) over the collected cardinality table."""
    by_part: dict[str, dict[int, int]] = {}
    for r in card_rows:
        by_part.setdefault(r["part_key"], {})[r["pos"]] = r["d"]
    out: dict[str, tuple[int, int]] = {}
    for part, cards in by_part.items():
        n_len = len_by_part[part]
        if n_len == 2:
            out[part] = (0, 1)
            continue
        if n_len < 2:
            continue
        count_1 = sum(1 for d in cards.values() if d == 1)
        if count_1 / n_len >= ct:  # cluster goodness: already mostly constant
            continue
        # frequency of each cardinality across columns — iterate positions in
        # SORTED order: card_rows arrive in collect() order (nondeterministic),
        # and the max/second-max selection below breaks count ties by first
        # encounter, so unsorted iteration could flip p1/p2 run-to-run
        freq: dict[int, int] = {}
        for pos in sorted(cards):
            d = cards[pos]
            freq[d] = freq.get(d, 0) + 1
        p1 = p2 = -1
        if part in split2_parts:
            # from step 2: the two cardinalities (>1) with the HIGHEST column
            # frequency (IPLoM.py:596-640)
            max_card = second_card = -1
            max_cnt = second_cnt = 0
            for card, cnt in freq.items():
                if card == 1:
                    continue
                if cnt > max_cnt:
                    second_card, second_cnt = max_card, max_cnt
                    max_card, max_cnt = card, cnt
                elif cnt > second_cnt and cnt != max_cnt:
                    second_card, second_cnt = card, cnt
            if max_cnt > 1:
                for pos in range(n_len):
                    if cards[pos] == max_card:
                        if p1 == -1:
                            p1 = pos
                        else:
                            p2 = pos
                            break
            else:
                for pos in range(n_len):
                    if cards[pos] == max_card:
                        p1 = pos
                        break
                for pos in range(n_len):
                    if cards[pos] == second_card:
                        p2 = pos
                        break
        else:
            # from step 1: the cardinalities with the LOWEST column frequency
            # (IPLoM.py:642-673)
            import sys

            min_cnt = second_min_cnt = sys.maxsize
            for card, cnt in freq.items():
                if cnt < min_cnt:
                    second_min_cnt = min_cnt
                    min_cnt = cnt
                elif cnt < second_min_cnt and cnt != min_cnt:
                    second_min_cnt = cnt
            for pos in range(n_len):
                if freq[cards[pos]] == min_cnt:
                    p1 = pos
                    break
            for pos in range(n_len):
                if freq[cards[pos]] == second_min_cnt:
                    p2 = pos
                    break
        if p1 != -1 and p2 != -1:
            out[part] = (p1, p2)
    return out


def _step3(base: DataFrame, tokens_col: str, ct: float, lower: float, upper: float) -> DataFrame:
    """Bijection split. Pair-relation cardinalities (m1 = |p2 partners of a
    p1 token| etc.) come from two hash aggregations; the per-row split key is
    the reference's 1-1 / 1-M / M-1 / M-M case analysis (IPLoM.py:362-440)
    expressed as a when-chain."""
    spark = base.sparkSession
    cards_df = _pos_cardinalities(base, tokens_col)
    lens = {
        r["part_key"]: r["n_len"]
        for r in base.groupBy("part_key").agg(F.max(F.size(tokens_col)).alias("n_len")).collect()
    }
    split2 = {
        r["part_key"]
        for r in base.filter(F.col("_split2")).select("part_key").distinct().collect()
    }
    p1p2 = _determine_p1p2(cards_df.collect(), lens, split2, ct)
    if not p1p2:
        return base
    pp_df = spark.createDataFrame(
        [(k, p1, p2) for k, (p1, p2) in p1p2.items()], "part_key string, p1 int, p2 int"
    )
    with_pp = base.join(pp_df, "part_key", "left")
    t1 = F.element_at(F.col(tokens_col), F.col("p1") + 1)
    t2 = F.element_at(F.col(tokens_col), F.col("p2") + 1)
    pairs = with_pp.filter(F.col("p1").isNotNull()).select(
        "part_key", t1.alias("t1"), t2.alias("t2")
    )
    # m1/n1: partner cardinality + matching-line count per p1 token (and sym.)
    rel1 = pairs.groupBy("part_key", "t1").agg(
        F.countDistinct("t2").alias("m1"), F.count(F.lit(1)).alias("n1")
    )
    rel2 = pairs.groupBy("part_key", "t2").agg(
        F.countDistinct("t1").alias("m2"), F.count(F.lit(1)).alias("n2")
    )
    dpairs = pairs.distinct().join(rel1, ["part_key", "t1"]).join(rel2, ["part_key", "t2"])
    # per p1 token: do ALL partners map back uniquely? (IPLoM.py:308-321)
    agg1 = dpairs.groupBy("part_key", "t1").agg(
        F.max("m2").alias("maxm2"), F.max("m1").alias("m1"), F.max("n1").alias("n1")
    ).select(
        "part_key", "t1",
        ((F.col("m1") == 1) & (F.col("maxm2") == 1)).alias("one_to_one"),
        ((F.col("m1") > 1) & (F.col("maxm2") == 1)).alias("one_to_m1"),
        (F.col("m1").cast("double") / F.col("n1")).alias("dist1"),
    )
    agg2 = dpairs.groupBy("part_key", "t2").agg(
        F.max("m1").alias("maxm1"), F.max("m2").alias("m2"), F.max("n2").alias("n2")
    ).select(
        "part_key", "t2",
        ((F.col("m2") > 1) & (F.col("maxm1") == 1)).alias("m_to_one"),
        (F.col("m2").cast("double") / F.col("n2")).alias("dist2"),
    )
    # M-M leftover set sizes per part (IPLoM.py:427: |p1Set| < |p2Set|):
    # tokens not consumed by 1-1 / 1-M / M-1 removals
    mm1 = (
        agg1.filter(~F.col("one_to_one") & ~F.col("one_to_m1"))
        .join(
            dpairs.join(agg2, ["part_key", "t2"]).groupBy("part_key", "t1").agg(F.max("m_to_one").alias("pm")),
            ["part_key", "t1"],
        )
        .filter(~F.col("pm"))
        .groupBy("part_key")
        .agg(F.countDistinct("t1").alias("p1_left"))
    )
    mm2 = (
        agg2.filter(~F.col("m_to_one"))
        .join(
            dpairs.join(agg1, ["part_key", "t1"]).groupBy("part_key", "t2").agg(
                F.max("one_to_one").alias("p11"), F.max("one_to_m1").alias("p1m")
            ),
            ["part_key", "t2"],
        )
        .filter(~F.col("p11") & ~F.col("p1m"))
        .groupBy("part_key")
        .agg(F.countDistinct("t2").alias("p2_left"))
    )
    sets = mm1.join(mm2, "part_key", "full").na.fill(0, ["p1_left", "p2_left"])

    keyed = (
        with_pp.withColumn("_t1", t1)
        .withColumn("_t2", t2)
        .join(agg1.withColumnRenamed("t1", "_t1"), ["part_key", "_t1"], "left")
        .join(agg2.withColumnRenamed("t2", "_t2"), ["part_key", "_t2"], "left")
        .join(sets, "part_key", "left")
    )
    # Get_Rank_Posistion (IPLoM.py:525-554): 1-M -> p1 side unless
    # distance<=lower; M-1 -> p1 side only when distance<=lower
    pick_t1_1m = F.col("dist1") > lower
    pick_t1_m1 = F.col("dist2") <= lower
    new_key = (
        F.when(F.col("p1").isNull(), F.col("part_key"))
        .when(F.col("one_to_one"), F.concat(F.col("part_key"), F.lit("|b:"), F.col("_t1")))
        .when(
            F.col("one_to_m1"),
            F.concat(F.col("part_key"), F.lit("|b:"), F.when(pick_t1_1m, F.col("_t1")).otherwise(F.col("_t2"))),
        )
        .when(
            F.col("m_to_one"),
            F.concat(F.col("part_key"), F.lit("|b:"), F.when(pick_t1_m1, F.col("_t1")).otherwise(F.col("_t2"))),
        )
        # M-M: step-2 parts dump together (IPLoM.py:420-425); step-1 parts
        # split on the smaller leftover side (:427-440)
        .when(F.col("_split2"), F.concat(F.col("part_key"), F.lit("|b:mm")))
        .otherwise(
            F.concat(
                F.col("part_key"),
                F.lit("|b:"),
                F.when(F.col("p1_left") < F.col("p2_left"), F.col("_t1")).otherwise(F.col("_t2")),
            )
        )
    )
    return keyed.withColumn("part_key", new_key).drop(
        "p1", "p2", "_t1", "_t2", "one_to_one", "one_to_m1", "t1_partners_m",
        "m_to_one", "dist1", "dist2", "p1_left", "p2_left", "pm",
    )


def iplom_keyed(
    df: DataFrame,
    tokens_col: str = "e_words",
    step2_support: int = 0,
    ct: float = 0.35,
    lower: float = 0.25,
    upper: float = 0.9,
) -> DataFrame:
    """S1 + S2 + S3: every row tagged with its final partition key."""
    base = df.withColumn("part_key", F.concat(F.lit("L"), F.size(tokens_col).cast("string")))
    base = _step2(base, tokens_col, step2_support)
    return _step3(base, tokens_col, ct, lower, upper).drop("_split2")


def _s4_templates(base: DataFrame, tokens_col: str) -> DataFrame:
    """Shared S4 aggregation over keyed rows: (part_key, template,
    template_id, part_len). Template = per position countDistinct==1 ?
    first : '<*>' (IPLoM.py:488-494). One definition for both the
    templates-only path and parse_iplom's assignment path — the two used to
    carry verbatim copies that could silently diverge (round-4 review fix)."""
    per_pos = (
        base.select("part_key", F.posexplode(tokens_col).alias("pos", "tok"))
        .groupBy("part_key", "pos")
        .agg(F.when(F.countDistinct("tok") == 1, F.first("tok")).otherwise(F.lit("<*>")).alias("t"))
    )
    templates = per_pos.groupBy("part_key").agg(
        F.concat_ws(
            " ", F.transform(F.array_sort(F.collect_list(F.struct("pos", "t"))), lambda s: s["t"])
        ).alias("template")
    )
    sizes = base.groupBy("part_key").agg(F.count(F.lit(1)).alias("part_len"))
    return (
        templates.join(sizes, "part_key")
        .withColumn("template_id", F.concat(F.lit("e"), F.substring(F.md5("template"), 1, 8)))
        .select("part_key", "template_id", "template", "part_len")
    )


def iplom_templates(
    df: DataFrame,
    tokens_col: str = "e_words",
    pst: float = 0.0,
    **kw,
) -> DataFrame:
    """S4 over the keyed rows: (template_id, template, part_len[, is_outlier]).

    Template = per position countDistinct==1 ? first : '<*>' (IPLoM.py:
    488-494); PST folds under-supported partitions to outliers (:449-455)."""
    base = iplom_keyed(df.select(tokens_col), tokens_col, **kw)
    out = _s4_templates(base, tokens_col)
    if pst > 0:
        # PST denominator from the sizes aggregate itself, not a count()
        # job over the data. Round-6: 1-row agg + broadcast crossJoin (was
        # an unbounded window — bounded here since the frame is
        # template-sized, but the no-literal-partition-window invariant is
        # now uniform and plan-gated, tests/test_entry.py).
        from pyspark.sql.functions import broadcast

        total = out.agg(F.sum("part_len").cast("double").alias("_pst_total"))
        out = (
            out.crossJoin(broadcast(total))
            .withColumn("is_outlier", F.col("part_len") / F.col("_pst_total") < pst)
            .drop("_pst_total")
        )
    return out.select("template_id", "template", "part_len", *(["is_outlier"] if pst > 0 else []))


def parse_iplom(
    df: DataFrame,
    tokens_col: str = "e_words",
    out_col: str = "e_event_iplom_id",
    **kw,
) -> tuple[DataFrame, DataFrame]:
    """Assign template ids (row's key is a function of its own tokens + the
    partition statistics, recomputed once and joined broadcast).

    The template table (part_key -> template/id/size) is TEMPLATE-sized, so
    it is collected while the keyed frame is persisted and re-emitted as
    literal rows, then the keyed frame is unpersisted before returning
    (round-4 cache-hygiene fix — the old permanent .cache() accreted
    storage across corpora in long-lived sessions). ``part_key`` is a
    deterministic function of row content + the S3 statistics (which are
    embedded as plan literals by iplom_keyed), so ``assigned`` can safely
    recompute the keyed lineage once when the caller materializes it; its
    template join is a guaranteed broadcast of literals."""
    from pyspark.sql.functions import broadcast

    spark = df.sparkSession
    keyed = iplom_keyed(df, tokens_col, **kw).persist()
    try:
        tpl_sized = _s4_templates(keyed, tokens_col)
        tpl = spark.createDataFrame(tpl_sized.collect(), tpl_sized.schema)
    finally:
        keyed.unpersist()
    assigned = keyed.join(
        broadcast(tpl.select("part_key", F.col("template_id").alias(out_col))), "part_key", "left"
    ).drop("part_key")
    return assigned, tpl.select("template_id", "template", "part_len")
