"""Experimentation / hypothesis-testing statistics beyond the basic
two-sample tests (SURVEY.md §2 E66-E69) — the second tier of an
in-engine A/B analysis stack: variance-homogeneity screening
(Brown–Forsythe), ordinal association on binned contingency tables
(Goodman–Kruskal gamma / Kendall tau-b), CUPED variance reduction
with a pre-period covariate, and power / minimum-detectable-effect
planning from observed moments. Everything reduces to algebraic
one-pass aggregate state plus scalar math on tiny relations, so each
test costs one scan at any fact size — the E37/E65 discipline
extended to the rest of the experimentation toolbox.

Reference parity: the reference publishes daily chart observations
(`spotify_eps_dag.py`) whose consumers run exactly these
notebook-style analyses downstream; here they run distributed, inside
the engine, over the raw events instead of an extracted CSV.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_podcasts_airflow_batch_spark.functions.stats import (
    anova_tail,
    anova_tail_sql,
)
from spotify_podcasts_airflow_batch_spark.functions.hashing import (
    md5_hash31,
    oracle_hash31,
)
from spotify_podcasts_airflow_batch_spark.plans.registry import register
from spotify_podcasts_airflow_batch_spark.sources.readers import table


# ---------------------------------------------------------------- E66
@register(
    "levene_bf",
    oracle=f"""
    WITH med AS (
        SELECT event_type,
               quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    z AS (
        SELECT e.event_type, abs(e.value - med.med) AS z
        FROM events e JOIN med USING (event_type)
    ),
    s AS (
        SELECT event_type,
               count(*) AS n, avg(z) AS m, var_samp(z) AS v
        FROM z GROUP BY event_type
    ),
    {anova_tail_sql("bf_stat", include_eta=False)}
    """,
)
def levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E66 — Brown–Forsythe homogeneity-of-variance test across event
    types: ANOVA's equal-variance assumption, tested before trusting
    E65's F (and the robust, median-centred variant of Levene's test —
    deviations from the group MEDIAN, not the mean, so heavy tails
    don't masquerade as variance differences). Two scans: one exact
    per-group median (interpolating percentile — a selection, so
    order-independent and bit-identical across engines), then the E65
    one-way-ANOVA algebra applied to |value − median| with the group
    medians joined back as a broadcast k-row relation. At 100 TB the
    second pass carries constant per-task aggregate state; the first
    is the same exact-percentile cost B17/`quantiles` already prices.
    Identical formula text in both engines; round absorbs ulps."""
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    z = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("z")
    )
    s = z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("z").alias("m"),
        F.var_samp("z").alias("v"),
    )
    return anova_tail(s, "bf_stat", include_eta=False)


# ---------------------------------------------------------------- E67
_RANK_BINS = 8  # equi-width value bins for the contingency table


@register(
    "rank_assoc_binned",
    oracle=f"""
    WITH bounds AS (
        SELECT min(value) AS vmin, max(value) AS vmax FROM events
    ),
    binned AS (
        SELECT hour(ts) AS xb,
               CAST(least(floor((value - bounds.vmin)
                                / ((bounds.vmax - bounds.vmin)
                                   / {_RANK_BINS})),
                          {_RANK_BINS - 1}) AS BIGINT) AS yb
        FROM events, bounds
    ),
    cells AS (
        SELECT xb, yb, count(*) AS n FROM binned GROUP BY xb, yb
    ),
    pairs AS (
        SELECT
            CAST(sum(CASE WHEN c2.xb > c1.xb AND c2.yb > c1.yb
                     THEN c1.n * c2.n ELSE 0 END) AS BIGINT) AS conc,
            CAST(sum(CASE WHEN c2.xb > c1.xb AND c2.yb < c1.yb
                     THEN c1.n * c2.n ELSE 0 END) AS BIGINT) AS disc
        FROM cells c1, cells c2
    ),
    ties AS (
        SELECT CAST(sum(n) AS BIGINT) AS n_tot,
               CAST(sum(n) * (sum(n) - 1) // 2 AS BIGINT) AS t0,
               CAST((SELECT sum(nx * (nx - 1) // 2) FROM (
                    SELECT sum(n) AS nx FROM cells GROUP BY xb))
                    AS BIGINT) AS t1,
               CAST((SELECT sum(ny * (ny - 1) // 2) FROM (
                    SELECT sum(n) AS ny FROM cells GROUP BY yb))
                    AS BIGINT) AS t2
        FROM cells
    )
    SELECT n_tot AS n_total, conc AS concordant, disc AS discordant,
           round(CAST(conc - disc AS DOUBLE) / (conc + disc), 6)
               AS gamma,
           round(CAST(conc - disc AS DOUBLE)
                 / sqrt(CAST(t0 - t1 AS DOUBLE)
                        * CAST(t0 - t2 AS DOUBLE)), 6) AS tau_b
    FROM pairs, ties
    """,
)
def rank_assoc_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E67 — ordinal association between hour-of-day and value via a
    binned contingency table: Goodman–Kruskal gamma and Kendall tau-b
    computed EXACTLY on the (hour × {bins} equi-width value bins)
    grid. Naive Kendall is O(n²) pairs; on a contingency table the
    concordant/discordant counts collapse to a cells×cells join —
    ≤192² rows regardless of fact size — so the whole test is one
    map-side-combinable groupBy plus scalar math on a tiny broadcast
    relation (Spark plans the theta self-join as a
    BroadcastNestedLoopJoin over ≤192 rows). Tie terms n(n−1)/2 use
    INTEGER halving (shiftright / DuckDB ``//`` — the pair count is
    always even) so they are exact for the whole int64 range: the
    earlier ``/2``-as-double form silently lost ulps past n(n−1) >
    2⁵³ (~9.5e7 rows, ADVICE r7). Beyond n ≈ 3e9 rows the n(n−1)
    product overflows int64 — Spark ANSI raises LOUDLY there while
    DuckDB escalates to HUGEINT; at that scale move the tie terms to
    double deliberately. Bin edges derive from exact
    global min/max (order-independent aggregates), so both engines
    compute identical doubles through the same IEEE expression text.
    """
    ev = table(spark, sf_dir, "events").select("ts", "value")
    bounds = ev.agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    width = (F.col("vmax") - F.col("vmin")) / F.lit(_RANK_BINS)
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        F.hour("ts").alias("xb"),
        # try_divide: a constant value column makes the bin width 0;
        # least() skips the NULL ratio on BOTH engines, so every row
        # collapses into the top bin — engines agree, neither crashes
        F.least(
            F.floor(F.try_divide(F.col("value") - F.col("vmin"), width)),
            F.lit(_RANK_BINS - 1),
        )
        .cast("long")
        .alias("yb"),
    )
    cells = binned.groupBy("xb", "yb").agg(F.count(F.lit(1)).alias("n"))
    c1 = cells.alias("c1")
    c2 = cells.alias("c2")
    pairs = c1.crossJoin(F.broadcast(c2)).agg(
        F.sum(
            F.when(
                (F.col("c2.xb") > F.col("c1.xb"))
                & (F.col("c2.yb") > F.col("c1.yb")),
                F.col("c1.n") * F.col("c2.n"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("conc"),
        F.sum(
            F.when(
                (F.col("c2.xb") > F.col("c1.xb"))
                & (F.col("c2.yb") < F.col("c1.yb")),
                F.col("c1.n") * F.col("c2.n"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("disc"),
    )
    xm = cells.groupBy("xb").agg(F.sum("n").alias("nx"))
    ym = cells.groupBy("yb").agg(F.sum("n").alias("ny"))
    ties = (
        cells.agg(
            F.sum("n").cast("long").alias("n_tot"),
            F.shiftright(F.sum("n") * (F.sum("n") - 1), 1)
            .cast("long")
            .alias("t0"),
        )
        .crossJoin(
            F.broadcast(
                xm.agg(
                    F.sum(
                        F.shiftright(F.col("nx") * (F.col("nx") - 1), 1)
                    )
                    .cast("long")
                    .alias("t1")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                ym.agg(
                    F.sum(
                        F.shiftright(F.col("ny") * (F.col("ny") - 1), 1)
                    )
                    .cast("long")
                    .alias("t2")
                )
            )
        )
    )
    return pairs.crossJoin(F.broadcast(ties)).select(
        F.col("n_tot").alias("n_total"),
        F.col("conc").alias("concordant"),
        F.col("disc").alias("discordant"),
        F.round(
            F.try_divide(
                (F.col("conc") - F.col("disc")).cast("double"),
                F.col("conc") + F.col("disc"),
            ),
            6,
        ).alias("gamma"),
        F.round(
            F.try_divide(
                (F.col("conc") - F.col("disc")).cast("double"),
                F.sqrt(
                    (F.col("t0") - F.col("t1")).cast("double")
                    * (F.col("t0") - F.col("t2")).cast("double")
                ),
            ),
            6,
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------- E68
_CUPED_ARM = oracle_hash31("'cuped:' || CAST(user_id AS VARCHAR)")


@register(
    "cuped_adjust",
    oracle=f"""
    WITH span AS (
        SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
        FROM events
    ),
    mid AS (SELECT lo + (hi - lo) // 2 AS m FROM span),
    per_user AS (
        SELECT user_id,
               {_CUPED_ARM} % 2 AS arm,
               sum(CASE WHEN epoch_us(ts) < mid.m THEN value
                        ELSE 0 END) AS x,
               sum(CASE WHEN epoch_us(ts) >= mid.m THEN value
                        ELSE 0 END) AS y
        FROM events, mid
        GROUP BY user_id, mid.m
    ),
    pooled AS (
        SELECT covar_pop(x, y) / var_pop(x) AS theta,
               avg(x) AS xbar
        FROM per_user
    ),
    adj AS (
        SELECT u.arm, u.y,
               u.y - pooled.theta * (u.x - pooled.xbar) AS y_adj,
               pooled.theta AS theta
        FROM per_user u, pooled
    ),
    vr AS (
        SELECT 1 - var_pop(y_adj) / var_pop(y) AS var_reduction
        FROM adj
    )
    SELECT CAST(arm AS BIGINT) AS arm,
           CAST(count(*) AS BIGINT) AS n_users,
           round(avg(y), 4) AS mean_y,
           round(avg(y_adj), 4) AS mean_y_adj,
           round(any_value(theta), 6) AS theta,
           round(any_value(vr.var_reduction), 6) AS var_reduction
    FROM adj, vr
    GROUP BY arm
    ORDER BY arm
    """,
)
def cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E68 — CUPED variance reduction (Deng et al., WSDM'13): adjust
    each user's experiment-period outcome with their pre-period
    covariate, y_adj = y − θ(x − x̄), θ = cov(x,y)/var(x) pooled. The
    observation span is split at its midpoint (exact integer-µs
    arithmetic on order-independent min/max, so both engines cut the
    same instant); per-user pre/post sums are ONE conditional
    aggregate pass; θ and x̄ are one more algebraic aggregate over the
    per-user relation, broadcast back as a 1-row constant. Three
    map-side-combinable scans of user-grain state — at 100 TB the
    per-user relation is the only shuffle, keyed on user_id, and every
    moment (covar_pop, var_pop) is constant-size streaming state.
    Reports per-arm raw vs adjusted means plus the pooled θ and the
    variance-reduction fraction CUPED buys (the % of experiment
    runtime saved at equal power). Arms are the deterministic
    hash-split discipline of C64 `group_split_audit`."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "value")
    span = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).select(
        (
            F.col("lo")
            + F.floor((F.col("hi") - F.col("lo")) / 2).cast("long")
        ).alias("m")
    )
    per_user = (
        ev.crossJoin(F.broadcast(span))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.unix_micros("ts") < F.col("m"), F.col("value")
                ).otherwise(F.lit(0.0))
            ).alias("x"),
            F.sum(
                F.when(
                    F.unix_micros("ts") >= F.col("m"), F.col("value")
                ).otherwise(F.lit(0.0))
            ).alias("y"),
        )
        .select(
            (
                md5_hash31(
                    F.concat(
                        F.lit("cuped:"), F.col("user_id").cast("string")
                    )
                )
                % 2
            ).alias("arm"),
            "x",
            "y",
        )
    )
    pooled = per_user.agg(
        # try_divide: a constant covariate (e.g. every event in the
        # second half) gives var(x) = 0 — θ undefined, as in DuckDB
        F.try_divide(F.covar_pop("x", "y"), F.var_pop("x")).alias(
            "theta"
        ),
        F.avg("x").alias("xbar"),
    )
    adj = per_user.crossJoin(F.broadcast(pooled)).select(
        "arm",
        "y",
        (
            F.col("y") - F.col("theta") * (F.col("x") - F.col("xbar"))
        ).alias("y_adj"),
        "theta",
    )
    vr = adj.agg(
        (1 - F.try_divide(F.var_pop("y_adj"), F.var_pop("y"))).alias(
            "var_reduction"
        )
    )
    return (
        adj.crossJoin(F.broadcast(vr))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.round(F.avg("y"), 4).alias("mean_y"),
            F.round(F.avg("y_adj"), 4).alias("mean_y_adj"),
            F.round(F.any_value("theta"), 6).alias("theta"),
            F.round(F.any_value("var_reduction"), 6).alias(
                "var_reduction"
            ),
        )
        .select(
            F.col("arm").cast("long").alias("arm"),
            "n_users",
            "mean_y",
            "mean_y_adj",
            "theta",
            "var_reduction",
        )
        .orderBy("arm")
    )


# ---------------------------------------------------------------- E69
_Z_975 = 1.959963984540054  # Φ⁻¹(0.975): two-sided α = 0.05
_Z_80 = 0.8416212335729143  # Φ⁻¹(0.80): power = 0.80
_REL_LIFT = 0.05  # planning target: detect a 5% lift on control mean


@register(
    "power_mde",
    oracle=f"""
    WITH s AS (
        SELECT event_type, count(*) AS n, avg(value) AS m,
               var_samp(value) AS v
        FROM events
        WHERE event_type IN ('view', 'purchase')
        GROUP BY event_type
    ),
    a AS (SELECT n AS n_a, m AS m_a, v AS v_a FROM s
          WHERE event_type = 'view'),
    b AS (SELECT n AS n_b, v AS v_b FROM s
          WHERE event_type = 'purchase')
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           round(m_a, 4) AS control_mean,
           round(({_Z_975} + {_Z_80})
                 * sqrt(v_a / n_a + v_b / n_b), 4) AS mde_abs,
           round(({_Z_975} + {_Z_80})
                 * sqrt(v_a / n_a + v_b / n_b) / m_a, 6) AS mde_rel,
           CAST(ceil(({_Z_975} + {_Z_80}) * ({_Z_975} + {_Z_80})
                     * (v_a + v_b)
                     / (({_REL_LIFT} * m_a) * ({_REL_LIFT} * m_a)))
                AS BIGINT) AS n_per_arm_5pct
    FROM a, b
    """,
)
def power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E69 — power analysis from observed moments: the minimum
    detectable effect at the CURRENT sample sizes (α=0.05 two-sided,
    power 0.80) and the per-arm n needed to detect a 5% lift on the
    control mean — the 'how long must this experiment run' planning
    query, answered in-engine from the same (n, mean, var) sufficient
    statistics E37's Welch test already computes. One
    map-side-combinable aggregate per arm, then pure scalar algebra
    with the normal quantiles as literals — identical constant text in
    both engines, so the doubles agree bit-for-bit before rounding.
    At 100 TB: one scan, two aggregate rows, zero additional shuffle
    state."""
    s = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "purchase"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
        )
    )
    a = s.where(F.col("event_type") == "view").select(
        F.col("n").alias("n_a"), F.col("m").alias("m_a"),
        F.col("v").alias("v_a"),
    )
    b = s.where(F.col("event_type") == "purchase").select(
        F.col("n").alias("n_b"), F.col("v").alias("v_b")
    )
    zsum = F.lit(_Z_975) + F.lit(_Z_80)
    mde = zsum * F.sqrt(
        F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b")
    )
    delta = F.lit(_REL_LIFT) * F.col("m_a")
    return a.crossJoin(F.broadcast(b)).select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(F.col("m_a"), 4).alias("control_mean"),
        F.round(mde, 4).alias("mde_abs"),
        F.round(F.try_divide(mde, F.col("m_a")), 6).alias("mde_rel"),
        # try_divide: a zero control mean makes the relative-lift
        # target 0 — the required n is undefined, as in DuckDB
        F.ceil(
            F.try_divide(
                zsum * zsum * (F.col("v_a") + F.col("v_b")),
                delta * delta,
            )
        )
        .cast("long")
        .alias("n_per_arm_5pct"),
    )


# ---------------------------------------------------------------- E70
# Randomization test: the permutation twin of E64's Poisson bootstrap.
# A classical permutation test shuffles the arm labels B times —
# uncoordinatable across a distributed scan, exactly like classical
# resampling. The scalable form reassigns each row to a pseudo-arm by
# an independent deterministic hash bit per (row, replicate): every
# row computes its B bits locally, the per-(replicate, arm) sums ride
# ONE map-side-combinable aggregate, and the shuffle carries B·2 rows
# at any fact size. (Random reassignment approximates the permutation
# distribution without fixing arm sizes — the standard randomization-
# test form of the test.)
_PERM_B = 40  # replicates; p-value resolution 1/(B+1)


def _perm_bit_sql(h31: str, b: str) -> str:
    from spotify_podcasts_airflow_batch_spark.functions.hashing import (
        universal_family,
    )

    fam = universal_family(_PERM_B)
    arms = " ".join(
        f"WHEN {k} THEN ((({a} * {h31} + {bb}) % 2147483647) % 2)"
        for k, (a, bb) in enumerate(fam)
    )
    return f"(CASE {b} {arms} END)"


@register(
    "permutation_test",
    oracle=f"""
    WITH rows_u AS (
        SELECT event_type,
               CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vu,
               {oracle_hash31("'perm:' || CAST(event_id AS VARCHAR)")}
                   AS h31
        FROM events
        WHERE event_type IN ('view', 'purchase')
    ),
    obs AS (
        SELECT
            CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_a,
            CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_b,
            (sum(CASE WHEN event_type = 'view' THEN vu ELSE 0 END)
                 // sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END))
            - (sum(CASE WHEN event_type = 'purchase' THEN vu ELSE 0 END)
                 // sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END))
                AS obs_diff_u
        FROM rows_u
    ),
    reps AS (
        SELECT b.b,
               CASE WHEN sum(CASE WHEN {_perm_bit_sql("r.h31", "b.b")} = 0
                                  THEN 1 ELSE 0 END) = 0 THEN 0
                    ELSE sum(CASE WHEN {_perm_bit_sql("r.h31", "b.b")} = 0
                                  THEN r.vu ELSE 0 END)
                         // sum(CASE WHEN {_perm_bit_sql("r.h31", "b.b")} = 0
                                     THEN 1 ELSE 0 END) END
               - CASE WHEN sum(CASE WHEN {_perm_bit_sql("r.h31", "b.b")} = 1
                                    THEN 1 ELSE 0 END) = 0 THEN 0
                      ELSE sum(CASE WHEN {_perm_bit_sql("r.h31", "b.b")} = 1
                                    THEN r.vu ELSE 0 END)
                           // sum(CASE WHEN {_perm_bit_sql("r.h31", "b.b")} = 1
                                       THEN 1 ELSE 0 END) END AS diff_u
        FROM rows_u r
        CROSS JOIN (SELECT unnest(range({_PERM_B})) AS b) b
        GROUP BY b.b
    ),
    ext AS (
        SELECT CAST(sum(CASE WHEN abs(reps.diff_u) >= abs(obs.obs_diff_u)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
        FROM reps, obs
    )
    SELECT obs.n_a, obs.n_b,
           CAST(obs.obs_diff_u AS BIGINT) AS obs_diff_u,
           CAST({_PERM_B} AS INT) AS n_replicates,
           ext.n_extreme,
           round(CAST(1 + ext.n_extreme AS DOUBLE) / ({_PERM_B} + 1), 6)
               AS p_value
    FROM obs, ext
    """,
)
def permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E70 — randomization test for the view-vs-purchase mean
    difference (the non-parametric twin of E37's Welch t-test, and the
    permutation member of the resampling family E64 bootstrap / E48
    jackknife): B=40 hash-derived pseudo-arm reassignments, p-value =
    (1 + #{|diff_b| ≥ |observed|}) / (B+1). See the section comment
    for why per-(row, replicate) hash bits are THE distributed form:
    one md5 per row + B universal-family bits (the E64 discipline),
    one map-side-combinable aggregate, shuffle = B·2 rows at any
    scale. Exactness: values quantize to integer micro-units per row;
    arm means use truncating `div`//`//` on both engines; the p-value
    is an exact small-rational division — every comparison happens on
    exact BIGINTs, so the count of extreme replicates is engine-
    independent by construction."""
    from spotify_podcasts_airflow_batch_spark.functions.hashing import (
        MERSENNE_31,
        md5_hash31,
        universal_family,
    )

    rows_u = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "purchase"))
        .select(
            "event_type",
            F.floor(F.col("value") * 1000000 + 0.5)
            .cast("long")
            .alias("vu"),
            md5_hash31(
                F.concat(F.lit("perm:"), F.col("event_id").cast("string"))
            ).alias("h31"),
        )
    )
    fam = universal_family(_PERM_B)
    a_arr = F.array(*[F.lit(a) for a, _ in fam])
    b_arr = F.array(*[F.lit(bb) for _, bb in fam])
    bit = (
        (
            F.element_at(a_arr, F.col("b") + 1) * F.col("h31")
            + F.element_at(b_arr, F.col("b") + 1)
        )
        % F.lit(MERSENNE_31)
    ) % 2
    # ONE events pass for observed stats AND replicates (round 11;
    # guide §1.2/§2.4, the bootstrap_ci/bh_fdr_screen discipline): the
    # explode emits each raw row exactly once per replicate b, so the
    # per-b aggregate carries the per-arm sums too — identical exact
    # long sums for every b; obs reads them from the b = 0 slice. The
    # old shape ran the events scan for obs, again (exploded ×B) for
    # reps, and a third time when the final projection re-derived obs
    # (3 parquet scans in plans/r11/permutation_test_before.txt).
    # per_b is B rows — persist, three consumers.
    per_b = (
        rows_u.select(
            "event_type",
            "vu",
            "h31",
            F.explode(F.sequence(F.lit(0), F.lit(_PERM_B - 1))).alias("b"),
        )
        .withColumn("__bit", bit)
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("__bit") == 0, F.col("vu")).otherwise(0))
            .alias("s0"),
            F.sum(F.when(F.col("__bit") == 0, 1).otherwise(0)).alias("n0"),
            F.sum(F.when(F.col("__bit") == 1, F.col("vu")).otherwise(0))
            .alias("s1"),
            F.sum(F.when(F.col("__bit") == 1, 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .alias("na"),
            F.sum(
                F.when(F.col("event_type") == "view", F.col("vu")).otherwise(0)
            ).alias("sa"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .alias("nb"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("vu")
                ).otherwise(0)
            ).alias("sb"),
        )
        .persist()
    )
    # a GLOBAL aggregate over the b = 0 slice (not a filter) so the
    # empty-events case still yields obs's one all-NULL row, exactly
    # like the old global rows_u aggregate and the oracle's obs CTE
    obs = per_b.agg(
        F.max(F.when(F.col("b") == 0, F.col("na"))).alias("na"),
        F.max(F.when(F.col("b") == 0, F.col("sa"))).alias("sa"),
        F.max(F.when(F.col("b") == 0, F.col("nb"))).alias("nb"),
        F.max(F.when(F.col("b") == 0, F.col("sb"))).alias("sb"),
    ).select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        # the NULL guards mirror DuckDB's NULL on `// 0` when one arm
        # has no rows (single-event-type slice) — ANSI `div` raises
        (
            F.when(F.col("na") == 0, F.lit(None).cast("long")).otherwise(
                F.expr("sa div na")
            )
            - F.when(F.col("nb") == 0, F.lit(None).cast("long")).otherwise(
                F.expr("sb div nb")
            )
        ).alias("obs_diff_u"),
    )
    reps = per_b.select(
        (
            F.when(F.col("n0") == 0, F.lit(0).cast("long")).otherwise(
                F.expr("s0 div n0")
            )
            - F.when(F.col("n1") == 0, F.lit(0).cast("long")).otherwise(
                F.expr("s1 div n1")
            )
        ).alias("diff_u")
    )
    ext = reps.crossJoin(F.broadcast(obs.select("obs_diff_u"))).agg(
        F.sum(
            F.when(
                F.abs(F.col("diff_u")) >= F.abs(F.col("obs_diff_u")), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_extreme")
    )
    return obs.crossJoin(F.broadcast(ext)).select(
        "n_a",
        "n_b",
        F.col("obs_diff_u").cast("long").alias("obs_diff_u"),
        F.lit(_PERM_B).cast("int").alias("n_replicates"),
        "n_extreme",
        F.round(
            (1 + F.col("n_extreme")).cast("double") / F.lit(_PERM_B + 1), 6
        ).alias("p_value"),
    )


# ---------------------------------------------------------------- E71
@register(
    "mcnemar_paired",
    oracle="""
    WITH span AS (
        SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
        FROM events
    ),
    mid AS (SELECT lo + (hi - lo) // 2 AS m FROM span),
    per_user AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase'
                         AND epoch_us(ts) < mid.m THEN 1 ELSE 0 END) AS p1,
               max(CASE WHEN event_type = 'purchase'
                         AND epoch_us(ts) >= mid.m THEN 1 ELSE 0 END) AS p2
        FROM events, mid
        GROUP BY user_id, mid.m
    ),
    cells AS (
        SELECT
            CAST(sum(CASE WHEN p1 = 0 AND p2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n00,
            CAST(sum(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n01,
            CAST(sum(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n10,
            CAST(sum(CASE WHEN p1 = 1 AND p2 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n11
        FROM per_user
    )
    SELECT n00, n01, n10, n11,
           CASE WHEN n01 + n10 = 0 THEN NULL
                ELSE round(CAST((n01 - n10) * (n01 - n10) AS DOUBLE)
                           / (n01 + n10), 4) END AS mcnemar_stat,
           CASE WHEN n01 + n10 = 0 THEN NULL
                ELSE round(CAST((abs(n01 - n10) - 1)
                                * (abs(n01 - n10) - 1)
                           AS DOUBLE) / (n01 + n10), 4) END AS mcnemar_cc
    FROM cells
    """,
)
def mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E71 — McNemar's test on paired binary outcomes: did each
    user's conversion state (any purchase) CHANGE between the first
    and second half of the observation span? The within-subject
    counterpart of E40's two-proportion z-test — only the discordant
    users (converted in exactly one period) carry information, and
    the statistic (n01−n10)²/(n01+n10) (plus the continuity-corrected
    variant) is χ²(1) under no-change. Shape: the span midpoint from
    exact integer-µs min/max (the E68 cut), ONE conditional max per
    user (map-side combinable), one 4-cell rollup — two scans,
    constant state, shuffle = |users| then 1 row at any fact size.
    Every cell count is an exact BIGINT, so the statistic's inputs
    are engine-identical by construction."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    span = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).select(
        (
            F.col("lo")
            + F.floor((F.col("hi") - F.col("lo")) / 2).cast("long")
        ).alias("m")
    )
    per_user = (
        ev.crossJoin(F.broadcast(span))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.unix_micros("ts") < F.col("m")),
                    1,
                ).otherwise(0)
            ).alias("p1"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.unix_micros("ts") >= F.col("m")),
                    1,
                ).otherwise(0)
            ).alias("p2"),
        )
    )
    cells = per_user.agg(
        *[
            F.sum(
                F.when(
                    (F.col("p1") == a) & (F.col("p2") == b), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"n{a}{b}")
            for a in (0, 1)
            for b in (0, 1)
        ]
    )
    d = F.col("n01") - F.col("n10")
    tot = F.col("n01") + F.col("n10")
    return cells.select(
        "n00",
        "n01",
        "n10",
        "n11",
        # 0 discordant users → the test is undefined, not a crash
        # (ANSI mode raises on the division a NULL-tolerant CASE skips)
        F.when(
            tot == 0, F.lit(None).cast("double")
        ).otherwise(
            F.round((d * d).cast("double") / tot, 4)
        ).alias("mcnemar_stat"),
        F.when(
            tot == 0, F.lit(None).cast("double")
        ).otherwise(
            F.round(((F.abs(d) - 1) * (F.abs(d) - 1)).cast("double") / tot, 4)
        ).alias("mcnemar_cc"),
    )


# ---------------------------------------------------------------- E72
# Benjamini-Hochberg FDR screening over per-segment permutation
# tests: the multiple-testing layer every "which of my thousands of
# segments drifted?" pipeline needs. Running one E70-style test per
# event type and eyeballing p < 0.05 inflates false discoveries
# m-fold; BH caps the EXPECTED false-discovery fraction at q. The
# whole procedure is exact integer arithmetic end-to-end: permutation
# p-values are small rationals c/(B+1) (the E70 integer count), and
# the BH step condition p_(i) <= i*q/m cross-multiplies to
# (c+1)*m*DEN <= i*(B+1)*NUM for q = NUM/DEN — no float CDF, no
# quantile table, engine-identical by construction. Shape: one md5
# per row, B universal-family bits, ONE map-side-combinable aggregate
# per (type, replicate); shuffle = m*B rows at any fact size, the BH
# rank runs over m rows on one task.
_BH_Q_NUM = 1  # q = 1/5 = 20% FDR
_BH_Q_DEN = 5


@register(
    "bh_fdr_screen",
    oracle=f"""
    WITH span AS (
        SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
        FROM events
    ),
    mid AS (SELECT lo + (hi - lo) // 2 AS m FROM span),
    rows_u AS (
        SELECT event_type,
               CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vu,
               CASE WHEN epoch_us(ts) < (SELECT m FROM mid)
                    THEN 1 ELSE 0 END AS early,
               {oracle_hash31(
                   "'bhfdr:' || event_type || ':'"
                   " || CAST(event_id AS VARCHAR)"
               )} AS h31
        FROM events
    ),
    obs AS (
        SELECT event_type,
               CAST(sum(early) AS BIGINT) AS n_early,
               CAST(sum(1 - early) AS BIGINT) AS n_late,
               (sum(CASE WHEN early = 1 THEN vu END) // sum(early))
               - (sum(CASE WHEN early = 0 THEN vu END)
                  // sum(1 - early)) AS obs_diff_u
        FROM rows_u GROUP BY event_type
        HAVING sum(early) > 0 AND sum(1 - early) > 0
    ),
    mm AS (SELECT count(*) AS m FROM obs),
    reps AS (
        SELECT r.event_type, b.b,
               CASE WHEN sum(CASE WHEN {_perm_bit_sql("r.h31", "b.b")} = 0
                                  THEN 1 ELSE 0 END) = 0 THEN 0
                    ELSE sum(CASE WHEN {_perm_bit_sql("r.h31", "b.b")} = 0
                                  THEN r.vu ELSE 0 END)
                         // sum(CASE WHEN {_perm_bit_sql("r.h31", "b.b")} = 0
                                     THEN 1 ELSE 0 END) END
               - CASE WHEN sum(CASE WHEN {_perm_bit_sql("r.h31", "b.b")} = 1
                                    THEN 1 ELSE 0 END) = 0 THEN 0
                      ELSE sum(CASE WHEN {_perm_bit_sql("r.h31", "b.b")} = 1
                                    THEN r.vu ELSE 0 END)
                           // sum(CASE WHEN {_perm_bit_sql("r.h31", "b.b")} = 1
                                       THEN 1 ELSE 0 END) END AS diff_u
        FROM rows_u r
        JOIN (SELECT event_type FROM obs) s USING (event_type)
        CROSS JOIN (SELECT unnest(range({_PERM_B})) AS b) b
        GROUP BY r.event_type, b.b
    ),
    ext AS (
        SELECT o.event_type,
               CAST(sum(CASE WHEN abs(r.diff_u) >= abs(o.obs_diff_u)
                             THEN 1 ELSE 0 END) AS BIGINT) AS c
        FROM reps r JOIN obs o USING (event_type)
        GROUP BY o.event_type
    ),
    ranked AS (
        SELECT event_type, c,
               row_number() OVER (ORDER BY c, event_type) AS i
        FROM ext
    ),
    kstar AS (
        SELECT coalesce(max(CASE WHEN (c + 1) * (SELECT m FROM mm)
                                      * {_BH_Q_DEN}
                                 <= i * {_PERM_B + 1} * {_BH_Q_NUM}
                            THEN i END), 0) AS k
        FROM ranked
    )
    SELECT o.event_type, o.n_early, o.n_late,
           CAST(o.obs_diff_u AS BIGINT) AS obs_diff_u,
           r.c AS n_extreme,
           CAST(r.i AS BIGINT) AS p_rank,
           round(CAST(1 + r.c AS DOUBLE) / {_PERM_B + 1}, 6) AS p_value,
           CAST(CASE WHEN r.i <= (SELECT k FROM kstar)
                     THEN 1 ELSE 0 END AS INT) AS rejected
    FROM obs o JOIN ranked r USING (event_type)
    """,
)
def bh_fdr_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E72 — per-segment temporal-drift screen with FDR control:
    for every event type, an E70-style permutation test of the mean
    value difference between the span's first and second half, then
    Benjamini-Hochberg across the m types at q = 20%. ``rejected``
    marks the types whose drift survives multiple-testing correction
    — the inferential twin of E25's PSI dial. See the section comment
    for the exact-integer BH form; segments with an empty half are
    excluded from the screen on both engines."""
    from spotify_podcasts_airflow_batch_spark.functions.hashing import (
        MERSENNE_31,
        md5_hash31,
        universal_family,
    )
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").select(
        "event_type", "ts", "value", "event_id"
    )
    span = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).select(
        (
            F.col("lo")
            + F.floor((F.col("hi") - F.col("lo")) / 2).cast("long")
        ).alias("m")
    )
    rows_u = ev.crossJoin(F.broadcast(span)).select(
        "event_type",
        F.floor(F.col("value") * 1000000 + 0.5).cast("long").alias("vu"),
        F.when(F.unix_micros("ts") < F.col("m"), 1).otherwise(0).alias(
            "early"
        ),
        md5_hash31(
            F.concat(
                F.lit("bhfdr:"),
                F.col("event_type"),
                F.lit(":"),
                F.col("event_id").cast("string"),
            )
        ).alias("h31"),
    )
    fam = universal_family(_PERM_B)
    a_arr = F.array(*[F.lit(a) for a, _ in fam])
    b_arr = F.array(*[F.lit(bb) for _, bb in fam])
    bit = (
        (
            F.element_at(a_arr, F.col("b") + 1) * F.col("h31")
            + F.element_at(b_arr, F.col("b") + 1)
        )
        % F.lit(MERSENNE_31)
    ) % 2
    # ONE events pass for observed stats AND replicates (round 11;
    # guide §1.2 "how many full passes are unavoidable" / §2.4). The
    # old shape aggregated rows_u once for obs and again (exploded
    # ×B) for reps, and the static plan re-ran every consumer's whole
    # subtree — 16 events scans in plans/r11/bh_fdr_screen_before.txt.
    # Since the explode emits each raw row exactly once per replicate
    # b, the per-(type, b) aggregate carries the UNWEIGHTED early/late
    # sums too (identical exact long sums for every b — obs reads them
    # from any one slice, b = 0). The empty-half screen moves from a
    # pre-explode semi-join to a post-aggregate filter: replicate rows
    # of screened-out types are built then dropped, value-identical
    # because obs's HAVING and the join keys are unchanged. per_tb
    # (m·B rows) and ranked (m rows) persist because their consumers'
    # lineages end in different exchanges — both are segment-count-
    # sized, never fact-sized.
    per_tb = (
        rows_u.select(
            "event_type",
            "vu",
            "h31",
            "early",
            F.explode(F.sequence(F.lit(0), F.lit(_PERM_B - 1))).alias("b"),
        )
        .withColumn("__bit", bit)
        .groupBy("event_type", "b")
        .agg(
            F.sum(F.when(F.col("__bit") == 0, F.col("vu")).otherwise(0))
            .alias("s0"),
            F.sum(F.when(F.col("__bit") == 0, 1).otherwise(0)).alias("n0"),
            F.sum(F.when(F.col("__bit") == 1, F.col("vu")).otherwise(0))
            .alias("s1"),
            F.sum(F.when(F.col("__bit") == 1, 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("early") == 1, F.col("vu"))).alias("se"),
            F.sum("early").alias("ne"),
            F.sum(F.when(F.col("early") == 0, F.col("vu"))).alias("sl"),
            F.sum(1 - F.col("early")).alias("nl"),
        )
        .persist()
    )
    obs = (
        per_tb.where(F.col("b") == 0)
        .select(
            "event_type",
            F.col("ne").cast("long").alias("n_early"),
            F.col("nl").cast("long").alias("n_late"),
            (F.expr("se div ne") - F.expr("sl div nl")).alias(
                "obs_diff_u"
            ),
        )
        .where((F.col("n_early") > 0) & (F.col("n_late") > 0))
    )
    reps = per_tb.select(
        "event_type",
        (
            F.when(F.col("n0") == 0, F.lit(0).cast("long")).otherwise(
                F.expr("s0 div n0")
            )
            - F.when(F.col("n1") == 0, F.lit(0).cast("long")).otherwise(
                F.expr("s1 div n1")
            )
        ).alias("diff_u"),
    )
    ext = (
        reps.join(F.broadcast(obs.select("event_type", "obs_diff_u")),
                  "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("diff_u")) >= F.abs(F.col("obs_diff_u")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("c")
        )
    )
    ranked = ext.withColumn(
        "i", F.row_number().over(Window.orderBy("c", "event_type"))
    ).persist()
    m_cnt = obs.agg(F.count(F.lit(1)).alias("m"))
    kstar = (
        ranked.crossJoin(F.broadcast(m_cnt))
        .agg(
            F.coalesce(
                F.max(
                    F.when(
                        (F.col("c") + 1) * F.col("m") * _BH_Q_DEN
                        <= F.col("i") * (_PERM_B + 1) * _BH_Q_NUM,
                        F.col("i"),
                    )
                ),
                F.lit(0),
            ).alias("k")
        )
    )
    return (
        obs.join(ranked, "event_type")
        .crossJoin(F.broadcast(kstar))
        .select(
            "event_type",
            "n_early",
            "n_late",
            F.col("obs_diff_u").cast("long").alias("obs_diff_u"),
            F.col("c").alias("n_extreme"),
            F.col("i").cast("long").alias("p_rank"),
            F.round(
                (1 + F.col("c")).cast("double") / F.lit(_PERM_B + 1), 6
            ).alias("p_value"),
            F.when(F.col("i") <= F.col("k"), 1)
            .otherwise(0)
            .cast("int")
            .alias("rejected"),
        )
    )
