package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Generic relational operator layer over the driver testdata tables.
 *
 * The reference job needs only scan/project/filter/full-outer-join/
 * classify (SURVEY §2) — everything here is the "comes for free from
 * Catalyst" surface (SURVEY §2 closing note) made explicit and oracle-
 * checked: aggregation, joins of every flavor, windows, sort/limit,
 * distinct, set ops, rollup, scalar/date functions, time-bucketed event
 * aggregation.
 *
 * Every query is written scale-first:
 *  - filters/projections sit directly on the scan (parquet pushdown),
 *  - small dimensions are broadcast explicitly,
 *  - aggregates are partial-aggregated map-side by Catalyst,
 *  - floating aggregates are rounded in BOTH engines (oracle parity —
 *    sum order differs across partitions, last-ulp noise is expected).
 */
object RelationalQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    // events carries a generator-version-dependent ts encoding; pin it
    if (name == "events") EventTs.canonical(raw) else raw
  }

  /**
   * Order-independent EXACT sum of a fixed-point money expression.
   *
   * Each row's value is recovered as its true scaled integer —
   * TPC-H money carries `digits` decimal digits, so round(x·10^digits)
   * lands on it exactly (the double representation error is ~1e-10
   * relative, far below the 0.5 rounding margin) — then integer-summed
   * and divided once. Integer sums are exact and associative, so
   * Spark's partition order and DuckDB's scan order cannot produce the
   * last-ulp disagreements double sums do, and there is no per-row
   * double→BigDecimal conversion the way the previous decimal(18,4)
   * cast had (that cast was 3× of q1's aggregate time: 1.03s → 0.36s
   * median at sf0.1 — see tools/Profile).
   *
   * Overflow headroom: the scaled values are split into high/low long
   * sums via bit ops (shiftright/mask — Column./ is DOUBLE division in
   * Spark, which would corrupt the quotient; shifts are exact integer
   * ops at any magnitude), recombined in decimal after aggregation, so
   * the integer sum is exact while sum(x·10^digits) < ~9.4e21 per group —
   * well past a single-group q1 over 100 TB of lineitem (~8e11 rows ×
   * ~3.6e8 basis points ≈ 3e20 fits; a single long sum would cap at
   * 9.2e18 and overflow there).
   *
   * The DuckDB oracle states the plain integer sum (its accumulator is
   * HUGEINT): 1024·sum(hi) + sum(lo) ≡ sum(scaled) exactly, so both
   * engines round and divide the same integer. (The INTERNAL integer
   * sum is what stays exact up to ~9.4e21; the returned value is that
   * integer's nearest-double rendering — identical in both engines
   * because they convert the same integer.)
   *
   * The final 2-decimal rounding ALSO happens in exact integer space
   * ((total + d/2) div d, half-up): a sum of 4-digit basis points
   * divided by 1e4 hits true .xx5 midpoints ~1% of the time, and there
   * Spark (BigDecimal on the shortest decimal string) and DuckDB
   * (binary-double half-away) disagree by a cent — rounding the
   * integer first means no midpoint ever reaches a double.
   */
  private[operators] def exactMoneySum(c: Column, digits: Int): Column = {
    val scale = math.pow(10, digits)
    val scaled = round(c * scale).cast("long")
    val total = sum(shiftright(scaled, 10)).cast("decimal(38,0)") * 1024 +
      sum(scaled.bitwiseAND(lit(1023L))).cast("decimal(38,0)")
    val cents =
      if (digits <= 2) total
      else {
        // half-AWAY-FROM-ZERO (BigDecimal HALF_UP), sign-mirrored so the
        // DuckDB oracle's truncating `//` agrees on negative sums too:
        // floor((|n|+d/2)/d) on the magnitude, sign restored after
        val d = math.pow(10, digits - 2).toLong
        val mag = floor((abs(total) + lit(d / 2)) / lit(d)) // exact decimal div
        when(total < 0, -mag).otherwise(mag)
      }
    cents.cast("double") / 100.0
  }

  /** TPC-H Q1-style pricing summary: the canonical partial-agg shuffle.
   * At 100 TB this is map-side combine into 6 groups — shuffle bytes are
   * O(partitions), not O(rows). */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(exactMoneySum(col("l_extendedprice"), 2), 2).as("sum_base_price"),
        round(exactMoneySum(
          col("l_extendedprice") * (lit(1) - col("l_discount")), 4), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(exactMoneySum(col("l_discount"), 2) / count(lit(1)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Q6-style single-row aggregate with tight scan-level predicates —
   * every filter lands in parquet PushedFilters. */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(exactMoneySum(
        col("l_extendedprice") * col("l_discount"), 4), 2).as("revenue"))

  /** Q3-style shipping priority: two shuffled joins + agg + top-k.
   * customer is small relative to lineitem → broadcast. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-03-15").cast("timestamp")
    val cust = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(spark, dir, "orders").filter(col("o_orderdate") < cutoff)
    val li = t(spark, dir, "lineitem").filter(col("l_shipdate") > cutoff)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderpriority"))
      .agg(round(exactMoneySum(
        col("l_extendedprice") * (lit(1) - col("l_discount")), 4), 2).as("revenue"))
  }

  /** Q4-style: EXISTS via left-semi join (no row multiplication, the
   * planner's cheapest existence check). */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
    val late = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"))
    ord.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
  }

  /** Q5-style: the 6-table star join. region/nation/supplier broadcast;
   * orders⋈lineitem is the only big shuffle. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val region = t(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = t(spark, dir, "nation")
    val cust = t(spark, dir, "customer")
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = t(spark, dir, "lineitem")
    val supp = t(spark, dir, "supplier")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(exactMoneySum(
        col("l_extendedprice") * (lit(1) - col("l_discount")), 4), 2).as("revenue"))
  }

  /** Window functions: per-supplier top-3 line items by price.
   * Deterministic total order via (price desc, orderkey, linenumber). */
  def qWindowTopPerSupplier(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    t(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
  }

  /** Running (cumulative) aggregate window over a yearly frame. */
  def qWindowRunningRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .groupBy("o_year")
      .agg(round(exactMoneySum(col("o_totalprice"), 2), 2).as("year_total"))
    o.withColumn("running_total",
      round(sum("year_total").over(
        Window.orderBy("o_year").rowsBetween(Window.unboundedPreceding, 0)), 2))
  }

  /** Global sort + limit with a total tie-break order (top-k is a
   * TakeOrderedAndProject — no full sort at scale). */
  def qTopKExpensive(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)

  /** Distinct projection (shuffle dedup). */
  def qDistinctSegments(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer").select("c_mktsegment", "c_nationkey").distinct()

  /** Set operation: UNION (distinct) of two key sets. */
  def qUnionKeys(spark: SparkSession, dir: String): DataFrame = {
    val a = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("custkey"))
    val b = t(spark, dir, "orders")
      .filter(col("o_totalprice") > 400000).select(col("o_custkey").as("custkey"))
    a.union(b).distinct()
  }

  /** NOT EXISTS via left-anti join: customers who never ordered. */
  def qAntiNoOrders(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** ROLLUP over segment × nation (grouping-set aggregation). */
  def qRollupSegmentNation(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .rollup("c_mktsegment", "c_nationkey")
      .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal").cast("decimal(18,4)")), 2).cast("double").as("total_bal"))

  /** Scalar function battery: string/math/conditional, row-level. */
  def qScalarFunctions(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part").select(
      col("p_partkey"),
      upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
      length(col("p_name")).as("name_len"),
      when(col("p_size") < 10, "small")
        .when(col("p_size") < 30, "medium")
        .otherwise("large").as("size_class"),
      round(col("p_retailprice") * 1.1, 2).as("inflated_price"),
      abs(col("p_size") - 25).as("size_dist"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))

  /** Date-part extraction + aggregation. */
  def qDateParts(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).as("o_year"),
        quarter(col("o_orderdate")).as("o_quarter"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice").cast("decimal(18,4)")), 2).cast("double").as("total"))

  /** Event timestamps: `t` canonicalizes events.ts to an exact
   * nanosecond LongType whatever the parquet encoding (EventTs). Integer
   * division to µs — never through double, 1.7e18 ns exceeds a double's
   * 53-bit mantissa. */
  private def tsMicros = expr("ts DIV 1000")

  /** Event-stream time bucketing: hourly tumbling aggregation (batch
   * form of the streaming pipeline — same plan shape as the watermarked
   * groupBy(window(...)) in streaming/EventPipeline). */
  def qEventsHourly(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(
        date_format(date_trunc("hour", timestamp_micros(tsMicros)),
          "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value").cast("decimal(18,4)")), 2).cast("double").as("total_value"))

  /** Sliding (hopping) windows — the third windowing mode beside the
   * tumbling hour and the session gap: 2-hour windows starting every 30
   * minutes, so each event lands in 4 overlapping windows. Spark's
   * `window(col, windowDuration, slideDuration)` expands the membership
   * row-locally (a 4-element explode inside the scan projection — no
   * join); both engines align 30-minute buckets on the epoch, so the
   * oracle can regenerate membership with a 4-step range unnest. */
  def qEventsSliding(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(
        window(timestamp_micros(tsMicros), "2 hours", "30 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,4)")), 2).cast("double")
          .as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Sessionization via lag(): session starts when the gap to the
   * previous event of the same user exceeds 30 minutes. All time math on
   * truncated epoch µs (ns-vs-µs parity with the oracle). */
  def qEventsSessions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), tsMicros.as("us"))
      .withColumn("prev_us", lag("us", 1).over(byUser))
      .withColumn("new_session",
        (col("prev_us").isNull ||
          col("us") - col("prev_us") > 30L * 60 * 1000000).cast("int"))
      .groupBy("user_id")
      .agg(sum("new_session").as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** Sessionless conversion funnel: view → first click at-or-after the
   * user's first view → first purchase at-or-after that click. Three
   * user-keyed aggregates with conditional mins; every stage join is on
   * the SAME user_id partitioning the aggregates just produced, so the
   * chain reuses one exchange — the stage-dependent mins cannot fold
   * into a single aggregate (each needs the previous stage's timestamp)
   * and this is the cheapest correct shape at any scale. */
  def qEventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"), tsMicros.as("us"))
    val v = e.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("us"))).as("v_us"))
    // v_us/c_us are constant per user — carried through min() so every
    // stage groups on user_id ALONE and the exchange the first
    // aggregate produced satisfies all later stages (grouping on
    // (user_id, v_us) instead would re-partition on both columns).
    val c = e.join(v, "user_id").groupBy("user_id")
      .agg(min(col("v_us")).as("v_us"),
        min(when(col("event_type") === "click" && col("us") >= col("v_us"),
          col("us"))).as("c_us"))
    val p = e.join(c, "user_id").groupBy("user_id")
      .agg(min(col("v_us")).as("v_us"), min(col("c_us")).as("c_us"),
        min(when(col("event_type") === "purchase" && col("us") >= col("c_us"),
          col("us"))).as("p_us"))
    p.agg(count(lit(1)).as("n_users"),
      count(col("v_us")).as("n_viewed"),
      count(col("c_us")).as("n_clicked_after_view"),
      count(col("p_us")).as("n_purchased_after_click"))
  }

  /** Cohort retention: users bucketed by first-active day, distinct
   * active users per (cohort, day-offset) for the first week. Two
   * user-keyed aggregates (first-seen, then membership join) and one
   * (cohort, offset) count-distinct — all map-side partial; the
   * first-seen table is user-sized and broadcasts at this SF, SMJ at
   * scale. */
  def qEventsRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), to_date(timestamp_micros(tsMicros)).as("day"))
    val first = e.groupBy("user_id").agg(min("day").as("cohort_day"))
    e.join(first, "user_id")
      .select(col("user_id"), col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .filter(col("day_offset") <= 7)
      .groupBy("cohort_day", "day_offset")
      .agg(count_distinct(col("user_id")).as("n_active"))
  }

  /** As-of join (operator Spark lacks natively — see AsOfJoin): each
   * click event matched to that user's most recent prior-or-simultaneous
   * purchase. Oracle is DuckDB's native ASOF JOIN. */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), tsMicros.as("us"))
    val clicks = e.filter(col("event_type") === "click")
      .select("user_id", "event_id", "us")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"),
        col("event_id").as("p_event_id"), col("us").as("p_us"),
        col("value").as("p_value"))
    AsOfJoin.backward(clicks, purchases,
      keys = Seq("user_id"), tsCol = "us",
      carry = Seq("p_event_id", "p_us", "p_value"))
      .select(col("user_id"), col("event_id"), col("us").as("click_us"),
        col("r_p_event_id").as("purch_event_id"),
        col("r_p_us").as("purch_us"),
        col("r_p_value").as("purch_value"),
        (col("us") - col("r_p_us")).as("lag_us"))
  }

  /** Range join (see RangeJoin): every click inside the 6-hour window
   * after an error by the same user, via bucketed equi-join — the plan
   * Spark's own inequality join can't produce (it would nested-loop). */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), tsMicros.as("us"))
    val windows = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_event_id"),
        col("us").as("win_start"), (col("us") + 21600000000L).as("win_end"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_event_id"), col("us"))
    RangeJoin.pointsInIntervals(clicks, windows,
      keys = Seq("user_id"), pointTs = "us",
      startCol = "win_start", endCol = "win_end", bucketWidth = 21600000000L)
      .select(col("user_id"), col("err_event_id"), col("click_event_id"),
        (col("us") - col("win_start")).as("delta_us"))
  }

  /** Array aggregation: per-order quantity vector (sorted for engine
   * parity — collect order is nondeterministic) + scalar array ops.
   * The array is rendered to canonical JSON text so the comparison
   * harness only ever sees scalar columns (list-typed columns are not
   * hashable on the pandas side). */
  def qArrayAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(
        to_json(sort_array(collect_list(col("l_quantity")))).as("qtys"),
        count(lit(1)).as("n_items"),
        max("l_quantity").as("max_qty"))

  /** Set ops beyond UNION: customers ordering in 1995 INTERSECT 1996,
   * and 1995 EXCEPT 1996, tagged and unioned into one result. */
  def qIntersectExcept(spark: SparkSession, dir: String): DataFrame = {
    def buyers(year: Int) = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .select(col("o_custkey").as("custkey"))
    buyers(1995).intersect(buyers(1996)).withColumn("tag", lit("both"))
      .unionByName(
        buyers(1995).except(buyers(1996)).withColumn("tag", lit("only_1995")))
  }

  /** Correlated scalar subquery shape: orders worth more than twice
   * their customer's average. Decorrelated the way Catalyst would —
   * aggregate-then-join — and the predicate cross-multiplied into exact
   * decimal arithmetic (price·n > 2·total) so no float-boundary row can
   * flip between engines. */
  def qAboveCustomerAvg(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val perCust = o.groupBy("o_custkey").agg(
      sum(col("o_totalprice").cast("decimal(18,4)")).as("total"),
      count(lit(1)).as("n"))
    o.join(perCust, "o_custkey")
      .filter(col("o_totalprice").cast("decimal(18,4)") * col("n") >
        col("total") * 2)
      .select("o_orderkey", "o_custkey", "o_totalprice")
  }

  /** CUBE grouping-set aggregation (all four grouping combinations). */
  def qCubeSegmentNation(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .cube("c_mktsegment", "c_nationkey")
      .agg(count(lit(1)).as("n_cust"),
        round(sum(col("c_acctbal").cast("decimal(18,4)")), 2).cast("double").as("total_bal"))

  /** Exact interpolated percentiles per group (ORDER-BY-ALL determinism;
   * both engines interpolate over the same sorted doubles). The array
   * form buffers each group's values ONCE for all three quartiles —
   * three scalar percentile() aggregates each keep their own copy of
   * the column and sort it independently (3× state, 3× sort; this was
   * the second-slowest extended bench line when written that way). */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("pct"))
      .select(col("l_returnflag"),
        round(col("pct").getItem(0), 4).as("p25"),
        round(col("pct").getItem(1), 4).as("p50"),
        round(col("pct").getItem(2), 4).as("p75"))

  /**
   * [[qPercentiles]]' 100 TB path: EXACT interpolated percentiles
   * without ever buffering a group — `percentile()` holds every group
   * value in executor memory (16 MB per 2M-row group; a 10¹²-row group
   * is simply impossible), where this runs in three bounded passes:
   *
   *  1. one scan folding each group through the mergeable
   *     [[graft.functions.KllRankSketch]] (O(k·log n) state,
   *     map-side partial merges) + exact count/min/max;
   *  2. on the driver (sketch summaries are model-sized, the quantizer
   *     precedent): for each (group, q) derive the CERTIFIED value
   *     window [lo, hi] that must contain both order statistics
   *     x₍k0₎, x₍k0+1₎ from the sketch's hard ±err rank certificate —
   *     then one cheap counting scan computes the exact ranks at the
   *     window edges AND re-verifies the certificate against reality
   *     (a violated bound throws; the answer can never be silently
   *     wrong);
   *     The edge counts also pin any BOUNDARY-VALUED order statistic
   *     arithmetically — a quantile landing on a giant tie class
   *     resolves from counts alone, so ties of any size never flood a
   *     selection window;
   *  3. one filtered scan (strict-interior value-range predicates
   *     pushed to parquet) selects any remaining interior order
   *     statistic exactly by global rank = edge count + in-window
   *     row_number, and interpolates.
   *
   * Interior rows ≤ c_hi − c_le_lo ≈ 2·err per (group, q) —
   * sketch-error-proportional, never group- or tie-class-proportional.
   * The final numbers are EXACT, merge-order invariant, and
   * hash-checked against the SAME DuckDB quantile_cont oracle as
   * q_percentiles — the sketch narrows the search, it never decides
   * the answer. */
  def sketchPercentiles(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Double], k: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val kll = udaf(new graft.functions.KllRankSketch(k),
      org.apache.spark.sql.Encoders.scalaDouble)
    val li = df.select(col(groupCol), col(valueCol))
    // pass 1: bounded-state sketch + exact n/min/max per group
    val fitted = li.groupBy(groupCol)
      .agg(kll(col(valueCol)).as("sk"), count(lit(1)).as("n"),
        min(valueCol).as("mn"), max(valueCol).as("mx"))
      .collect()
    val windows = fitted.flatMap { r =>
      val g = r.getString(0)
      val s = r.getStruct(1)
      val summary = graft.functions.KllSummary(
        s.getSeq[Double](0).toArray, s.getSeq[Long](1).toArray,
        s.getLong(2), s.getLong(3))
      val n = r.getLong(2)
      require(summary.n == n, s"sketch folded ${summary.n} of $n rows")
      val (mn, mx) = (r.getDouble(3), r.getDouble(4))
      qs.map { q =>
        val p = (n - 1) * q
        val k0 = math.floor(p).toLong
        (g, q, k0, p - k0, n,
          graft.functions.KllRankSketch.lowerBound(summary, k0, mn),
          graft.functions.KllRankSketch.upperBound(summary, k0, mx), mx)
      }
    }.toSeq
    val wdf = broadcast(windows
      .toDF(groupCol, "q", "k0", "frac", "n", "lo", "hi", "mx"))
    // pass 2: exact counts at the window edges — below lo, at-or-below
    // lo, below hi. These (a) re-verify the sketch certificate against
    // reality, and (b) pin any BOUNDARY-VALUED order statistic
    // arithmetically: x₍j₎ = lo iff c_lo ≤ j < c_le_lo, x₍j₎ = hi iff
    // j ≥ c_hi. That second use is the 100 TB tie guard — when a
    // quantile lands on or beside a giant tie class (constant fields,
    // sentinel prices), the certified window NECESSARILY contains the
    // whole class, and a naive in-window selection would pour it
    // through one window partition; resolving boundary stats from
    // counts means pass 3 only ever selects from the STRICT interior,
    // whose size is ≤ c_hi − c_le_lo ≈ 2·err by construction.
    val edges = li.join(wdf, groupCol)
      .groupBy(groupCol, "q")
      .agg(sum(when(col(valueCol) < col("lo"), 1L).otherwise(0L)).as("c_lo"),
        sum(when(col(valueCol) <= col("lo"), 1L).otherwise(0L)).as("c_le_lo"),
        sum(when(col(valueCol) < col("hi"), 1L).otherwise(0L)).as("c_hi"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val certified = windows.map { case (g, q, k0, frac, n, lo, hi, mx) =>
      val (cLo, cLeLo, cHi) = edges((g, q))
      require(cLo <= k0 && (cHi >= k0 + 2 || hi == mx),
        s"sketch rank certificate violated for ($g, $q): " +
          s"c_lo=$cLo k0=$k0 c_hi=$cHi — the err bound did not hold")
      def boundary(j: Long): Option[Double] =
        if (cLo <= j && j < cLeLo) Some(lo)
        else if (j >= cHi) Some(hi)
        else None
      (g, q, k0, frac, lo, hi, cLeLo, boundary(k0), boundary(k0 + 1))
    }
    // (group, q) tuples with BOTH stats boundary-pinned finish on the
    // driver; the rest go to pass 3 with any known stat riding along
    val (solved, open) = certified.partition {
      case (_, _, _, frac, _, _, _, v0, v1) =>
        v0.isDefined && (frac == 0d || v1.isDefined)
    }
    val solvedDf = solved
      .map { case (g, q, _, frac, _, _, _, v0, v1) =>
        (g, q, if (frac == 0d) v0.get else v0.get + frac * (v1.get - v0.get))
      }
      .toDF(groupCol, "q", "v")
    if (open.isEmpty) return solvedDf
    val cdf = broadcast(open
      .toDF(groupCol, "q", "k0", "frac", "lo", "hi", "c_le_lo",
        "known_v0", "known_v1"))
    // pass 3: STRICT-interior exact selection + interpolation. The
    // interior windows also go in as a LITERAL disjunctive pre-filter:
    // the joined lo/hi columns can never reach the scan, but the same
    // bounds as literals push to parquet (`PushedFilters: Or(And(...`)
    // where row-group stats prune everything outside the certified
    // windows — on a value-clustered 100 TB layout pass 3 reads almost
    // nothing. An interior stat is itself an interior row, so every
    // open tuple emits; boundary-pinned stats coalesce in from cdf.
    val preFilter = open.map { case (g, _, _, _, lo, hi, _, _, _) =>
      col(groupCol) === g && col(valueCol) > lo && col(valueCol) < hi
    }.reduce(_ || _)
    val w = Window.partitionBy(groupCol, "q").orderBy(valueCol)
    val selected = li.filter(preFilter).join(cdf, groupCol)
      .filter(col(valueCol) > col("lo") && col(valueCol) < col("hi"))
      .withColumn("grank", col("c_le_lo") + row_number().over(w) - 1)
      .filter(col("grank") === col("k0") || col("grank") === col("k0") + 1)
      .groupBy(groupCol, "q", "frac", "known_v0", "known_v1")
      .agg(min(when(col("grank") === col("k0"), col(valueCol))).as("sel_v0"),
        min(when(col("grank") === col("k0") + 1, col(valueCol))).as("sel_v1"))
      .withColumn("v0", coalesce(col("known_v0"), col("sel_v0")))
      .withColumn("v1", coalesce(col("known_v1"), col("sel_v1")))
      .withColumn("v", when(col("frac") === 0d, col("v0"))
        .otherwise(col("v0") + col("frac") * (col("v1") - col("v0"))))
      .select(col(groupCol), col("q"), col("v"))
    if (solved.isEmpty) selected else selected.unionByName(solvedDf)
  }

  /** Wired sketch-percentile query — same quartiles, same output
   * schema, same DuckDB oracle as [[qPercentiles]]: a hash match
   * proves the bounded-state path reproduces the exact answers. */
  def qPercentilesSketch(spark: SparkSession, dir: String): DataFrame =
    sketchPercentiles(t(spark, dir, "lineitem")
        .filter(col("l_extendedprice").isNotNull),
        "l_returnflag", "l_extendedprice", Seq(0.25, 0.5, 0.75))
      .groupBy("l_returnflag")
      .agg(round(min(when(col("q") === 0.25, col("v"))), 4).as("p25"),
        round(min(when(col("q") === 0.5, col("v"))), 4).as("p50"),
        round(min(when(col("q") === 0.75, col("v"))), 4).as("p75"))

  /** Semi-structured access: JSON property extraction pushed through an
   * aggregation (get_json_object stays codegen'd — no UDF). */
  def qJsonProps(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        max("k").as("max_k"),
        count_distinct(col("k")).as("n_distinct_k"))

  /** Pivot (long→wide reshape): order counts by year × priority.
   * Pivot values are declared explicitly — Spark otherwise runs an
   * extra distinct-collect job to discover them, a full scan at
   * 100 TB; declared values keep it one partial-agg pass. */
  /** Offset window functions (lag/lead) + ntile quartiles per customer
   * order history — the per-entity sequence-analysis shape. One window
   * over one exchange; the (date, orderkey) order is a total order, so
   * offsets and tile assignment are engine-deterministic. */
  def qWindowLeadLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(spark, dir, "orders")
      .filter(col("o_custkey") % 10 === 0)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag("o_totalprice", 1).over(w).as("prev_price"),
        lead("o_totalprice", 1).over(w).as("next_price"),
        ntile(4).over(w).cast("bigint").as("quartile"))
  }

  /** UNPIVOT (wide→long reshape) via `stack`: three measure columns
   * become (measure, value) rows. Generator-narrow like posexplode —
   * each scan task expands its own rows, no shuffle at any scale. */
  def qUnpivotMeasures(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-06-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("stack(3, 'price', l_extendedprice, 'discount', l_discount," +
          " 'tax', l_tax) AS (measure, value)"))

  def qPivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(year(col("o_orderdate")).cast("bigint").as("order_year"),
        concat(lit("prio_"), substring(col("o_orderpriority"), 1, 1)).as("prio"))
      .groupBy("order_year")
      .pivot("prio", (1 to 5).map(i => s"prio_$i"))
      .agg(count(lit(1)))

  /** Explode/flatten (wide→long reshape): one row per whitespace token
   * with its 1-based position — `posexplode` is generator-narrow (no
   * shuffle; each scan task expands its own rows). Sampled to every
   * 20th doc; empty tokens filtered AFTER position assignment so pos
   * indexes the raw split (same as DuckDB unnest WITH ORDINALITY). */
  def qExplodeTokens(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(col("doc_id") % 20 === 0)
      .select(col("doc_id"),
        posexplode(split(col("text"), "\\s+")).as(Seq("pos", "token")))
      .filter(length(col("token")) > 0)
      .select(col("doc_id"), (col("pos") + 1).cast("bigint").as("pos"),
        col("token"))

  /** Arbitrary GROUPING SETS (beyond the rollup/cube shapes), through
   * the SQL entry path — the one aggregation pass Catalyst expands to
   * both groupings with `grouping_id` discriminators, not two scans. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("customer_v")
    spark.sql(
      """SELECT c_mktsegment, c_nationkey, count(*) AS n_cust,
        |  CAST(grouping_id(c_mktsegment, c_nationkey) AS BIGINT) AS gid
        |FROM customer_v
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))""".stripMargin)
  }

  /** RANGE window frame (vs the ROWS frame of the running total): each
   * year's revenue plus the trailing-2-year windowed sum — peer rows
   * enter by VALUE distance, so missing years shrink the window. */
  def qWindowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val yearly = t(spark, dir, "orders")
      .groupBy(year(col("o_orderdate")).cast("bigint").as("o_year"))
      .agg(round(exactMoneySum(col("o_totalprice"), 2), 2).as("year_total"))
    yearly.withColumn("trailing_3y",
      round(sum("year_total").over(
        Window.orderBy("o_year").rangeBetween(-2, 0)), 2))
  }

  /** Q17-style small-quantity revenue: the correlated-aggregate-subquery
   * shape ("lineitems below 20% of their part's average quantity"),
   * decorrelated to aggregate-then-join as Catalyst's subquery rewrite
   * would. The brand dimension broadcasts into BOTH the aggregate input
   * (left-semi — per-part averages are only computed for the brand's
   * parts) and the probe side, so the single shuffle is the per-part
   * aggregate over the pruned slice. The threshold predicate is
   * cross-multiplied into pure integer arithmetic
   * (5 · n · qty < Σqty, quantities are integral) — no float boundary
   * can flip a row between engines. */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    val pt = t(spark, dir, "part")
      .filter(col("p_brand") === "Brand#13").select("p_partkey")
    val li = t(spark, dir, "lineitem")
    val perPart = li
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey")
      .agg(sum(col("l_quantity").cast("long")).as("qty_sum"),
        count(lit(1)).as("qty_n"))
    li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .join(perPart, "l_partkey")
      .filter(col("l_quantity").cast("long") * col("qty_n") * 5 < col("qty_sum"))
      .agg(round(exactMoneySum(col("l_extendedprice"), 2), 2).as("small_qty_revenue"),
        count(lit(1)).as("n_lineitems"))
  }

  /** Q10-style returned-item report: top 20 customers by revenue lost to
   * returns in a quarter. Aggregates BEFORE the customer join — revenue
   * collapses to one row per custkey first, so at 100 TB the
   * customer-side join input is |active customers|, not |lineitems|;
   * nation broadcasts; the final top-20 is a TakeOrderedAndProject with
   * a custkey tie-break (total order → deterministic across engines). */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val rev = t(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(round(exactMoneySum(
        col("l_extendedprice") * (lit(1) - col("l_discount")), 4), 2).as("revenue"))
    rev.join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Q13-style customer distribution: orders per customer, then the
   * histogram of those counts. The left join keeps zero-order customers
   * (count of a null column is 0); the second aggregate collapses to
   * |distinct order counts| rows, so the only real shuffle is the
   * per-customer count — map-side combined on both levels. */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))

  /** Q14-style promo effect: conditional vs total aggregate in ONE pass
   * over the month's lineitems (no second scan for the denominator).
   * Both revenues go through the exact basis-point path; the percentage
   * divides the two identical rounded doubles, so the ratio is
   * bit-identical across engines. part joins broadcast (probe side is
   * the date-pruned scan). */
  def q14PromoEffect(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
    val discPrice = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val promo = round(exactMoneySum(
      when(col("p_type") === "PROMO", discPrice).otherwise(lit(0.0)), 4), 2)
    val total = round(exactMoneySum(discPrice, 4), 2)
    li.join(broadcast(t(spark, dir, "part").select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(promo.as("promo_revenue"), total.as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
        round(lit(100) * col("promo_revenue") / col("total_revenue"), 6)
          .as("promo_pct"))
  }

  /** Q18-style large-volume orders: the group-filter-then-join shape.
   * The HAVING aggregate runs first (one shuffle over lineitem, map-side
   * combined into |orders| rows, filtered to the rare >300-qty tail), so
   * the subsequent orders/customer joins see only the survivors — at
   * 100 TB that's thousands of rows joining, not billions. Quantities
   * are integral doubles → summed as longs for exact parity. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = t(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > 300)
    big.join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
  }

  /** Q7-style nation-pair trade volume: the self-aliased-dimension shape
   * (nation joins twice, once per side of the trade). Each dim is
   * pre-filtered to the two nations BEFORE touching lineitem, so the
   * pair-disjunction only evaluates on rows that can satisfy it; the
   * nation lookups broadcast, the lineitem⋈orders shuffle is the one
   * big exchange (AQE decides the supplier/customer join sides at
   * runtime — at 100 TB an 8%-of-customers slice is not broadcastable,
   * so no hint is forced). */
  def q7NationVolume(spark: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_1", "NATION_2")
    val nations = t(spark, dir, "nation").filter(col("n_name").isin(pair: _*))
    val supp = t(spark, dir, "supplier")
      .join(broadcast(nations.select(col("n_nationkey").as("s_nk"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("s_nk"))
      .select("s_suppkey", "supp_nation")
    val cust = t(spark, dir, "customer")
      .join(broadcast(nations.select(col("n_nationkey").as("c_nk"),
        col("n_name").as("cust_nation"))), col("c_nationkey") === col("c_nk"))
      .select("c_custkey", "cust_nation")
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      // broadcast hints (r21, same finding as q8): supp and cust are
      // join OUTPUTS (dim ⋈ broadcast nation-pair), so Catalyst sizes
      // them by join-output estimate and SortMergeJoined the cust side
      // (an extra exchange + sort of the whole fact join on o_custkey).
      // The two-nation filter makes both sides tiny dims; the l⋈orders
      // SMJ is the one genuine fact-fact join and stays.
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(exactMoneySum(
        col("l_extendedprice") * (lit(1) - col("l_discount")), 4), 2).as("revenue"))
  }

  /** Q8-style market share: a 7-table star with a conditional/total
   * revenue ratio per year. Region→nation→customer restricts the
   * customer side (left-semi — only existence matters); the supplier
   * nation rides along as the CASE discriminator. Both revenues take
   * the exact basis-point path and the share divides the two rounded
   * doubles — engine-identical. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val asiaKeys = t(spark, dir, "nation")
      .join(broadcast(t(spark, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    val cust = t(spark, dir, "customer")
      .join(broadcast(asiaKeys), col("c_nationkey") === col("c_nk"))
      .select("c_custkey")
    val supp = t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation").select(
        col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("s_nk"))
      .select("s_suppkey", "supp_nation")
    val discPrice = col("l_extendedprice") * (lit(1) - col("l_discount"))
    t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part")
        .filter(col("p_type") === "ECONOMY").select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(t(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      // explicit hints (r21): cust and supp are join OUTPUTS, so
      // Catalyst sizes them by join-output estimate and falls back to
      // SortMergeJoin for both — two extra exchanges + sorts for a
      // one-bigint-column semi side and a two-column dim (guide §3.1:
      // estimates are often wrong after joins/filters; hint when you
      // know the side is small). Same broadcast-dims contract as
      // q5/q9. Measured 1.13 → 0.95s (sf0.1, median of 5, in-session
      // A/B); plan: SMJ LeftSemi + SMJ Inner → BroadcastHashJoins.
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        round(exactMoneySum(
          when(col("supp_nation") === "NATION_2", discPrice).otherwise(lit(0.0)),
          4), 2).as("nation_revenue"),
        round(exactMoneySum(discPrice, 4), 2).as("total_revenue"))
      .select(col("o_year"), col("nation_revenue"), col("total_revenue"),
        round(col("nation_revenue") / col("total_revenue"), 6).as("mkt_share"))
  }

  /** Q19-style disjunctive-predicate join: three OR'd brand/size/quantity
   * clauses that can't be pushed as a single conjunct. The part columns
   * broadcast; Catalyst still pushes the IsNotNull/partkey conjuncts to
   * the scan, and the disjunction evaluates codegen'd post-join — the
   * shape that punishes engines without predicate decomposition. */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    def clause(brand: String, sizeHi: Int, qtyLo: Int, qtyHi: Int) =
      col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(qtyLo, qtyHi)
    t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part")
          .select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(clause("Brand#12", 5, 1, 11) ||
        clause("Brand#23", 10, 10, 20) ||
        clause("Brand#34", 15, 20, 30))
      .agg(round(exactMoneySum(
        col("l_extendedprice") * (lit(1) - col("l_discount")), 4), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Q12-style late-shipment split (adapted: the synthetic schema has no
   * shipmode/receiptdate, so "late" = shipped >60 days after the order
   * date, grouped by return flag): one lineitem⋈orders shuffle with the
   * CASE split computed map-side in the partial aggregate — the shape
   * where conditional counters must not become two scans. */
  def q12LateLines(spark: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t(spark, dir, "lineitem")
      .select("l_orderkey", "l_returnflag", "l_shipdate")
      .join(t(spark, dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** Q15-style top supplier: revenue per supplier over a quarter, then
   * the max-revenue supplier(s) via aggregate→single-row-broadcast→join
   * back (the VIEW + scalar-subquery shape, fully distributed — no
   * driver collect, no whole-relation window). Revenue compares exactly
   * because both joins compare the same rounded-cents double. The
   * per-supplier aggregate is localCheckpointed (the TPC-H Q15 VIEW
   * materialization — supplier-count rows, tiny) so the lineitem scan
   * + aggregation runs ONCE, feeding both the max and the probe, instead
   * of twice via two independent lineages. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(round(exactMoneySum(
        col("l_extendedprice") * (lit(1) - col("l_discount")), 4), 2).as("total_revenue"))
      .localCheckpoint()
    val mx = rev.agg(max(col("total_revenue")).as("mx"))
    rev.join(broadcast(mx), col("total_revenue") === col("mx"))
      .join(t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  /** Q21-style waiting-suppliers (adapted to shipdate lateness): for
   * failed ('F') orders, suppliers whose line shipped late while SOME
   * other supplier shipped in the same order (EXISTS → left-semi) and
   * NO other supplier shipped late (NOT EXISTS → left-anti) — the
   * two-correlated-subqueries-on-one-relation shape, decorrelated into
   * per-order supplier-MULTIPLICITY tests rather than semi/anti probes.
   * Because a lateF row's own supplier ships in its order, "some other
   * supplier shipped" ⟺ the order has ≥2 distinct suppliers, and "no
   * other supplier shipped late" ⟺ the order has exactly 1 distinct
   * LATE supplier. Neither needs a distinct COUNT: ≥2 distinct ⟺
   * `min ≠ max` and exactly-1 distinct ⟺ `min = max` — plain partial
   * min/max aggregates, so the big fact shuffle carries one
   * (orderkey, lo, hi) row per order from the map side with NO
   * distinct-dedup expansion (the r9 shape paid two count_distinct
   * aggregations; this was its whole 2.1s cost). The late-side test
   * rides a window over the already-checkpointed `lateF` (one small
   * shuffle computes both bounds and keeps the row stream — no second
   * aggregate+join), and the full-fact side filters to qualifying
   * orderkeys BEFORE its join. No LIMIT: ties at a cutoff would be
   * nondeterministic across engines, and the driver hash-compares full
   * results.
   *
   * Why not literal semi/anti joins (the r8 shape): Catalyst pulled
   * the orders join above the probes and planned the semi with the
   * ENTIRE lineitem projection as a broadcast build side and the anti
   * as an SMJ shuffling the full unfiltered fact table (r9 plan
   * audit) — both fatal at 100 TB. `lateF` (late lines of failed
   * orders — a small fraction of the fact table) is localCheckpointed
   * so its join+filter builds once and feeds both the window and the
   * final row stream. */
  def q21WaitSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    val fOrders = t(spark, dir, "orders").filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val lateF = li.join(fOrders, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select("l_orderkey", "l_suppkey")
      .localCheckpoint()
    // orders with ≥2 distinct suppliers, as bare keys
    val multi = li.groupBy(col("l_orderkey").as("a_orderkey"))
      .agg(min("l_suppkey").as("lo"), max("l_suppkey").as("hi"))
      .filter(col("lo") =!= col("hi"))
      .select("a_orderkey")
    val wOrd = Window.partitionBy("l_orderkey")
    lateF
      .withColumn("late_lo", min("l_suppkey").over(wOrd))
      .withColumn("late_hi", max("l_suppkey").over(wOrd))
      .filter(col("late_lo") === col("late_hi")) // exactly one late supplier
      .join(multi, col("l_orderkey") === col("a_orderkey"))
      .join(broadcast(t(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
  }

  /** Q22-style idle wealthy customers: account balance above the
   * positive-balance average (scalar aggregate, broadcast as a 1-row
   * cross join; the comparison is CROSS-MULTIPLIED in exact cents —
   * `cents·n > total` — so no engine ever divides) with no recent
   * orders (anti-join against the date-filtered order scan), rolled up
   * per nation. */
  def q22IdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("c_acctbal") * 100).cast("long")
    val cust = t(spark, dir, "customer")
    val stats = cust.filter(col("c_acctbal") > 0.0)
      .agg(sum(cents).as("tot_cents"), count(lit(1)).as("n_pos"))
    val recent = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("2000-06-01").cast("timestamp"))
      .select("o_custkey")
    cust.crossJoin(broadcast(stats))
      .filter(cents * col("n_pos") > col("tot_cents"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        round(exactMoneySum(col("c_acctbal"), 2), 2).as("totacctbal"))
  }

  /** Q2-style minimum-cost supplier (adapted: the synthetic schema has
   * no partsupp, so the supply relation is DERIVED from lineitem — per
   * (part, supplier) the minimum extended price at which that supplier
   * ever shipped that part; suppliers scoped to region EUROPE; parts to
   * size 15): the correlated-min-subquery shape, decorrelated the Spark
   * way — aggregate the supply relation once, localCheckpoint it (the
   * Q15 VIEW pattern: |part|×|supplier|-bounded, one lineitem scan
   * feeds both consumers), re-aggregate per part for the min, equi-join
   * back on (part, min-cost). Cost compares exactly across engines
   * because it is an UNROUNDED parquet double — min() does no
   * arithmetic. Dim chain supplier⋈nation⋈region broadcasts; the only
   * large shuffle hashes lineitem on the supply group keys. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val supEu = t(spark, dir, "supplier")
      .join(t(spark, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(t(spark, dir, "region").filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val rsupply = t(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(broadcast(supEu.select("s_suppkey")), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(col("l_extendedprice")).as("cost"))
    // the "cheapest supplier per part" correlation as a min-over-window
    // + filter instead of aggregate + self-join (r21): the self-join
    // form re-aggregated rsupply and SortMergeJoined it back (3
    // exchanges + 2 sorts, and rsupply had to be checkpointed because
    // it fed both sides); the window form consumes rsupply ONCE — one
    // exchange on l_partkey, no checkpoint, no join — and keeps every
    // tied-at-min supplier exactly like the equality join did (guide
    // §2.4: two operations keyed the same way share one partitioning).
    // Measured 1.19 → 0.84s (sf0.1, median of 5, in-session A/B).
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    rsupply
      .withColumn("m_cost", min(col("cost")).over(w))
      .filter(col("cost") === col("m_cost")).drop("m_cost")
      .join(broadcast(t(spark, dir, "part").filter(col("p_size") === 15)
        .select("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supEu), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("cost"))
  }

  /** Q9-style product-type profit rollup (adapted: supply cost proxied
   * as 60% of the part's retail price — the schema has no
   * ps_supplycost): the five-table star-plus-fact join grouped by
   * supplier nation × order year. Join order matters at 100 TB: the
   * selective part filter (⅛ of parts, broadcast) prunes lineitem
   * FIRST, then the supplier→nation dims broadcast, and only the
   * already-reduced fact shuffles against orders on orderkey. Profit is
   * summed in exact basis points ([[exactMoneySum]]) — both engines
   * round the identical per-row double product, so the aggregate is
   * order-independent and hash-stable. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val redParts = t(spark, dir, "part")
      .filter(col("p_name").like("red %"))
      .select("p_partkey", "p_retailprice")
    val profit = col("l_extendedprice") * (lit(1) - col("l_discount")) -
      lit(0.6) * col("p_retailprice") * col("l_quantity")
    t(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount")
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(t(spark, dir, "supplier").select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(spark, dir, "nation").select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .join(t(spark, dir, "orders").select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(exactMoneySum(profit, 4), 2).as("profit"))
  }

  /** Q11-style important parts (HAVING against a scalar fraction of a
   * global aggregate): stock value per part held by one nation's
   * suppliers, kept where the part's value exceeds 1/500 of the
   * nation's total. Value is EXACT integer cents·quantity (both
   * factors integral per row), the global total is a 1-row broadcast,
   * and the comparison is CROSS-MULTIPLIED (`val·500 > tot`) so
   * neither engine divides. The per-part aggregate feeds both the
   * total and the filter probe — localCheckpointed (|part|-bounded)
   * so the lineitem scan runs once. */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val natSup = t(spark, dir, "supplier")
      .filter(col("s_nationkey") === 3).select("s_suppkey")
    val pv = t(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .join(broadcast(natSup), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        col("l_quantity").cast("long")).as("val_cents"))
      .localCheckpoint()
    val tot = pv.agg(sum(col("val_cents")).as("tot_cents"))
    pv.crossJoin(broadcast(tot))
      .filter(col("val_cents") * 500 > col("tot_cents"))
      .select(col("l_partkey"), col("val_cents"))
  }

  /** Q16-style supplier count (NOT IN + count-distinct): distinct
   * suppliers able to supply each (brand, type, size) bucket, with a
   * brand/type exclusion and "complaint" suppliers (negative account
   * balance — the schema's analog of the comment-scan) removed via a
   * broadcast ANTI join before any shuffle. The count-distinct runs as
   * Spark's two-phase partial-distinct aggregate — the dedup happens
   * map-side per (group, suppkey) before the exchange. */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    val complaints = t(spark, dir, "supplier")
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    val parts = t(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO")
      .select("p_partkey", "p_brand", "p_type", "p_size")
    t(spark, dir, "lineitem").select("l_partkey", "l_suppkey")
      .join(broadcast(complaints), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** Q20-style excess-share suppliers (the nested correlated semi-join
   * chain): suppliers in region 2 who, for SOME red part, shipped more
   * than 30% of that part's total 1996 volume — supplier-share vs
   * per-part global aggregate, compared cross-multiplied in exact
   * integer quantities (`sp·10 > tot·3`), then collapsed to a supplier
   * id set and applied as a LEFT SEMI join (the IN → semi
   * decorrelation). The 1996 lineitem window is scanned twice (per-part
   * total needs ALL suppliers' volume, the share only red parts') —
   * both scans carry the pushed date filter and a 3-column projection;
   * materializing a year of fact rows to save the second scan would be
   * the wrong trade at 100 TB. */
  def q20ExcessSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val li96 = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select("l_partkey", "l_suppkey", "l_quantity")
    val ptot = li96.groupBy(col("l_partkey").as("t_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("tot_qty"))
    val redKeys = t(spark, dir, "part").filter(col("p_name").like("red %"))
      .select("p_partkey")
    val sp = li96.join(broadcast(redKeys), col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(col("l_quantity").cast("long")).as("sp_qty"))
    val excess = sp.join(ptot, col("l_partkey") === col("t_partkey"))
      .filter(col("sp_qty") * 10 > col("tot_qty") * 3)
      .select(col("l_suppkey")).distinct()
    t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation").filter(col("n_regionkey") === 2)),
        col("s_nationkey") === col("n_nationkey"))
      .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_name", "n_name")
  }

  /** KMV distinct-count sketch per return flag — the custom typed
   * `Aggregator` extension path (graft.functions.KmvDistinct, k=256):
   * fixed k·8-byte mergeable state per group, map-side partial
   * aggregation, one pass; exact below k distinct hashes, the
   * Beyer et al. (k−1)/u density estimate beyond. `exact_distinct`
   * rides along so the oracle row also pins the sketch's input set.
   * Oracle: [[HashOracleSql.kmvDistinct]] replays avalanche +
   * k-smallest selection in HUGEINT SQL. */
  def qKmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val kmv = udaf(new graft.functions.KmvDistinct(256),
      org.apache.spark.sql.Encoders.scalaLong)
    // Dedup (flag, partkey) BEFORE the sketch aggregate instead of
    // mixing count_distinct into the same agg: Spark's distinct-agg
    // rewrite would key the first partial aggregate on
    // (l_returnflag, l_partkey) and carry a KMV buffer PER PAIR —
    // ~200k 2KB Array[Long] buffers allocated, serialized and
    // exchanged (ObjectHashAggregate ×4). KMV keeps a SET of k-min
    // hashes (insert dedups), so kmv(distinct keys) ≡ kmv(all keys),
    // and count over the deduped pairs ≡ count_distinct. The dedup is
    // a codegen'd HashAggregate with map-side partials; only 3 KMV
    // buffers per task remain. Measured 1.12 → 0.38s (sf0.1, median
    // of 3); same two-exchange count, far fewer bytes (guide §2.3).
    t(spark, dir, "lineitem")
      .filter(col("l_partkey").isNotNull)
      .select("l_returnflag", "l_partkey")
      .dropDuplicates("l_returnflag", "l_partkey")
      .groupBy("l_returnflag")
      .agg(kmv(col("l_partkey")).as("kmv_distinct"),
        count(col("l_partkey")).as("exact_distinct"))
  }

  /** DuckDB fragment mirroring [[exactMoneySum]]'s 4-digit path: the
   * basis-point sum half-away-from-zero-rounded to cents in integer
   * space (DuckDB `//` truncates toward zero, so the sign is mirrored
   * exactly like the Spark side), then one double division. */
  private def bpsToMoneyOracle(sumExpr: String): String =
    s"round(CAST(CASE WHEN $sumExpr >= 0 THEN ($sumExpr + 50) // 100 " +
      s"ELSE -((-($sumExpr) + 50) // 100) END AS DOUBLE) / 100.0, 2)"

  private def bpsSum(expr: String): String =
    s"sum(CAST(round(($expr) * 10000) AS BIGINT))"

  /** All queries of this layer, keyed for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kmv_distinct" -> qKmvDistinct,
    "q_percentiles_sketch" -> qPercentilesSketch,
    "q17_small_quantity" -> q17SmallQuantity,
    "q10_returned_items" -> q10ReturnedItems,
    "q7_nation_volume" -> q7NationVolume,
    "q8_market_share" -> q8MarketShare,
    "q13_custdist" -> q13CustDist,
    "q14_promo_effect" -> q14PromoEffect,
    "q18_large_orders" -> q18LargeOrders,
    "q19_disjunctive" -> q19Disjunctive,
    "q12_late_lines" -> q12LateLines,
    "q15_top_supplier" -> q15TopSupplier,
    "q21_wait_suppliers" -> q21WaitSuppliers,
    "q22_idle_customers" -> q22IdleCustomers,
    "q2_min_cost_supplier" -> q2MinCostSupplier,
    "q9_product_profit" -> q9ProductProfit,
    "q11_important_parts" -> q11ImportantParts,
    "q16_supplier_cnt" -> q16SupplierCnt,
    "q20_excess_suppliers" -> q20ExcessSuppliers,
    "q_grouping_sets" -> qGroupingSets,
    "q_window_range_frame" -> qWindowRangeFrame,
    "q_window_lead_lag" -> qWindowLeadLag,
    "q_unpivot_measures" -> qUnpivotMeasures,
    "q_pivot" -> qPivot,
    "q_explode_tokens" -> qExplodeTokens,
    "q_json_props" -> qJsonProps,
    "q_asof_join" -> qAsofJoin,
    "q_range_join" -> qRangeJoin,
    "q_above_customer_avg" -> qAboveCustomerAvg,
    "q_intersect_except" -> qIntersectExcept,
    "q_array_agg" -> qArrayAgg,
    "q_cube_segment_nation" -> qCubeSegmentNation,
    "q_percentiles" -> qPercentiles,
    "q1_pricing_summary" -> q1PricingSummary,
    "q6_forecast_revenue" -> q6ForecastRevenue,
    "q3_shipping_priority" -> q3ShippingPriority,
    "q4_order_priority" -> q4OrderPriority,
    "q5_local_supplier" -> q5LocalSupplier,
    "q_window_top_per_supplier" -> qWindowTopPerSupplier,
    "q_window_running_revenue" -> qWindowRunningRevenue,
    "q_topk_expensive" -> qTopKExpensive,
    "q_distinct_segments" -> qDistinctSegments,
    "q_union_keys" -> qUnionKeys,
    "q_anti_no_orders" -> qAntiNoOrders,
    "q_rollup_segment_nation" -> qRollupSegmentNation,
    "q_scalar_functions" -> qScalarFunctions,
    "q_date_parts" -> qDateParts,
    "q_events_hourly" -> qEventsHourly,
    "q_events_sliding" -> qEventsSliding,
    "q_events_sessions" -> qEventsSessions,
    "q_events_funnel" -> qEventsFunnel,
    "q_events_retention" -> qEventsRetention)

  /** DuckDB oracle SQL, column-name aligned with the Spark plans. */
  val oracleSql: Map[String, String] = Map(
    "q_kmv_distinct" -> HashOracleSql.kmvDistinct,
    "q12_late_lines" ->
      """SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
         GROUP BY 1""",
    "q15_top_supplier" ->
      ("""WITH rev AS (
           SELECT l_suppkey,
             """ + bpsToMoneyOracle(bpsSum("l_extendedprice * (1 - l_discount)")) + """ AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1996-04-01'
           GROUP BY 1)
         SELECT s_suppkey, s_name, total_revenue
         FROM rev JOIN supplier ON l_suppkey = s_suppkey
         WHERE total_revenue = (SELECT max(total_revenue) FROM rev)"""),
    "q21_wait_suppliers" ->
      """SELECT s_name, count(*) AS numwait
         FROM lineitem l1
         JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
         JOIN supplier ON s_suppkey = l1.l_suppkey
         WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY 1""",
    "q22_idle_customers" ->
      """WITH s AS (SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS tot_cents,
                    count(*) AS n_pos
                  FROM customer WHERE c_acctbal > 0)
         SELECT c_nationkey, count(*) AS numcust,
           round(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2)
             AS totacctbal
         FROM customer, s
         WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n_pos > tot_cents
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderdate >= TIMESTAMP '2000-06-01')
         GROUP BY 1""",
    "q2_min_cost_supplier" ->
      """WITH sup_eu AS (
           SELECT s_suppkey, s_name, s_acctbal, n_name
           FROM supplier JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'EUROPE'),
         rsupply AS (
           SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
           FROM lineitem JOIN sup_eu ON l_suppkey = s_suppkey
           GROUP BY 1, 2)
         SELECT s_acctbal, s_name, n_name, p_partkey, cost
         FROM rsupply JOIN sup_eu ON l_suppkey = s_suppkey
         JOIN part ON l_partkey = p_partkey
         WHERE p_size = 15
           AND cost = (SELECT min(cost) FROM rsupply r2
                       WHERE r2.l_partkey = rsupply.l_partkey)""",
    "q9_product_profit" ->
      ("""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           """ + bpsToMoneyOracle(bpsSum(
             "l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity")) + """ AS profit
         FROM lineitem JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN orders ON l_orderkey = o_orderkey
         WHERE p_name LIKE 'red %'
         GROUP BY 1, 2"""),
    "q11_important_parts" ->
      """WITH pv AS (
           SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(l_quantity AS BIGINT)) AS BIGINT) AS val_cents
           FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           WHERE s_nationkey = 3
           GROUP BY 1)
         SELECT l_partkey, val_cents
         FROM pv, (SELECT sum(val_cents) AS tot_cents FROM pv) t
         WHERE val_cents * 500 > tot_cents""",
    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         GROUP BY 1, 2, 3""",
    "q20_excess_suppliers" ->
      """WITH ptot AS (
           SELECT l_partkey, sum(CAST(l_quantity AS BIGINT)) AS tot_qty
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01'
           GROUP BY 1),
         sp AS (
           SELECT l_suppkey, l_partkey, sum(CAST(l_quantity AS BIGINT)) AS sp_qty
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_name LIKE 'red %'
             AND l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01'
           GROUP BY 1, 2)
         SELECT s_name, n_name
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         WHERE n_regionkey = 2
           AND s_suppkey IN (
             SELECT l_suppkey FROM sp JOIN ptot USING (l_partkey)
             WHERE sp_qty * 10 > tot_qty * 3)""",
    "q17_small_quantity" ->
      """WITH pk AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'),
         pp AS (SELECT l_partkey,
                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
                  count(*) AS qty_n
                FROM lineitem JOIN pk ON l_partkey = p_partkey
                GROUP BY l_partkey)
         SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS small_qty_revenue,
           count(*) AS n_lineitems
         FROM lineitem JOIN pp USING (l_partkey)
         WHERE CAST(l_quantity AS BIGINT) * qty_n * 5 < qty_sum""",
    "q10_returned_items" ->
      ("""WITH r AS (
           SELECT o_custkey,
             """ + bpsToMoneyOracle(bpsSum("l_extendedprice * (1 - l_discount)")) + """ AS revenue
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE l_returnflag = 'R'
             AND o_orderdate >= TIMESTAMP '1996-10-01'
             AND o_orderdate < TIMESTAMP '1997-01-01'
           GROUP BY 1)
         SELECT c_custkey, c_name, revenue, c_acctbal, n_name
         FROM r JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
         ORDER BY revenue DESC, c_custkey LIMIT 20"""),
    "q7_nation_volume" ->
      ("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(YEAR FROM l_shipdate) AS l_year,
           """ + bpsToMoneyOracle(bpsSum("l_extendedprice * (1 - l_discount)")) + """ AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
           AND l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
         GROUP BY 1, 2, 3"""),
    "q8_market_share" ->
      ("""WITH s AS (
           SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
             """ + bpsToMoneyOracle(bpsSum(
                "CASE WHEN n1.n_name = 'NATION_2' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")) + """ AS nation_revenue,
             """ + bpsToMoneyOracle(bpsSum("l_extendedprice * (1 - l_discount)")) + """ AS total_revenue
           FROM lineitem JOIN part ON l_partkey = p_partkey
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation n1 ON s_nationkey = n1.n_nationkey
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
                JOIN region ON n2.n_regionkey = r_regionkey
           WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
             AND o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1998-01-01'
           GROUP BY 1)
         SELECT o_year, nation_revenue, total_revenue,
           round(nation_revenue / total_revenue, 6) AS mkt_share
         FROM s"""),
    "q13_custdist" ->
      """WITH pc AS (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           GROUP BY 1)
         SELECT c_count, count(*) AS custdist FROM pc GROUP BY 1""",
    "q14_promo_effect" ->
      ("""WITH s AS (
           SELECT
             """ + bpsToMoneyOracle(bpsSum(
                "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")) + """ AS promo_revenue,
             """ + bpsToMoneyOracle(bpsSum("l_extendedprice * (1 - l_discount)")) + """ AS total_revenue
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1996-09-01'
             AND l_shipdate < TIMESTAMP '1996-10-01')
         SELECT promo_revenue, total_revenue,
           round(100 * promo_revenue / total_revenue, 6) AS promo_pct
         FROM s"""),
    "q18_large_orders" ->
      """WITH big AS (
           SELECT l_orderkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
           FROM lineitem GROUP BY 1
           HAVING sum(CAST(l_quantity AS BIGINT)) > 300)
         SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           total_qty
         FROM big JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey""",
    "q19_disjunctive" ->
      ("""SELECT
           """ + bpsToMoneyOracle(bpsSum("l_extendedprice * (1 - l_discount)")) + """ AS revenue,
           count(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 20 AND 30)"""),
    "q_window_lead_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice, 1) OVER w AS prev_price,
           lead(o_totalprice, 1) OVER w AS next_price,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
         FROM orders WHERE o_custkey % 10 = 0
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey)""",
    "q_unpivot_measures" ->
      """SELECT l_orderkey, l_linenumber, measure, value FROM (
           SELECT l_orderkey, l_linenumber,
             'price' AS measure, l_extendedprice AS value FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-06-01'
             AND l_shipdate < TIMESTAMP '1996-07-01'
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'discount', l_discount
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-06-01'
             AND l_shipdate < TIMESTAMP '1996-07-01'
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-06-01'
             AND l_shipdate < TIMESTAMP '1996-07-01')""",
    "q_grouping_sets" ->
      """SELECT c_mktsegment, c_nationkey, count(*) AS n_cust,
           CAST(grouping(c_mktsegment) * 2 + grouping(c_nationkey) AS BIGINT) AS gid
         FROM customer
         GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))""",
    "q_window_range_frame" ->
      """WITH y AS (
           SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
             round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS year_total
           FROM orders GROUP BY 1)
         SELECT o_year, year_total,
           round(sum(year_total) OVER (ORDER BY o_year
             RANGE BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS trailing_3y
         FROM y""",
    "q_pivot" ->
      """SELECT year(o_orderdate) AS order_year,
         nullif(count(*) FILTER (o_orderpriority LIKE '1%'), 0) AS prio_1,
         nullif(count(*) FILTER (o_orderpriority LIKE '2%'), 0) AS prio_2,
         nullif(count(*) FILTER (o_orderpriority LIKE '3%'), 0) AS prio_3,
         nullif(count(*) FILTER (o_orderpriority LIKE '4%'), 0) AS prio_4,
         nullif(count(*) FILTER (o_orderpriority LIKE '5%'), 0) AS prio_5
         FROM orders GROUP BY year(o_orderdate)""",
    "q_explode_tokens" ->
      """SELECT doc_id, CAST(pos AS BIGINT) AS pos, token
         FROM (SELECT doc_id,
                 unnest(regexp_split_to_array(text, '\s+')) AS token,
                 unnest(range(1, 1 + len(regexp_split_to_array(text, '\s+')))) AS pos
               FROM documents WHERE doc_id % 20 = 0)
         WHERE len(token) > 0""",
    "q1_pricing_summary" ->
      ("""SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS sum_base_price,
         """ + bpsToMoneyOracle(bpsSum("l_extendedprice * (1 - l_discount)")) + """ AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         round(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*), 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus"""),
    "q6_forecast_revenue" ->
      ("SELECT " + bpsToMoneyOracle(bpsSum("l_extendedprice * l_discount")) + """ AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""),
    "q3_shipping_priority" ->
      ("""SELECT l_orderkey, o_orderpriority,
         """ + bpsToMoneyOracle(bpsSum("l_extendedprice * (1 - l_discount)")) + """ AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-03-15'
           AND l_shipdate > TIMESTAMP '1998-03-15'
         GROUP BY l_orderkey, o_orderpriority"""),
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-07-01'
           AND o_orderdate < TIMESTAMP '1996-10-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate < TIMESTAMP '1998-01-01')
         GROUP BY o_orderpriority""",
    "q5_local_supplier" ->
      ("""SELECT n_name,
         """ + bpsToMoneyOracle(bpsSum("l_extendedprice * (1 - l_discount)")) + """ AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name"""),
    "q_window_top_per_supplier" ->
      """SELECT * FROM (
           SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_suppkey
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
           FROM lineitem) WHERE rn <= 3""",
    "q_window_running_revenue" ->
      """SELECT o_year, year_total,
           round(sum(year_total) OVER (ORDER BY o_year
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
         FROM (SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
                 round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS year_total
               FROM orders GROUP BY 1)""",
    "q_topk_expensive" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""",
    "q_distinct_segments" ->
      "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    "q_union_keys" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         UNION
         SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000""",
    "q_anti_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q_rollup_segment_nation" ->
      """SELECT c_mktsegment, c_nationkey, count(*) AS n_cust,
         CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_bal
         FROM customer GROUP BY ROLLUP (c_mktsegment, c_nationkey)""",
    "q_scalar_functions" ->
      """SELECT p_partkey,
         upper(substring(p_name, 1, 8)) AS name_prefix,
         length(p_name) AS name_len,
         CASE WHEN p_size < 10 THEN 'small'
              WHEN p_size < 30 THEN 'medium' ELSE 'large' END AS size_class,
         round(p_retailprice * 1.1, 2) AS inflated_price,
         abs(p_size - 25) AS size_dist,
         p_brand || '|' || p_type AS brand_type
         FROM part""",
    "q_date_parts" ->
      """SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
         EXTRACT(QUARTER FROM o_orderdate) AS o_quarter,
         count(*) AS n_orders, CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
         FROM orders GROUP BY 1, 2""",
    "q_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
         event_type, count(*) AS n, CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2""",
    "q_events_sliding" ->
      """WITH w AS (SELECT event_type, value,
           time_bucket(INTERVAL 30 MINUTE, ts) - (k * INTERVAL 30 MINUTE) AS ws
         FROM events, (SELECT unnest(range(0, 4)) AS k))
         SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
         FROM w GROUP BY 1, 2""",
    "q_json_props" ->
      """SELECT event_type, count(*) AS n,
           CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           max(CAST(props->>'$.k' AS BIGINT)) AS max_k,
           CAST(count(DISTINCT CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS n_distinct_k
         FROM events GROUP BY event_type""",
    "q_asof_join" ->
      """SELECT c.user_id, c.event_id, epoch_us(c.ts) AS click_us,
           p.event_id AS purch_event_id, epoch_us(p.ts) AS purch_us,
           p.value AS purch_value,
           epoch_us(c.ts) - epoch_us(p.ts) AS lag_us
         FROM (SELECT * FROM events WHERE event_type='click') c
         ASOF JOIN (SELECT * FROM events WHERE event_type='purchase') p
           ON c.user_id = p.user_id AND c.ts >= p.ts""",
    "q_array_agg" ->
      """SELECT l_orderkey, to_json(list_sort(list(l_quantity))) AS qtys,
           count(*) AS n_items, max(l_quantity) AS max_qty
         FROM lineitem GROUP BY l_orderkey""",
    "q_intersect_except" ->
      """WITH b95 AS (SELECT o_custkey AS custkey FROM orders
           WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'),
         b96 AS (SELECT o_custkey AS custkey FROM orders
           WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01')
         SELECT custkey, 'both' AS tag FROM (SELECT custkey FROM b95 INTERSECT SELECT custkey FROM b96)
         UNION ALL
         SELECT custkey, 'only_1995' AS tag FROM (SELECT custkey FROM b95 EXCEPT SELECT custkey FROM b96)""",
    "q_above_customer_avg" ->
      """WITH pc AS (
           SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,4))) AS total,
                  count(*) AS n
           FROM orders GROUP BY o_custkey)
         SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
         FROM orders o JOIN pc ON o.o_custkey = pc.o_custkey
         WHERE CAST(o.o_totalprice AS DECIMAL(18,4)) * n > total * 2""",
    "q_cube_segment_nation" ->
      """SELECT c_mktsegment, c_nationkey, count(*) AS n_cust,
         CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_bal
         FROM customer GROUP BY CUBE (c_mktsegment, c_nationkey)""",
    "q_percentiles" ->
      """SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
         FROM lineitem GROUP BY l_returnflag""",
    // same oracle as q_percentiles: the sketch-guided bounded-state
    // path must reproduce the exact interpolated quartiles
    "q_percentiles_sketch" ->
      """SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
         FROM lineitem GROUP BY l_returnflag""",
    "q_range_join" ->
      """SELECT e.user_id, e.event_id AS err_event_id,
           c.event_id AS click_event_id,
           epoch_us(c.ts) - epoch_us(e.ts) AS delta_us
         FROM events e JOIN events c
           ON e.user_id = c.user_id
          AND e.event_type = 'error' AND c.event_type = 'click'
          AND epoch_us(c.ts) >= epoch_us(e.ts)
          AND epoch_us(c.ts) <= epoch_us(e.ts) + 21600000000""",
    "q_events_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         g AS (SELECT user_id, us,
                 lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
               FROM e)
         SELECT user_id,
           CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 30*60*1000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
           count(*) AS n_events
         FROM g GROUP BY user_id""",
    "q_events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         v AS (SELECT user_id,
                 min(CASE WHEN event_type = 'view' THEN us END) AS v_us
               FROM e GROUP BY 1),
         c AS (SELECT e.user_id, min(v_us) AS v_us,
                 min(CASE WHEN event_type = 'click' AND us >= v_us THEN us END) AS c_us
               FROM e JOIN v USING (user_id) GROUP BY 1),
         p AS (SELECT e.user_id, min(v_us) AS v_us, min(c_us) AS c_us,
                 min(CASE WHEN event_type = 'purchase' AND us >= c_us THEN us END) AS p_us
               FROM e JOIN c USING (user_id) GROUP BY 1)
         SELECT count(*) AS n_users, count(v_us) AS n_viewed,
           count(c_us) AS n_clicked_after_view,
           count(p_us) AS n_purchased_after_click
         FROM p""",
    "q_events_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
         f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1)
         SELECT cohort_day, date_diff('day', cohort_day, day) AS day_offset,
           count(DISTINCT user_id) AS n_active
         FROM e JOIN f USING (user_id)
         WHERE date_diff('day', cohort_day, day) <= 7
         GROUP BY 1, 2""")
}
