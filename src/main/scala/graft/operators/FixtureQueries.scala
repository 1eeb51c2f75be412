package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational fixture queries demonstrating the operator classes of
  * SURVEY.md §2 over the driver's TPC-H-ish parquet fixtures
  * (/root/testdata/sf*). Each query has a DuckDB oracle in
  * [[FixtureQueries.oracleSql]] with IDENTICAL column aliases.
  *
  * Float determinism: double sums are order-dependent, so every SUM over a
  * double column first casts to DECIMAL (exact, associative) and the final
  * result is cast back to DOUBLE — both engines then produce bit-identical
  * values regardless of row order or partitioning.
  *
  * Scale notes (100 TB design): every query is a pure declarative plan —
  * filters/projection reach the parquet scan, small dims are broadcast,
  * aggregations run partial+final, and no driver-side collect exists.
  */
object FixtureQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Canonical events reader: normalizes `ts` to a UTC TIMESTAMP
    * regardless of how the fixture stored it. Driver generations have
    * varied — TIMESTAMP(NANOS) (reads back as nanos LongType under the
    * legacy conf, or TIMESTAMP_NTZ without it) and TIMESTAMP(MICROS)
    * (reads back as TIMESTAMP_NTZ under `inferTimestampNTZ`, default
    * on) — so dispatch on the type that actually arrived instead of
    * assuming one. Session tz is pinned to UTC here because the
    * NTZ→LTZ cast interprets the wall-clock in session tz; pinning it
    * makes epoch values deterministic and equal to DuckDB's naive
    * `epoch_us(ts)`, which is what every oracle assumes. All
    * events-reading code (queries AND specs) must come through here —
    * never read events.parquet with a hand-rolled ts conversion. */
  private[graft] def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos-as-long era
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType => // micros era
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw // already a plain TIMESTAMP
    }
  }

  // ---------------------------------------------------------------- A1
  /** Hash aggregation (partial+final) — SURVEY §2.6 A1.
    * Demonstrates groupBy count/sum over the fact table. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  // ---------------------------------------------------------------- J1
  /** Left outer join + null-tolerant agg — SURVEY §2.3 J1 (ALTER→table link).
    * orders LEFT JOIN customer, revenue per market segment (null segment
    * for orphan orders kept, like unmatched ALTER statements). */
  def q2LeftJoin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"), "left")
      .groupBy(coalesce(col("c_mktsegment"), lit("UNMATCHED")).as("segment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_price"))
      .orderBy("segment")
  }

  /** Anti join (unmatched side of J1: warning for ALTER with no table). */
  def q2bAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_customers_without_orders"))
  }

  // ---------------------------------------------------------------- J3
  /** Broadcast-dimension join — SURVEY §2.3 J3 (type-mapping lookup).
    * nation ⋈ region with an explicit broadcast hint (the mapping dim is
    * tiny; at 100 TB the dim stays broadcast, the fact side never shuffles
    * for this join). */
  def q3BroadcastJoin(s: SparkSession, dir: String): DataFrame = {
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    val c = t(s, dir, "customer")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_acctbal"))
      .orderBy("r_name")
  }

  // ---------------------------------------------------------------- J2/O2
  /** Fill-forward last-value window — SURVEY §2.3 J2 / §2.7 O2
    * (DISTRIBUTE BY HASH applies to most recent table = as-of semantics).
    * For each user's event ordered by time, carry forward the last
    * non-null "purchase" value. */
  def q4FillForward(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("purchase_value",
        when(col("event_type") === "purchase", col("value")))
      .withColumn("last_purchase_value",
        last(col("purchase_value"), ignoreNulls = true).over(w))
      .groupBy(col("user_id"))
      .agg(
        sum(col("last_purchase_value").cast("decimal(18,4)")).cast("double")
          .as("sum_carried"),
        count(col("last_purchase_value")).as("n_carried"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------- M1-M20
  /** Multi-branch CASE projection with arithmetic guards — SURVEY §2.5
    * (the type-mapping ruleset shape: conditional rewrite + clamping). */
  def q5CaseRules(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .withColumn("size_class",
        when(col("p_size") > 40, lit("JUMBO"))
          .when(col("p_size") > 25, lit("LARGE"))
          .when(col("p_size") > 10, lit("MEDIUM"))
          .otherwise(lit("SMALL")))
      .withColumn("mapped_size", least(col("p_size"), lit(38)))
      .withColumn("price_band",
        when(col("p_retailprice") >= 1500.0, lit("PREMIUM"))
          .when(col("p_retailprice") >= 1000.0, lit("STANDARD"))
          .otherwise(lit("BUDGET")))
      .groupBy(col("size_class"), col("price_band"))
      .agg(
        count(lit(1)).as("n_parts"),
        sum(col("mapped_size")).cast("bigint").as("sum_mapped_size"))
      .orderBy("size_class", "price_band")

  // ---------------------------------------------------------------- A2
  /** Conditional penalty sum + clamp — SURVEY §2.6 A2 (readiness score
    * = max(0, 100 - Σpenalty)). Orders accrue penalties by status /
    * priority / price; score clamped at 0. */
  def q6PenaltyScore(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("penalty",
        when(col("o_orderstatus") === "F", lit(10)).otherwise(lit(0)) +
        when(col("o_orderpriority") === "1-URGENT", lit(25)).otherwise(lit(0)) +
        when(col("o_totalprice") > 200000.0, lit(50)).otherwise(lit(0)))
      .groupBy(col("o_custkey"))
      .agg(greatest(lit(0), lit(100) - sum(col("penalty"))).cast("bigint")
        .as("readiness_score"))
      .groupBy(col("readiness_score"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("readiness_score")

  // ---------------------------------------------------------------- A9
  /** Multi-conditional feature counts — SURVEY §2.6 A9 (feature-usage
    * rollup: one pass, many sum(when(...)) columns). */
  def q7FeatureCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .agg(
        sum(when(col("p_type").contains("BRASS"), 1).otherwise(0)).cast("bigint").as("n_brass"),
        sum(when(col("p_type").contains("STEEL"), 1).otherwise(0)).cast("bigint").as("n_steel"),
        sum(when(col("p_size") >= 30, 1).otherwise(0)).cast("bigint").as("n_large"),
        sum(when(col("p_brand") === "Brand#11", 1).otherwise(0)).cast("bigint").as("n_brand11"),
        count(lit(1)).as("n_total"))

  // ---------------------------------------------------------------- O1
  /** Ordered string aggregation — SURVEY §2.7 O1 (DDL rendering: lines
    * joined in definition order). Per order: line numbers concatenated in
    * order. Implemented distribution-safely: collect_list of (pos, item)
    * structs, array_sort by pos, then join — never relies on row order
    * surviving the shuffle. */
  def q8OrderedAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(array_join(
          transform(
            // l_linenumber is NOT unique within an order in the fixture —
            // sort by (linenumber, partkey) so ties are deterministic.
            array_sort(collect_list(struct(col("l_linenumber"), col("l_partkey")))),
            x => x.getField("l_partkey").cast("string")),
          ",").as("parts_in_order"))
      .orderBy("l_orderkey")

  // ---------------------------------------------------------------- §2.7
  /** Rank per group — SURVEY §2.7 (analytic window generalization). Top-3
    * orders by price per priority with deterministic tie-break. */
  def q9Rank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_orderpriority"), col("rk"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy("o_orderpriority", "rk")
  }

  /** Frame-bounded running sum — SURVEY §2.7 (frame-spec window). RANGE
    * frame (not ROWS): l_linenumber has ties in the fixture, and a RANGE
    * frame includes all peers, keeping the result order-independent. */
  def q10RunningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "lineitem")
      .withColumn("running_qty",
        sum(col("l_quantity").cast("decimal(18,2)")).over(w).cast("double"))
      .select(col("l_orderkey"), col("l_linenumber"), col("running_qty"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // ---------------------------------------------------------------- §2.8
  /** Set operations — SURVEY §2.8 (union of render branches / except).
    * Customers in the union of two overlapping segment splits minus a
    * third set; distinct semantics like SQL UNION/EXCEPT. */
  def q11SetOps(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val a = c.filter(col("c_acctbal") > 1000.0).select(col("c_custkey"))
    val b = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val x = c.filter(col("c_nationkey") < 5).select(col("c_custkey"))
    a.union(b).distinct().except(x)
      .agg(count(lit(1)).as("n_keys"),
        sum(col("c_custkey")).cast("bigint").as("sum_keys"))
  }

  // ---------------------------------------------------------------- §2.9
  /** Scalar function sweep — SURVEY §2.9 (string/date/JSON scalars over
    * events.props JSON column). */
  def q12Scalars(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      // day as a STRING: a date column would hash differently from
      // DuckDB's (date vs datetime64 representation ambiguity).
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("etype_up", upper(trim(col("event_type"))))
      .withColumn("dev", get_json_object(col("props"), "$.k"))
      .groupBy(col("day"), col("etype_up"), col("dev"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy("day", "etype_up", "dev")

  // ---------------------------------------------------------------- S2
  /** Split + posexplode — SURVEY §2.1 S2 (statement splitter shape:
    * one-to-many with ordinal preservation). */
  def q13SplitExplode(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"), posexplode(split(col("p_name"), " ")))
      .withColumnRenamed("pos", "word_pos")
      .withColumnRenamed("col", "word")
      .groupBy(col("word_pos"), col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy("word_pos", "word")

  // ---------------------------------------------------------------- J4
  /** Theta (contains) join — SURVEY §2.3 J4 (issue→table substring
    * re-attachment). Joins part types against a tiny derived dimension of
    * material words on substring containment — broadcast nested-loop by
    * design (dim is tiny; fact side streams). */
  def q14ThetaJoin(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    val words = p.select(explode(split(col("p_name"), " ")).as("w"))
      .filter(col("w").isin("red", "blue", "small", "hot", "green"))
      .distinct()
    p.join(broadcast(words), col("p_name").contains(col("w")))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_parts"))
      .orderBy("w")
  }

  // ---------------------------------------------------------------- A4-A6
  /** Rollup aggregation — SURVEY §2.6 note (per-schema ∪ per-table report
    * = one rollup): revenue rollup over region→nation. */
  def q15Rollup(s: SparkSession, dir: String): DataFrame = {
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    val c = t(s, dir, "customer")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  // ---------------------------------------------------------------- §2.10
  /** Event-time sessionization via the built-in session_window (30-min
    * gap) — the same plan streams with a watermark
    * (graft.streaming.StreamingOps.sessionAgg). Durations summed in
    * exact integer microseconds. Oracle: gaps-and-islands SQL. */
  def q26Sessions(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingOps.sessionAgg(events(s, dir), "30 minutes")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).cast("bigint").as("n_events"),
        // session_window.end = last event + gap; subtract the gap back
        sum(unix_micros(col("session_end")) - unix_micros(col("session_start"))
          - lit(1800000000L)).cast("bigint").as("total_session_us"))
      .orderBy("user_id")

  // ---------------------------------------------------------------- skew
  /** Two-stage salted aggregation (hot-key mitigation): algebraic
    * aggs make the result EXACTLY equal to the plain groupBy, so the
    * plain SQL is the oracle — only the shuffle layout differs. */
  def q28SaltedAgg(s: SparkSession, dir: String): DataFrame =
    Skew.saltedAgg(t(s, dir, "lineitem"), "l_returnflag", saltBuckets = 16,
      Seq(col("l_quantity") -> "sum_qty", col("l_extendedprice") -> "sum_price"))
      .orderBy("l_returnflag")

  /** Salted equi-join (hot-key spread): lineitem's 3-value returnflag
    * is the canonical pathological join key — every row lands on 3
    * reducers in a plain shuffle join. [[Skew.saltedJoin]] spreads each
    * key over 16 salt buckets; the result equals the plain join, so
    * the plain-join SQL is the oracle. */
  def q37SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val dim = li.select(col("l_returnflag")).distinct()
      .withColumn("flag_label", concat(lit("flag_"), lower(col("l_returnflag"))))
    Skew.saltedJoin(li, dim, Seq("l_returnflag"), saltBuckets = 16)
      .groupBy(col("flag_label"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy("flag_label")
  }

  /** CUBE rollup (multi-dimensional report generalization of the
    * per-schema/per-table report, SURVEY §2.6 note). */
  def q29Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  // ---------------------------------------------------------------- J2 gen.
  /** Keyed backward as-of join (general form of the J2/O2 "most recent
    * preceding wins" linkage): attach to each purchase the latest prior
    * view of the same user, then roll up uplift per user. One
    * union+window shuffle — no range-join explosion (see
    * [[AsOfJoin]]). Oracle: DuckDB ASOF LEFT JOIN. */
  def q32AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    // dedup right side per (key, ts): AsOfJoin determinism contract
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("v_value"))
    AsOfJoin.backward(purchases, views, key = Seq("user_id"),
        leftTs = "ts", rightTs = "ts", payload = Seq("v_value"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_purchases"),
        count(col("v_value")).as("n_matched"),
        sum((col("value") - col("v_value")).cast("decimal(18,4)"))
          .cast("double").as("sum_uplift"))
      .orderBy("user_id")
  }

  /** Bucketed interval join (range join on the time axis): views
    * landing inside any [purchase, purchase+1h) window of the same
    * user. Time is coarsened into the equi-join key (1 h buckets) so
    * fanout tracks local density, not per-user interval count (see
    * [[RangeJoin]]). Oracle: plain inequality join. */
  def q33RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).withColumn("us", unix_micros(col("ts")))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("us"))
    val windows = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us").as("w_start"),
        (col("us") + lit(3600000000L)).as("w_end"))
    RangeJoin.pointsInIntervals(views, windows, key = Seq("user_id"),
        pointCol = "us", startCol = "w_start", endCol = "w_end",
        bucketWidth = 3600000000L)
      .groupBy(col("user_id"))
      .agg(
        countDistinct(col("event_id")).as("n_views_in_window"),
        count(lit(1)).as("n_view_window_pairs"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------- §2.6 gen.
  /** Exact per-group quantiles via [[Quantiles.exactQuantiles]] — the
    * two-level bucket-histogram form whose selection sort touches only
    * the bracketing buckets (see that operator's doc for why neither
    * built-in `percentile()` nor a per-group window sort survives
    * 100 TB group sizes). Hash-matches DuckDB quantile_cont. */
  def q34Quantiles(s: SparkSession, dir: String): DataFrame =
    Quantiles.exactQuantiles(
        t(s, dir, "lineitem"), "l_returnflag", "l_extendedprice",
        ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75))
      .orderBy("l_returnflag")

  /** Pivot (A3's conditional-aggregation family as a first-class
    * operator): status columns from groupBy().pivot() with explicit
    * value list — compiles to the same conditional sums the oracle
    * spells out. */
  def q35Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double"))
      .withColumnRenamed("F", "qty_f")
      .withColumnRenamed("O", "qty_o")
      .orderBy("l_returnflag")

  /** lag/lead window functions (§2.7): inter-event gaps per user. */
  def q36LagGaps(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).withColumn("us", unix_micros(col("ts")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    e.withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(
        count(col("gap")).as("n_gaps"),
        sum(col("gap")).cast("bigint").as("sum_gap_us"),
        max(col("gap")).cast("bigint").as("max_gap_us"))
      .orderBy("user_id")
  }

  /** SCD2/CDC compaction (§2 pipeline ops): treat events as a
    * changelog of (user, event_type) and build validity intervals with
    * [[Cdc.scd2]]; roll up version counts, covered time and the
    * current version per key. The window key is high-cardinality, so
    * per-key sorts stay bounded at any scale. */
  def q45Scd2(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).withColumn("us", unix_micros(col("ts")))
      .select(col("user_id"), col("event_type"), col("us"),
        col("event_id"), col("value"))
    Cdc.scd2(e, Seq("user_id", "event_type"), "us", "event_id")
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        count(lit(1)).as("n_versions"),
        coalesce(sum(col("valid_to") - col("valid_from")), lit(0L))
          .cast("bigint").as("covered_us"),
        max(when(col("is_current"), col("us"))).cast("bigint").as("cur_us"),
        max(when(col("is_current"), col("value"))).as("cur_value"))
      .orderBy("user_id", "event_type")
  }

  // ---------------------------------------------------------------- sketches
  /** Sketch aggregates (SURVEY §2.6 note: the engine exposes Spark's
    * approximate aggregates as the scale path for distinct counts and
    * quantiles — mergeable, bounded-memory, one pass). Rows-only check
    * (sketches are engine-specific); SketchSpec asserts the error
    * bounds against the exact values. */
  def q38Sketches(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("approx_median"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  // ---------------------------------------------------------------- M1-M17
  /** DB2 type names for the ruleset domain, indexed by p_partkey
    * (includes an unknown type to hit the fallback rule). */
  private val TypeDomain = Seq(
    "SMALLINT", "INTEGER", "INT", "BIGINT", "DECIMAL", "DEC", "NUMERIC",
    "REAL", "FLOAT", "DOUBLE", "DECFLOAT", "CHAR", "CHARACTER", "VARCHAR",
    "LONG VARCHAR", "CLOB", "GRAPHIC", "VARGRAPHIC", "LONG VARGRAPHIC",
    "DBCLOB", "BINARY", "VARBINARY", "BLOB", "DATE", "TIME", "TIMESTAMP",
    "XML", "ROWID", "BOOLEAN", "WIDGET")

  /** The full M1-M17 type-mapping ruleset as ONE Catalyst CASE
    * projection (SURVEY.md §2.5) over type specs synthesized
    * deterministically from `part` — every branch (size limits,
    * precision clamps, defaults, FOR BIT DATA override, unknown-type
    * fallback) exercised, grouped by outcome. */
  def q27TypeRules(s: SparkSession, dir: String): DataFrame = {
    import graft.mapping.TypeRulesColumns
    val p = t(s, dir, "part")
      .withColumn("type_name",
        element_at(array(TypeDomain.map(lit): _*), (pmod(col("p_partkey"), lit(30)) + 1).cast("int")))
      .withColumn("len",
        when(pmod(col("p_partkey"), lit(3)) === 0, lit(null).cast("int"))
          .otherwise(col("p_size") * 1200000))
      .withColumn("prec",
        when(pmod(col("p_partkey"), lit(4)) === 0, lit(null).cast("int"))
          .otherwise(col("p_size")))
      .withColumn("sc",
        when(pmod(col("p_partkey"), lit(5)) === 0, lit(null).cast("int"))
          .otherwise(pmod(col("p_size"), lit(10)).cast("int")))
      .withColumn("for_bit", pmod(col("p_partkey"), lit(11)) === 0)
    p.select(
        TypeRulesColumns.targetType(col("type_name"), col("len"), col("prec"), col("sc"), col("for_bit")).as("target_type"),
        TypeRulesColumns.status(col("type_name"), col("len"), col("prec"), col("sc"), col("for_bit")).as("status"),
        TypeRulesColumns.ewiCode(col("type_name"), col("len"), col("prec"), col("sc"), col("for_bit")).as("ewi_code"))
      .groupBy("target_type", "status", "ewi_code")
      .agg(count(lit(1)).as("n"))
      .orderBy("target_type", "status", "ewi_code")
  }

  /** Oracle SQL (DuckDB dialect, ANSI where possible). Aliases match the
    * Spark side exactly — the driver sorts columns by name before hashing. */
  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q2_left_join" ->
      """SELECT coalesce(c_mktsegment, 'UNMATCHED') AS segment,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q2b_anti_join" ->
      """SELECT count(*) AS n_customers_without_orders
        |FROM customer WHERE NOT EXISTS
        |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q3_broadcast_join" ->
      """SELECT r_name, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q4_fill_forward" ->
      """WITH e AS (
        |  SELECT user_id,
        |    last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS last_purchase_value
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(CAST(last_purchase_value AS DECIMAL(18,4))) AS DOUBLE) AS sum_carried,
        |  count(last_purchase_value) AS n_carried
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "q5_case_rules" ->
      """SELECT
        |  CASE WHEN p_size > 40 THEN 'JUMBO' WHEN p_size > 25 THEN 'LARGE'
        |       WHEN p_size > 10 THEN 'MEDIUM' ELSE 'SMALL' END AS size_class,
        |  CASE WHEN p_retailprice >= 1500.0 THEN 'PREMIUM'
        |       WHEN p_retailprice >= 1000.0 THEN 'STANDARD'
        |       ELSE 'BUDGET' END AS price_band,
        |  count(*) AS n_parts,
        |  CAST(sum(least(p_size, 38)) AS BIGINT) AS sum_mapped_size
        |FROM part GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q6_penalty_score" ->
      """WITH per_cust AS (
        |  SELECT o_custkey,
        |    CAST(greatest(0, 100 - sum(
        |      (CASE WHEN o_orderstatus = 'F' THEN 10 ELSE 0 END) +
        |      (CASE WHEN o_orderpriority = '1-URGENT' THEN 25 ELSE 0 END) +
        |      (CASE WHEN o_totalprice > 200000.0 THEN 50 ELSE 0 END))) AS BIGINT)
        |      AS readiness_score
        |  FROM orders GROUP BY 1)
        |SELECT readiness_score, count(*) AS n_customers
        |FROM per_cust GROUP BY 1 ORDER BY 1""".stripMargin,
    "q7_feature_counts" ->
      """SELECT
        |  CAST(sum(CASE WHEN contains(p_type, 'BRASS') THEN 1 ELSE 0 END) AS BIGINT) AS n_brass,
        |  CAST(sum(CASE WHEN contains(p_type, 'STEEL') THEN 1 ELSE 0 END) AS BIGINT) AS n_steel,
        |  CAST(sum(CASE WHEN p_size >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
        |  CAST(sum(CASE WHEN p_brand = 'Brand#11' THEN 1 ELSE 0 END) AS BIGINT) AS n_brand11,
        |  count(*) AS n_total
        |FROM part""".stripMargin,
    "q8_ordered_agg" ->
      """SELECT l_orderkey,
        |  string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_linenumber, l_partkey)
        |    AS parts_in_order
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_rank" ->
      """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3 ORDER BY 1, 2""".stripMargin,
    "q10_running_sum" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
        |    OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
        |          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_qty
        |FROM lineitem ORDER BY 1, 2""".stripMargin,
    "q11_set_ops" ->
      """WITH u AS (
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 1000.0
        |  UNION
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |SELECT count(*) AS n_keys, CAST(sum(c_custkey) AS BIGINT) AS sum_keys
        |FROM (SELECT c_custkey FROM u
        |      EXCEPT SELECT c_custkey FROM customer WHERE c_nationkey < 5)""".stripMargin,
    "q12_scalars" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  upper(trim(event_type)) AS etype_up,
        |  json_extract_string(props, '$.k') AS dev,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin,
    "q13_split_explode" ->
      """WITH w AS (
        |  SELECT unnest(string_split(p_name, ' ')) AS word,
        |         generate_subscripts(string_split(p_name, ' '), 1) - 1 AS word_pos
        |  FROM part)
        |SELECT word_pos, word, count(*) AS n
        |FROM w GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q14_theta_join" ->
      """WITH words AS (
        |  SELECT DISTINCT w FROM (
        |    SELECT unnest(string_split(p_name, ' ')) AS w FROM part)
        |  WHERE w IN ('red','blue','small','hot','green'))
        |SELECT w, count(*) AS n_parts
        |FROM part JOIN words ON contains(p_name, w)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q28_salted_agg" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q29_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "q27_type_rules" ->
      """WITH specs AS (
        |  SELECT
        |    (list_value('SMALLINT','INTEGER','INT','BIGINT','DECIMAL','DEC','NUMERIC',
        |      'REAL','FLOAT','DOUBLE','DECFLOAT','CHAR','CHARACTER','VARCHAR',
        |      'LONG VARCHAR','CLOB','GRAPHIC','VARGRAPHIC','LONG VARGRAPHIC',
        |      'DBCLOB','BINARY','VARBINARY','BLOB','DATE','TIME','TIMESTAMP',
        |      'XML','ROWID','BOOLEAN','WIDGET'))[CAST(p_partkey % 30 + 1 AS INT)] AS t,
        |    CASE WHEN p_partkey % 3 = 0 THEN NULL ELSE p_size * 1200000 END AS len,
        |    CASE WHEN p_partkey % 4 = 0 THEN NULL ELSE p_size END AS prec,
        |    CASE WHEN p_partkey % 5 = 0 THEN NULL ELSE CAST(p_size % 10 AS INT) END AS sc,
        |    (p_partkey % 11 = 0) AS for_bit
        |  FROM part),
        |mapped AS (
        |  SELECT
        |    CASE
        |      WHEN for_bit THEN 'BINARY'
        |      WHEN t IN ('SMALLINT','INTEGER','INT') THEN 'INTEGER'
        |      WHEN t = 'BIGINT' THEN 'BIGINT'
        |      WHEN t = 'REAL' THEN 'FLOAT'
        |      WHEN t = 'DOUBLE' THEN 'DOUBLE'
        |      WHEN t = 'DATE' THEN 'DATE'
        |      WHEN t = 'BOOLEAN' THEN 'BOOLEAN'
        |      WHEN t IN ('CHAR','CHARACTER','VARCHAR','CHAR VARYING',
        |                 'CHARACTER VARYING','LONG VARCHAR','CLOB') THEN 'STRING'
        |      WHEN t IN ('DECIMAL','DEC','NUMERIC') THEN
        |        CASE WHEN coalesce(nullif(prec, 0), 5) > 38
        |             THEN 'NUMBER(38,' || CAST(least(coalesce(sc, 0), 37) AS VARCHAR) || ')'
        |             ELSE 'NUMBER(' || CAST(coalesce(nullif(prec, 0), 5) AS VARCHAR) || ','
        |                  || CAST(coalesce(sc, 0) AS VARCHAR) || ')' END
        |      WHEN t = 'FLOAT' THEN
        |        CASE WHEN prec IS NOT NULL AND prec > 24 THEN 'DOUBLE' ELSE 'FLOAT' END
        |      WHEN t = 'DECFLOAT' THEN 'DOUBLE'
        |      WHEN t = 'TIME' THEN 'TIME(6)'
        |      WHEN t = 'TIMESTAMP' THEN 'TIMESTAMP_NTZ(6)'
        |      WHEN t IN ('BINARY','VARBINARY','BINARY VARYING','BLOB') THEN 'BINARY'
        |      WHEN t IN ('GRAPHIC','VARGRAPHIC','LONG VARGRAPHIC','DBCLOB') THEN 'STRING'
        |      WHEN t IN ('XML','ROWID') THEN 'STRING'
        |      ELSE 'STRING' END AS target_type,
        |    CASE
        |      WHEN for_bit THEN 'compatible'
        |      WHEN t IN ('SMALLINT','INTEGER','INT','BIGINT','REAL','DOUBLE',
        |                 'DATE','BOOLEAN','FLOAT') THEN 'direct'
        |      WHEN t IN ('CHAR','CHARACTER') THEN 'compatible'
        |      WHEN t IN ('VARCHAR','CHAR VARYING','CHARACTER VARYING') THEN
        |        CASE WHEN len IS NOT NULL AND len > 16777216 THEN 'lossy' ELSE 'direct' END
        |      WHEN t = 'LONG VARCHAR' THEN 'compatible'
        |      WHEN t IN ('CLOB','DBCLOB') THEN
        |        CASE WHEN len IS NOT NULL AND len > 134217728 THEN 'lossy' ELSE 'compatible' END
        |      WHEN t IN ('DECIMAL','DEC','NUMERIC') THEN
        |        CASE WHEN coalesce(nullif(prec, 0), 5) > 38 THEN 'lossy' ELSE 'direct' END
        |      WHEN t IN ('DECFLOAT','ROWID') THEN 'lossy'
        |      WHEN t = 'TIME' THEN
        |        CASE WHEN coalesce(prec, 0) = 6 THEN 'direct' ELSE 'compatible' END
        |      WHEN t = 'TIMESTAMP' THEN
        |        CASE WHEN coalesce(nullif(prec, 0), 6) = 6 THEN 'direct' ELSE 'compatible' END
        |      WHEN t IN ('BINARY','VARBINARY','BINARY VARYING') THEN
        |        CASE WHEN len IS NOT NULL AND len > 8388608 THEN 'lossy' ELSE 'direct' END
        |      WHEN t = 'BLOB' THEN
        |        CASE WHEN len IS NOT NULL AND len > 134217728 THEN 'lossy' ELSE 'compatible' END
        |      WHEN t IN ('GRAPHIC','VARGRAPHIC','LONG VARGRAPHIC') THEN 'compatible'
        |      WHEN t = 'XML' THEN 'unsupported'
        |      ELSE 'lossy' END AS status,
        |    CASE
        |      WHEN for_bit THEN 'SSC-EWI-DB2ICE-0010'
        |      WHEN t IN ('SMALLINT','INTEGER','INT','BIGINT','REAL','DOUBLE',
        |                 'DATE','BOOLEAN','FLOAT') THEN NULL
        |      WHEN t IN ('CHAR','CHARACTER') THEN 'SSC-EWI-DB2ICE-0001'
        |      WHEN t IN ('VARCHAR','CHAR VARYING','CHARACTER VARYING') THEN
        |        CASE WHEN len IS NOT NULL AND len > 16777216 THEN 'SSC-EWI-DB2ICE-0008' END
        |      WHEN t = 'LONG VARCHAR' THEN 'SSC-EWI-DB2ICE-0019'
        |      WHEN t = 'CLOB' THEN
        |        CASE WHEN len IS NOT NULL AND len > 134217728 THEN 'SSC-EWI-DB2ICE-0008' END
        |      WHEN t = 'DBCLOB' THEN
        |        CASE WHEN len IS NOT NULL AND len > 134217728 THEN 'SSC-EWI-DB2ICE-0008'
        |             ELSE 'SSC-EWI-DB2ICE-0006' END
        |      WHEN t IN ('DECIMAL','DEC','NUMERIC') THEN
        |        CASE WHEN coalesce(nullif(prec, 0), 5) > 38 THEN 'SSC-EWI-DB2ICE-0002' END
        |      WHEN t = 'DECFLOAT' THEN 'SSC-EWI-DB2ICE-0007'
        |      WHEN t = 'TIME' THEN
        |        CASE WHEN coalesce(prec, 0) = 6 THEN NULL ELSE 'SSC-EWI-DB2ICE-0003' END
        |      WHEN t = 'TIMESTAMP' THEN
        |        CASE WHEN coalesce(nullif(prec, 0), 6) = 6 THEN NULL ELSE 'SSC-EWI-DB2ICE-0004' END
        |      WHEN t IN ('BINARY','VARBINARY','BINARY VARYING') THEN
        |        CASE WHEN len IS NOT NULL AND len > 8388608 THEN 'SSC-EWI-DB2ICE-0008' END
        |      WHEN t = 'BLOB' THEN
        |        CASE WHEN len IS NOT NULL AND len > 134217728 THEN 'SSC-EWI-DB2ICE-0008'
        |             ELSE 'SSC-EWI-DB2ICE-0020' END
        |      WHEN t IN ('GRAPHIC','VARGRAPHIC','LONG VARGRAPHIC') THEN 'SSC-EWI-DB2ICE-0006'
        |      WHEN t = 'XML' THEN 'SSC-EWI-DB2ICE-0005'
        |      WHEN t = 'ROWID' THEN 'SSC-EWI-DB2ICE-0009'
        |      ELSE 'SSC-EWI-DB2ICE-0099' END AS ewi_code
        |  FROM specs)
        |SELECT target_type, status, ewi_code, count(*) AS n
        |FROM mapped GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q26_sessions" ->
      """WITH x AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |             >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |s AS (SELECT user_id, ts,
        |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                         ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM x),
        |g AS (SELECT user_id, sid, count(*) AS n_events,
        |        epoch_us(max(ts)) - epoch_us(min(ts)) AS dur
        |      FROM s GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions,
        |  CAST(sum(n_events) AS BIGINT) AS n_events,
        |  CAST(sum(dur) AS BIGINT) AS total_session_us
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q32_asof_join" ->
      """WITH p AS (SELECT user_id, ts, event_id, value FROM events
        |           WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts, max_by(value, event_id) AS v_value
        |      FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |j AS (SELECT p.user_id, p.value, v.v_value
        |      FROM p ASOF LEFT JOIN v
        |        ON p.user_id = v.user_id AND p.ts >= v.ts)
        |SELECT user_id, count(*) AS n_purchases, count(v_value) AS n_matched,
        |  CAST(sum(CAST(value - v_value AS DECIMAL(18,4))) AS DOUBLE) AS sum_uplift
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q33_range_join" ->
      """WITH v AS (SELECT user_id, event_id, epoch_us(ts) AS us
        |           FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id, epoch_us(ts) AS w_start,
        |        epoch_us(ts) + 3600000000 AS w_end
        |      FROM events WHERE event_type = 'purchase')
        |SELECT v.user_id,
        |  count(DISTINCT v.event_id) AS n_views_in_window,
        |  count(*) AS n_view_window_pairs
        |FROM v JOIN p ON v.user_id = p.user_id
        |  AND v.us >= p.w_start AND v.us < p.w_end
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q37_salted_join" ->
      """WITH dim AS (
        |  SELECT DISTINCT l_returnflag,
        |    'flag_' || lower(l_returnflag) AS flag_label
        |  FROM lineitem)
        |SELECT flag_label, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN dim USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q34_quantiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.25) AS p25,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.75) AS p75,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q35_pivot" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_linestatus = 'F'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_f,
        |  CAST(sum(CASE WHEN l_linestatus = 'O'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_o
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q36_lag_gaps" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
        |  FROM events)
        |SELECT user_id, count(gap) AS n_gaps,
        |  CAST(sum(gap) AS BIGINT) AS sum_gap_us,
        |  CAST(max(gap) AS BIGINT) AS max_gap_us
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q45_scd2" ->
      """WITH v AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id, value
        |  FROM events),
        |iv AS (
        |  SELECT user_id, event_type, us, value,
        |    lead(us) OVER (PARTITION BY user_id, event_type
        |      ORDER BY us, event_id) AS valid_to
        |  FROM v)
        |SELECT user_id, event_type, count(*) AS n_versions,
        |  CAST(coalesce(sum(valid_to - us), 0) AS BIGINT) AS covered_us,
        |  CAST(max(CASE WHEN valid_to IS NULL THEN us END) AS BIGINT) AS cur_us,
        |  max(CASE WHEN valid_to IS NULL THEN value END) AS cur_value
        |FROM iv GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q15_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q2_left_join" -> (q2LeftJoin _),
    "q2b_anti_join" -> (q2bAntiJoin _),
    "q3_broadcast_join" -> (q3BroadcastJoin _),
    "q4_fill_forward" -> (q4FillForward _),
    "q5_case_rules" -> (q5CaseRules _),
    "q6_penalty_score" -> (q6PenaltyScore _),
    "q7_feature_counts" -> (q7FeatureCounts _),
    "q8_ordered_agg" -> (q8OrderedAgg _),
    "q9_rank" -> (q9Rank _),
    "q10_running_sum" -> (q10RunningSum _),
    "q11_set_ops" -> (q11SetOps _),
    "q12_scalars" -> (q12Scalars _),
    "q13_split_explode" -> (q13SplitExplode _),
    "q14_theta_join" -> (q14ThetaJoin _),
    "q15_rollup" -> (q15Rollup _),
    "q26_sessions" -> (q26Sessions _),
    "q32_asof_join" -> (q32AsofJoin _),
    "q33_range_join" -> (q33RangeJoin _),
    "q34_quantiles" -> (q34Quantiles _),
    "q35_pivot" -> (q35Pivot _),
    "q36_lag_gaps" -> (q36LagGaps _),
    "q37_salted_join" -> (q37SaltedJoin _),
    "q45_scd2" -> (q45Scd2 _),
    "q38_sketches" -> (q38Sketches _),
    "q27_type_rules" -> (q27TypeRules _),
    "q28_salted_agg" -> (q28SaltedAgg _),
    "q29_cube" -> (q29Cube _),
  )
}
