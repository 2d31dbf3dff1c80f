package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Graft.table

/** Relational core: scans, filters, equi-joins, counts, top-k.
  *
  * Covers SURVEY.md §2 operators S8 (SQL table scan, sqlgraph.py:863-901),
  * P1/P2 (predicate query, sqlgraph.py:689-719), P3/J9 (foreign-key
  * filter/graph, sqlgraph.py:1729-1882), A5/A8 (counts / distinct keys,
  * sqlgraph.py:582-584, 984-989), W3/W4/W5 (ordered iteration, LIMIT,
  * top-k, sqlgraph.py:863-901; graphquery.py:354-365).
  *
  * Money arithmetic is done in DECIMAL so results are exact and
  * order-independent (safe under Spark partial aggregation AND identical
  * to the DuckDB oracle), then cast to double for output.
  */
object Relational {

  private val dec = DecimalType(18, 2)

  val defs: Map[String, Q] = Map(
    // Flagship pricing-summary aggregate (A5-family counts + sums).
    "q1_agg" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice").cast(dec) * (lit(1).cast(dec) - col("l_discount").cast(dec))).cast(DecimalType(28, 4)))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // S8: full scan + projection + stable order + limit (keyset-style page).
    "s8_scan_page" -> { (s, dir) =>
      table(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .orderBy(col("o_orderkey"))
        .limit(100)
    },

    // P1/P2: equality + range predicates pushed to the parquet scan.
    "p1_filter" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_discount") > 0.05)
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"),
             sum(col("l_quantity").cast(dec)).cast("double").as("qty"))
        .orderBy("l_linestatus")
    },

    // P3/J9: foreign-key graph hop customer -> nation -> region, aggregated.
    "j9_fk_graph" -> { (s, dir) =>
      val c = table(s, dir, "customer")
      val n = table(s, dir, "nation")
      val r = table(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
             sum(col("c_acctbal").cast(dec)).cast("double").as("sum_bal"))
        .orderBy("r_name", "n_name")
    },

    // 3-way join + group-by (TPC-H Q3 shape); big-big join shuffles on the
    // join key, dims would be broadcast on a cluster.
    "q3_join" -> { (s, dir) =>
      val c = table(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = table(s, dir, "orders")
      val l = table(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice").cast(dec) * (lit(1).cast(dec) - col("l_discount").cast(dec))).cast(DecimalType(28, 4)))
               .cast("double").as("revenue"),
             count(lit(1)).as("n_lines"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // Selective-predicate aggregate (TPC-H Q6 shape): every predicate
    // reaches the parquet scan (PushedFilters), then one tight agg.
    "q6_selective" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice").cast(dec) * col("l_discount").cast(dec))
               .cast(DecimalType(28, 4))).cast("double").as("revenue"),
             count(lit(1)).as("n"))
    },

    // 6-way join (TPC-H Q5 shape): dims broadcast, fact-fact joins
    // shuffle on their keys; supplier and customer must share a nation.
    "q5_local_supplier" -> { (s, dir) =>
      val r = table(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = table(s, dir, "nation")
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders")
      val l = table(s, dir, "lineitem")
      val su = table(s, dir, "supplier")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice").cast(dec) * (lit(1).cast(dec) - col("l_discount").cast(dec)))
               .cast(DecimalType(28, 4))).cast("double").as("revenue"),
             count(lit(1)).as("n_lines"))
        .orderBy("n_name")
    },

    // Semi-structured: JSON property extraction from the events bag.
    "x1_json_props" -> { (s, dir) =>
      IntervalsQ.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))
        .orderBy("event_type")
    },

    // Temporal rollup: revenue per order-year (date-part functions).
    "q7_yearly" -> { (s, dir) =>
      val o = table(s, dir, "orders")
      val l = table(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(sum((col("l_extendedprice").cast(dec) * (lit(1).cast(dec) - col("l_discount").cast(dec)))
               .cast(DecimalType(28, 4))).cast("double").as("revenue"),
             countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy("yr")
    },

    // A5/A8: counts, count-distinct, distinct key lists.
    "a5_counts" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .agg(count(lit(1)).as("n_rows"),
             countDistinct(col("l_orderkey")).as("n_orders"),
             countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"))
    },

    "a8_distinct_keys" -> { (s, dir) =>
      table(s, dir, "customer")
        .select(col("c_mktsegment").as("segment"))
        .distinct()
        .orderBy("segment")
    },

    // W5: top-k per group via row_number with a total tie-break order.
    "w5_topk_per_group" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      table(s, dir, "orders")
        // bigint rk: DuckDB ROW_NUMBER is BIGINT and the driver gate is
        // dtype-sensitive; Spark's row_number is int
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rk")
    },

    // W6: rolling aggregates — per-user moving sum/count over the
    // last 3 events by event time (the ordered-iteration surface, W3,
    // upgraded to a sliding frame). One shuffle on user_id + one
    // sorted scan; money math in DECIMAL so partial-agg order can't
    // drift (the st1 lesson).
    "w6_rolling" -> { (s, dir) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("t"), col("event_id")).rowsBetween(-2, 0)
      IntervalsQ.events(s, dir)
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000000000").as("t"), col("value"))
        .withColumn("n_window", count(lit(1)).over(w))
        .withColumn("roll_sum",
          sum(col("value").cast("decimal(18,2)")).over(w)
            .cast("double"))
        .select("event_id", "user_id", "t", "n_window", "roll_sum")
        .orderBy("event_id")
    },

    // X20: GINI CONCENTRATION — per-nation revenue inequality across
    // suppliers (G = 2·Σ i·xᵢ / (n·Σx) − (n+1)/n over ascending-rank
    // cents): the source-concentration audit a data-curation pipeline
    // runs before trusting a mixture (G → 1 means one supplier IS the
    // nation's mass). Scale shape: the fact table pays ONE keyed
    // map-side-combined aggregate to supplier grain; the rank window
    // runs over the DIMENSION-sized per-nation supplier lists (m15's
    // manifest-window shape, bounded by |suppliers|, not |lineitem|).
    // All sums integer cents; one float division per nation, floored
    // to micro-units.
    "x20_gini" -> { (s, dir) =>
      val rev = table(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(sum(col("l_extendedprice").cast(dec)).as("r"))
        .select(col("l_suppkey").as("s_suppkey"),
          (col("r") * 100).cast("long").as("rc"))
      val sup = table(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val ranked = rev.join(sup, "s_suppkey")
        .withColumn("i", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("s_nationkey").orderBy(col("rc"), col("s_suppkey"))))
      ranked.groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), sum("rc").as("sr"),
          sum(col("i") * col("rc")).as("sir"))
        .select(col("s_nationkey"), col("n"),
          floor((lit(2.0) * col("sir").cast("double") /
              (col("n").cast("double") * col("sr").cast("double")) -
            (col("n") + 1).cast("double") / col("n").cast("double")) * lit(1e6))
            .cast("long").as("gini_u"))
        .orderBy("s_nationkey")
    },

    // C18: WINSORIZATION — clip each key's values to its own exact
    // [P1, P99] order statistics before averaging: the standard
    // outlier treatment for feature/reward columns (a mean over raw
    // values is one corrupt reading away from garbage; trimming
    // discards data, winsorizing keeps the row at the boundary).
    // Order statistics are EXACT and explicitly indexed
    // (idx = q·(n−1) div 100 + 1, so both engines pick the identical
    // multiset element — no interpolation, no percentile_cont float
    // drift); everything after is integer cents. Plan: one keyed rank
    // window + two keyed aggregates + one keyed join — at 100 TB the
    // per-key sort is the cost, which is why x6's approx-quantile
    // sketch exists as the scale path; this is the exact-audit twin.
    "c18_winsorize" -> { (s, dir) =>
      // value > 0 pins the mean's integer-division semantics: Spark's
      // `div` truncates toward zero while DuckDB's `//` floors, which
      // diverge on a negative winsorized sum — the positive-domain
      // filter (a no-op on this data) makes the contract explicit in
      // BOTH engines instead of latent
      val ev = IntervalsQ.events(s, dir)
        .where(col("value") > 0)
        .select(col("event_type"), col("event_id"),
          floor(col("value") * 100).cast("long").as("vc"))
      val w = Window.partitionBy("event_type").orderBy(col("vc"), col("event_id"))
      val nPer = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      val bounds = ev.withColumn("rn", row_number().over(w))
        .join(nPer, "event_type")
        .withColumn("idx_lo", expr("(n - 1) div 100 + 1"))
        .withColumn("idx_hi", expr("99 * (n - 1) div 100 + 1"))
        .where(col("rn") === col("idx_lo") || col("rn") === col("idx_hi"))
        .groupBy("event_type")
        .agg(min(when(col("rn") === col("idx_lo"), col("vc"))).as("lo"),
             max(when(col("rn") === col("idx_hi"), col("vc"))).as("hi"))
      ev.join(bounds, "event_type")
        .withColumn("cl", greatest(least(col("vc"), col("hi")), col("lo")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("vc") < col("lo") || col("vc") > col("hi"), 1L)
            .otherwise(0L)).as("n_clipped"),
          expr("sum(cl) div count(1)").as("winsor_mean_c"))
        .orderBy("event_type")
    },

    // W11: TIME-DECAYED aggregate — the trending/leaderboard score:
    // each positive-value event contributes value·2^(−days_ago)
    // (halflife = 1 day) to its type's running score. The decay is
    // DYADIC on purpose: a pow(0.5, Δt) formulation cannot hash-gate
    // (libm pow is not correctly rounded, so engines disagree at the
    // ulp), but halving per elapsed day is an integer right-shift of
    // the cent amount — exact, associative, partial-agg safe. The
    // reference day is the corpus max (broadcast 1-row crossJoin, the
    // t10 stats pattern); days_ago ≥ 63 contributes exactly 0 in both
    // engines (shift-overflow guard).
    "w11_decay_sum" -> { (s, dir) =>
      val ev = IntervalsQ.events(s, dir)
        .select(col("event_type"),
          expr("ts div 1000000000 div 86400").as("day"), col("value"))
        .where(col("value") > 0)
      val mx = ev.agg(max("day").as("maxday"))
      ev.crossJoin(broadcast(mx))
        .withColumn("days_ago", col("maxday") - col("day"))
        .withColumn("vc", floor(col("value") * 100).cast("long"))
        .withColumn("term_u", when(col("days_ago") >= 63, lit(0L))
          .otherwise(expr(
            "vc div shiftleft(cast(1 as bigint), cast(days_ago as int))")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("term_u").as("decayed_u"))
        .orderBy("event_type")
    },

    // W7: ordered conversion funnel — users progressing signup ->
    // view -> click -> purchase in event-time order (each stage's
    // event must be strictly after the user's previous-stage
    // frontier). Plan: per stage one user-keyed min-aggregate joined
    // to the previous frontier — 4 shuffles all keyed on user_id, so
    // AQE reuses one partitioning end-to-end; frontier tables are
    // |users| rows (tiny next to events), broadcast-able at 100 TB.
    "w7_funnel" -> { (s, dir) =>
      val e = IntervalsQ.events(s, dir).select("user_id", "event_type", "ts")
      def frontier(prev: org.apache.spark.sql.DataFrame, etype: String) =
        e.where(col("event_type") === etype)
          .join(prev, "user_id")
          .where(col("ts") > col("t0"))
          .groupBy("user_id").agg(min("ts").as("t0"))
      val s1 = e.where(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("t0"))
      val s2 = frontier(s1, "view")
      val s3 = frontier(s2, "click")
      val s4 = frontier(s3, "purchase")
      Seq("1_signup" -> s1, "2_view" -> s2, "3_click" -> s3, "4_purchase" -> s4)
        .map { case (nm, df) =>
          df.agg(count(lit(1)).as("n_users")).select(lit(nm).as("stage"), col("n_users"))
        }.reduce(_ unionByName _).orderBy("stage")
    },

    // W8: cohort retention — users bucketed by first-activity week,
    // distinct actives per (cohort, week offset). The activity→frontier
    // join is keyed on user_id and the frontier is |users| rows (tiny
    // next to events, broadcast-able at 100 TB); the dedup shuffles
    // only (cohort, week, user) triples — bounded by users × weeks,
    // never raw event volume.
    "w8_retention" -> { (s, dir) =>
      val e = IntervalsQ.events(s, dir)
        .select(col("user_id"),
          expr("(ts div 1000000000) div 604800").as("week"))
      val first = e.groupBy("user_id").agg(min("week").as("cohort_week"))
      e.join(first, "user_id")
        .select(col("cohort_week"), (col("week") - col("cohort_week")).as("week_no"),
          col("user_id"))
        .distinct()
        .groupBy("cohort_week", "week_no")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "week_no")
    },

    // X4: fixed-width histogram — integer bucket keys, so the whole
    // aggregation is map-side combinable into a tiny key space
    // (priorities × buckets); the classic profile-a-column scan.
    "x4_histogram" -> { (s, dir) =>
      table(s, dir, "orders")
        .select(col("o_orderpriority"),
          floor(col("o_totalprice") / lit(25000.0)).cast("long").as("bucket"))
        .groupBy("o_orderpriority", "bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority", "bucket")
    },

    // X5: per-group Pearson correlation from EXACT decimal co-moment
    // sums (one map-side-combinable aggregate — never a row-pair
    // join); the float formula runs once per GROUP on the exact sums,
    // so summation order can't drift the result, and the operand
    // magnitudes stay under 2^53 so decimal→double is exact in any
    // engine. Quantized to integer micro-units like f6.
    "x5_correlation" -> { (s, dir) =>
      val dq = col("l_quantity").cast(dec)
      val dd = col("l_discount").cast(dec)
      val d28 = DecimalType(28, 4)
      val n = col("n").cast("double")
      val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
      val sxx = col("sxx").cast("double"); val sxy = col("sxy").cast("double")
      val syy = col("syy").cast("double")
      table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(dq).as("sx"), sum(dd).as("sy"),
          sum((dq * dq).cast(d28)).as("sxx"),
          sum((dq * dd).cast(d28)).as("sxy"),
          sum((dd * dd).cast(d28)).as("syy"))
        .select(col("l_returnflag"), col("n"),
          floor(((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) * lit(1e6)))
            .cast("long").as("corr_u"))
        .orderBy("l_returnflag")
    },

    // X7: ROLLUP — hierarchical subtotals (year ⊃ priority ⊃ grand
    // total) in ONE pass: Catalyst's Expand emits each row once per
    // grouping set BEFORE the partial aggregate, so the subtotal
    // levels ride the same map-side combine + single shuffle as the
    // leaf grouping — never one job per level.
    "x7_rollup" -> { (s, dir) =>
      table(s, dir, "orders")
        .rollup(year(col("o_orderdate")).cast("long").as("yr"),
                col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec)).cast("double").as("revenue"))
        .orderBy(col("yr").asc_nulls_first,
                 col("o_orderpriority").asc_nulls_first)
    },

    // M4: CDC snapshot diff — the incremental-refresh primitive: diff
    // two keyed summaries of the order book (two 2-year windows) into
    // added/removed/changed rows. ONE full-outer join on the key over
    // two pre-aggregated sides; output is proportional to the churn,
    // not the fact table. See operators.SnapshotDiff.
    "m4_snapshot_diff" -> { (s, dir) =>
      def snap(lo: String, hi: String) =
        table(s, dir, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit(lo)) &&
            col("o_orderdate") < to_timestamp(lit(hi)))
          .groupBy(col("o_custkey").as("custkey"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(dec)).cast("double").as("total"))
      graft.operators.SnapshotDiff.diff(
          snap("1995-01-01", "1997-01-01"),
          snap("1999-01-01", "2001-01-01"), Seq("custkey"))
        .orderBy("custkey")
    },

    // M5: bucketed co-located join — the 100 TB join-layout lever:
    // both fact sides are written bucketed (and sorted) by the join
    // key, so the subsequent sort-merge join plans with ZERO exchange
    // on either side (see plans.BucketedJoinSpec for the plan
    // assertion). At this SF the optimizer may still pick broadcast —
    // also fine — but at cluster scale, where neither side fits in
    // memory, pre-bucketing is what turns every recurring join on the
    // key into a shuffle-free local merge. Tables are external
    // (tmp-pathed, app-scoped) and written once per session.
    "m5_bucketed_join" -> { (s, dir) =>
      val tag = java.lang.Integer.toHexString(dir.hashCode) +
        "_" + s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
      val ot = s"graft_m5_orders_$tag"
      val lt = s"graft_m5_lineitem_$tag"
      if (!s.catalog.tableExists(ot)) {
        table(s, dir, "orders").select("o_orderkey", "o_orderpriority")
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", tmpPath(s, ot)).saveAsTable(ot)
        table(s, dir, "lineitem").select("l_orderkey", "l_quantity")
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", tmpPath(s, lt)).saveAsTable(lt)
      }
      s.table(ot).join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast(dec)).cast("double").as("qty"))
        .orderBy("o_orderpriority")
    },

    // M6: z-order layout audit — Morton-interleave binned
    // (extendedprice, quantity) coordinates and group rows by
    // z-prefix quadtree cell (top 8 of 24 bits): per cell the row
    // count and the bounding box of both dimensions. A bounded bbox per cell is exactly what makes
    // parquet min/max pruning fire on predicates over EITHER column
    // once the table is laid out in z order. The interleave is a pure
    // bitwise codegen expression and the audit is one map-side-
    // combinable aggregate — no global sort needed to assess the
    // layout (the rewrite itself would be one repartitionByRange(z)).
    "m6_zorder" -> { (s, dir) =>
      import graft.operators.ZOrder
      table(s, dir, "lineitem")
        .select(
          least(floor(col("l_extendedprice") / 32).cast("long"), lit(4095L)).as("px"),
          floor(col("l_quantity") * 80).cast("long").as("sx"))
        .withColumn("z", ZOrder.interleave(col("px"), col("sx"), 12))
        .withColumn("cell", shiftright(col("z"), 16).cast("long"))
        .groupBy("cell")
        .agg(count(lit(1)).as("n_rows"),
          min("px").as("min_px"), max("px").as("max_px"),
          min("sx").as("min_sx"), max("sx").as("max_sx"),
          ((max("px") - min("px") + lit(1L)) *
           (max("sx") - min("sx") + lit(1L))).as("bbox_area"))
        .orderBy("cell")
    },

    // M7: incremental aggregate maintenance — the merge half of the
    // m4 story: yesterday's keyed aggregate + the delta wave's
    // aggregate are MERGED (counts add, decimal sums add) instead of
    // rescanning history; the oracle computes the full aggregate from
    // scratch, so a hash-match PROVES the merge algebra. Merge stays
    // in DECIMAL until the final cast — merging doubles would break
    // exactness. Plan: two filtered partial aggregates + one union +
    // one re-aggregate, all keyed on custkey. Verified on the r7
    // executedPlan (both initial and AQE-final): exactly THREE
    // exchanges — the two child hash shuffles and the final orderBy
    // range exchange; Spark 4.1 propagates the co-partitioned
    // children's hashpartitioning(custkey) through the Union, so the
    // re-aggregate inserts none (UnionReaggSpec pins this against
    // planner changes).
    "m7_incremental_agg" -> { (s, dir) =>
      val cut = to_timestamp(lit("1999-01-01"))
      val o = table(s, dir, "orders")
      def part(p: org.apache.spark.sql.Column) =
        o.where(p).groupBy(col("o_custkey").as("custkey"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(dec)).as("total_d"))
      part(col("o_orderdate") < cut)
        .unionByName(part(col("o_orderdate") >= cut))
        .groupBy("custkey")
        .agg(sum("n_orders").as("n_orders"),
          sum("total_d").cast("double").as("total"))
        .orderBy("custkey")
    },

    // m15: small-file COMPACTION PLANNER — the lakehouse maintenance
    // primitive next to m4 (snapshot diff) and m6 (layout audit): a
    // table's file manifest (here: one "file" per order, size =
    // ⌊o_totalprice⌋ bytes, partition = o_orderpriority) is binned
    // into compaction groups by deterministic next-fit packing — per
    // partition, files in file-id order fill a group until the
    // 2 MB target; a file whose cumulative start falls before the
    // boundary joins the current group. One running-sum window per
    // partition key (never a global window) + one keyed aggregate:
    // the plan costs a single manifest pass, which is what lets a
    // 100 TB table's maintenance loop run it continuously. Emitted
    // per group: file count, byte total, and the contiguous
    // [first_file, last_file] id range the compactor rewrites.
    "m15_compaction_plan" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val target = 2000000L
      val files = table(s, dir, "orders").select(
        col("o_orderkey").as("file_id"),
        col("o_orderpriority").as("part"),
        floor(col("o_totalprice")).cast("long").as("size_b"))
      val w = Window.partitionBy("part").orderBy("file_id")
      files
        .withColumn("cum", sum("size_b").over(w))
        .withColumn("bin_no",
          floor((col("cum") - col("size_b")) / lit(target.toDouble)).cast("long"))
        .groupBy("part", "bin_no")
        .agg(count(lit(1)).as("n_files"),
          sum("size_b").as("total_bytes"),
          min("file_id").as("first_file"),
          max("file_id").as("last_file"))
        .orderBy("part", "bin_no")
    },

    // ST9: streaming CDC-apply under the oracle gate — the MERGE SINK
    // the streaming surface was missing: orders replayed in two
    // MemoryStream waves; each micro-batch foreachBatch-merges its
    // keyed aggregate into a versioned state table
    // (StreamOps.upsertAggregate: counts add, DECIMAL totals add,
    // idempotent per batchId). The final state must equal the
    // from-scratch batch aggregate — the oracle proves the
    // incremental sink converges exactly, the streaming twin of m7.
    "st9_stream_upsert" -> { (s, dir) =>
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = table(s, dir, "orders")
        .select(col("o_custkey").cast("long"), col("o_totalprice"))
        .as[(Long, Double)].collect()
      val (w1, w2) = rows.partition(_._1 % 2 == 0)
      val statePath = tmpPath(s, "st9_state")
      val sp = new org.apache.hadoop.fs.Path(statePath)
      val fs = sp.getFileSystem(s.sessionState.newHadoopConf())
      fs.delete(sp, true) // stale versions from a prior run would win the latest-version race
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Double)]
      val src = in.toDF().toDF("custkey", "price")
      graft.streaming.StreamOps.replaySized(s,
          graft.streaming.StreamOps.stateParts(rows.length.toLong)) {
        val q = src.writeStream.outputMode("append")
          .option("checkpointLocation",
            graft.streaming.StreamOps.scratchCheckpoint("st9"))
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            graft.streaming.StreamOps.upsertAggregate(
              batch, id, "custkey", "price", statePath)
            ()
          }
          .start()
        try {
          in.addData(w1.toSeq); q.processAllAvailable()
          in.addData(w2.toSeq); q.processAllAvailable()
        } finally { graft.streaming.StreamMeter.record(q); q.stop() }
      }
      val latest = graft.streaming.StreamOps
        .latestStateVersion(s, statePath, Long.MaxValue)
        .getOrElse(sys.error("st9: no state version written"))
      s.read.parquet(latest)
        .select(col("custkey"), col("n").as("n_orders"),
          col("total_d").cast("double").as("total"))
        .orderBy("custkey")
    },

    // ST9b: st9's PRODUCTION-INGEST twin — the CDC-apply sink fed
    // from a FILE SOURCE (`readStream.json` drop directory) on the
    // RocksDB state store, the second wave landing AFTER the query
    // started so incremental file discovery drives the foreachBatch
    // merge (same upsertAggregate state table, idempotent per
    // batchId). Same oracle as st9/m7: the converged state must equal
    // the from-scratch batch aggregate. Retires MemoryStream from the
    // upsert shape's production claim.
    "st9b_file_upsert" -> { (s, dir) =>
      val rows = table(s, dir, "orders")
        .select(col("o_custkey").cast("long").as("custkey"),
          col("o_totalprice").as("price"))
      val statePath = tmpPath(s, "st9b_state")
      val sp = new org.apache.hadoop.fs.Path(statePath)
      val fs = sp.getFileSystem(s.sessionState.newHadoopConf())
      fs.delete(sp, true) // stale versions from a prior run would win the latest-version race
      val drop = graft.streaming.StreamOps.scratchDir("st9b_drop")
      rows.where(col("custkey") % 2 === 0).write.mode("append").json(drop)
      val sch = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("custkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("price",
          org.apache.spark.sql.types.DoubleType)))
      graft.streaming.StreamOps.replaySized(s,
          graft.streaming.StreamOps.stateParts(table(s, dir, "orders").count())) {
        val src = s.readStream.schema(sch).json(drop)
        val q = src.writeStream.outputMode("append")
          .option("checkpointLocation",
            graft.streaming.StreamOps.scratchCheckpoint("st9b"))
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            graft.streaming.StreamOps.upsertAggregate(
              batch, id, "custkey", "price", statePath)
            ()
          }
          .start()
        try {
          q.processAllAvailable()
          rows.where(col("custkey") % 2 =!= 0).write.mode("append").json(drop)
          q.processAllAvailable()
        } finally { graft.streaming.StreamMeter.record(q); q.stop() }
      }
      val latest = graft.streaming.StreamOps
        .latestStateVersion(s, statePath, Long.MaxValue)
        .getOrElse(sys.error("st9b: no state version written"))
      s.read.parquet(latest)
        .select(col("custkey"), col("n").as("n_orders"),
          col("total_d").cast("double").as("total"))
        .orderBy("custkey")
    },

    // X8: PIVOT — long→wide reshape as conditional aggregation over a
    // FIXED column list (the only scalable form: a dynamic pivot
    // needs a driver-side distinct first; with the list pinned the
    // plan is one groupBy with k filtered aggregates, map-side
    // combinable, one shuffle).
    "x8_pivot" -> { (s, dir) =>
      table(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("o_orderpriority"), col("F").as("n_f"),
          col("O").as("n_o"), col("P").as("n_p"))
        .orderBy("o_orderpriority")
    },

    // W9: z-score outlier flagging — per-type mean/std from EXACT
    // decimal sums (value has 2 decimals, so the sums are exact; the
    // float formula runs once per row on exact inputs, so no
    // summation-order drift). Plan: one tiny type-keyed aggregate
    // broadcast back onto the scan — the events themselves never
    // shuffle; the anomaly scan is a pure second pass. The per-row
    // z is quantized to milli-sigma.
    "w9_zscore_outliers" -> { (s, dir) =>
      val dv = col("value").cast(dec)
      val stats = IntervalsQ.events(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(dv).as("sx"),
          sum((dv * dv).cast(DecimalType(28, 4))).as("sxx"))
      val n = col("n").cast("double")
      val sx = col("sx").cast("double"); val sxx = col("sxx").cast("double")
      IntervalsQ.events(s, dir)
        .join(broadcast(stats), "event_type")
        .withColumn("z_u",
          floor((col("value") - sx / n) /
            sqrt((sxx - sx * sx / n) / n) * lit(1000.0)).cast("long"))
        .where(col("z_u") >= 3000)
        .select("event_id", "event_type", "value", "z_u")
        .orderBy("event_id")
    },

    // X13: time-of-week activity profile — counts and decimal-exact
    // value mass per (day-of-week, event_type). Day-of-week comes
    // from PURE integer epoch arithmetic ((day + 3) % 7, Monday=0;
    // epoch day 0 was a Thursday) —
    // no calendar/timezone function, so both engines agree by
    // construction. One map-side-combinable aggregate.
    "x13_time_profile" -> { (s, dir) =>
      IntervalsQ.events(s, dir)
        .withColumn("dow", expr("((ts div 1000000000 div 86400) + 3) % 7"))
        .groupBy("dow", "event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast("double").as("value_sum"))
        .orderBy("dow", "event_type")
    },

    // W10: rate-spike detection — per event_type, hourly buckets at
    // >= 1.5× the type's mean bucket rate, flagged in EXACT integer
    // cross-multiplication (2 · n · n_buckets ≥ 3 · total — no float
    // rates, no drift). Two keyed aggregates + a broadcast join of
    // the per-type totals; the anomaly scan shape of an operational
    // monitor at any scale.
    "w10_rate_spike" -> { (s, dir) =>
      val hourly = IntervalsQ.events(s, dir)
        .withColumn("h", expr("ts div 1000000000 div 3600"))
        .groupBy("event_type", "h").agg(count(lit(1)).as("n"))
      val totals = hourly.groupBy("event_type")
        .agg(sum("n").as("total"), count(lit(1)).as("n_buckets"))
      hourly.join(broadcast(totals), "event_type")
        .where(lit(2L) * col("n") * col("n_buckets") >= lit(3L) * col("total"))
        .select(col("event_type"), col("h"), col("n"),
          (lit(2L) * col("n") * col("n_buckets")).as("lhs"),
          (lit(3L) * col("total")).as("rhs"))
        .orderBy("event_type", "h")
    },

    // X16: Bloom-filter semi-join audit — the shuffle-elimination
    // pattern for "filter a 100 TB fact table by a dim key-set": the
    // dim side's keys (parts with p_size = 1) build an m-bit k-hash
    // Bloom filter (k=3, md5 bit draws — deterministic, so the
    // filter AND its false positives are oracle-exact); a fact key
    // passes iff all k bits are set. m is SIZED TO THE KEY SET
    // (m = 10·|keys|, the bits-per-key production rule) so the FP
    // rate is scale-invariant ≈ (1-e^(-3/10))³ ≈ 1.7% — a fixed m
    // saturates as the dim grows (measured: m=512 hit 97% FP at
    // sf0.1). At cluster scale the bitmask broadcasts and the probe
    // is scan-local — the fact table never shuffles (vs a shuffle
    // semi-join); here the set-bit table (≤ m rows) broadcasts
    // through the hash join, the same dataflow. Probing runs over
    // DISTINCT fact keys (vocabulary-sized) with per-key row counts
    // folded back in — the fact table itself pays one
    // map-side-combinable aggregate, nothing more. Output: the
    // one-row audit a production rollout needs — flagged mass split
    // into true matches and false positives, plus the structural
    // zero-false-negative guarantee as a checked column.
    "x16_bloom_semijoin" -> { (s, dir) =>
      val k = 3
      def bit(i: Int, key: org.apache.spark.sql.Column) =
        conv(substring(md5(concat(lit(i + ":"), key.cast("string"))), 1, 8), 16, 10)
          .cast("long") % col("m")
      val keys = table(s, dir, "part").where(col("p_size") === 1)
        .select(col("p_partkey")).distinct()
      // GREATEST(m, 1): an empty dim would size m = 0 and every bit
      // expression becomes `% 0` — Spark yields NULL bits while DuckDB
      // errors, so the degenerate edge is pinned to m = 1 (one bucket,
      // zero members, nothing flagged) in BOTH engines instead of
      // diverging silently
      val mRow = broadcast(keys.agg(greatest(count(lit(1)) * 10L, lit(1L)).as("m")))
      val bits = keys.crossJoin(mRow)
        .select(explode(array((0 until k).map(i => bit(i, col("p_partkey"))): _*))
          .as("bit"))
        .distinct().withColumn("hit", lit(1L))
      val pk = table(s, dir, "lineitem")
        .groupBy("l_partkey").agg(count(lit(1)).as("n_rows"))
      val probed = pk.crossJoin(mRow)
        .select(col("l_partkey"), col("n_rows"),
          explode(array((0 until k).map(i => bit(i, col("l_partkey"))): _*)).as("bit"))
        .join(broadcast(bits), Seq("bit"), "left")
        .groupBy("l_partkey", "n_rows")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_set"))
        .withColumn("flagged", (col("n_set") === k).cast("long"))
      probed
        .join(broadcast(keys.withColumn("member", lit(1L))),
          col("l_partkey") === col("p_partkey"), "left")
        .na.fill(0L, Seq("member"))
        .agg(
          count(lit(1)).as("n_probe_keys"),
          sum("n_rows").as("n_probe_rows"),
          sum(when(col("flagged") === 1L, col("n_rows")).otherwise(0L))
            .as("n_flagged_rows"),
          sum(when(col("flagged") === 1L && col("member") === 1L, col("n_rows"))
            .otherwise(0L)).as("n_true_rows"),
          sum(when(col("flagged") === 1L && col("member") === 0L, col("n_rows"))
            .otherwise(0L)).as("n_false_pos_rows"),
          sum(when(col("flagged") === 0L && col("member") === 1L, 1L)
            .otherwise(0L)).as("n_false_neg_keys"))
    },

    // X17: skew-salted aggregate — event_type is the canonical hot key
    // (a handful of values over the whole events table, so an unsalted
    // groupBy funnels ~n/5 rows into ONE reduce task each, at ANY
    // scale). Rides the AUTO bucket path (r17: buckets = 0 default —
    // `Salt.autoBuckets` samples the hot share ≈ 0.20 and solves the
    // validated skew model, recommending 16 at 32 shuffle partitions,
    // exactly the hand-picked r15 value); decimal and long partials
    // are order-independent, so the result is bit-identical to the
    // direct groupBy the oracle runs at ANY bucket count.
    "x17_salted_agg" -> { (s, dir) =>
      val ev = table(s, dir, "events")
        .select(col("event_type"), col("value").cast(dec).as("v"))
      graft.operators.Salt.saltedAgg(ev, Seq("event_type"))(
          count(lit(1)).as("__pn"), sum(col("v")).as("__ps"))(
          sum(col("__pn")).as("n"),
          sum(col("__ps")).cast("double").as("sum_value"))
        .orderBy("event_type")
    },

    // X18: skew-salted big-big join — lineitem⋈part forced off the
    // broadcast path (shuffle_hash hint — the stand-in for a dim too
    // large to broadcast, where salting is the right tool; a
    // broadcastable dim should broadcast instead): the fact side salts
    // on pmod(l_orderkey, 16) (data-derived, deterministic under task
    // retries and AQE replans — never rand()), the dim replicates ×16,
    // and the join key becomes (p_partkey, __salt), spreading a hot
    // partkey's fact rows over 16 reduce tasks. Output — and the
    // oracle — is the plain unsalted join aggregate. Buckets stay
    // EXPLICIT here: the fixture's partkey is uniform (a stand-in for
    // a skewed production key), so the r17 auto path would honestly
    // recommend 1 bucket = no salting — correct for this data, but
    // this query exists to keep the salted plan gated.
    "x18_salted_join" -> { (s, dir) =>
      val l = table(s, dir, "lineitem")
        .select(col("l_partkey").as("p_partkey"), col("l_orderkey"),
          col("l_extendedprice").cast(dec).as("price"))
      val p = table(s, dir, "part").select("p_partkey", "p_size")
      graft.operators.Salt
        .saltedJoin(l, p.hint("shuffle_hash"), Seq("p_partkey"),
          col("l_orderkey"), buckets = 16)
        .groupBy("p_size")
        .agg(count(lit(1)).as("n"),
             sum(col("price")).cast("double").as("revenue"))
        .orderBy("p_size")
    },

    // X21 (r17): the AUTO-sized salted join twin — x18 models a
    // skewed production key on a uniform fixture and therefore keeps
    // explicit buckets; this query joins on a key that IS skewed in
    // the fixture (event_type, hot share ≈ 0.20 at every SF), so the
    // buckets = 0 default measures the skew and solves the r16 model
    // (16 at 32 shuffle partitions) — the full measure-and-decide
    // path gated end-to-end. The derived dim (distinct event types +
    // a length weight) is forced off the broadcast path as in x18;
    // output and oracle are the plain join aggregate, identical at
    // any bucket count.
    "x21_salted_join_auto" -> { (s, dir) =>
      val ev = table(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          col("value").cast(dec).as("v"))
      val dim = ev.select("event_type").distinct()
        .withColumn("w", length(col("event_type")).cast("long"))
      graft.operators.Salt
        .saltedJoin(ev, dim.hint("shuffle_hash"), Seq("event_type"),
          col("event_id"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
             sum(col("v") * col("w")).cast("double").as("weighted_value"))
        .orderBy("event_type")
    },

    // X19: MERGEABLE distinct-count sketch, oracle-exact — linear
    // counting (Whang et al.): each user hashes to one of m = 65536
    // md5 buckets, a scope's sketch is its distinct-bucket SET, and
    // the estimate is m·ln(m/(m−V)) (quantized ×1000). The point is
    // the MERGE: the all-days row is computed by set-union of the
    // per-day bucket sets — the incremental/lakehouse pattern where
    // each partition ships a fixed-size sketch and the union answers
    // the global question without re-touching rows. Unlike x2's HLL
    // (engine-private registers, rows-gated), every bucket draw here
    // is an md5 the oracle replays, so sketch, merge, AND estimates
    // are hash-gated; the exact distinct count rides along per scope
    // as the accuracy reference.
    "x19_linear_counting" -> { (s, dir) =>
      val m = 65536L
      val ev = IntervalsQ.events(s, dir)
        .select(expr("ts div 1000000000 div 86400").as("day"), col("user_id"))
      val bucket =
        conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % m
      val db = ev.select(col("day"), bucket.as("b")).distinct()
      val perDay = db.groupBy("day").agg(count(lit(1)).as("v"))
      val allDays = db.select("b").distinct()
        .agg(count(lit(1)).as("v")).withColumn("day", lit(-1L))
      val exactDay = ev.distinct().groupBy("day")
        .agg(count(lit(1)).as("exact"))
      val exactAll = ev.select("user_id").distinct()
        .agg(count(lit(1)).as("exact")).withColumn("day", lit(-1L))
      perDay.unionByName(allDays.select("day", "v"))
        .join(exactDay.unionByName(exactAll.select("day", "exact")), "day")
        // least(v, m-1): a saturated sketch (every bucket set) would put
        // ln(m/0) = Inf through floor — Spark saturates the Long cast
        // while DuckDB errors, so the estimate is pinned to the largest
        // finite value in BOTH engines (a saturated linear counter has
        // no estimate anyway; production sizes m above the cardinality)
        .withColumn("vc", least(col("v"), lit(m - 1)).cast("double"))
        .withColumn("est_u",
          floor(lit(1000.0) * lit(m.toDouble) *
            log(lit(m.toDouble) / (lit(m.toDouble) - col("vc"))))
            .cast("long"))
        .select("day", "v", "est_u", "exact")
        .orderBy("day")
    },

    // X12: A/B experiment readout — the two-proportion z-test over a
    // deterministic arm split (user_id parity): among users with at
    // least one click, does conversion (any purchase) differ by arm?
    // ONE user-keyed aggregate → 2-row arm table → 1-row conditional
    // pivot; z is quantized (floor ×1000) like w9 so the float
    // arithmetic is hash-comparable, and both engines evaluate the
    // IDENTICAL expression tree (IEEE ops are correctly rounded, so
    // same association ⇒ same bits).
    "x12_ab_test" -> { (s, dir) =>
      val perUser = IntervalsQ.events(s, dir)
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicked"),
          max(when(col("event_type") === "purchase" && col("value") >= 75.0, 1L)
            .otherwise(0L)).as("conv"))
        .where(col("clicked") === 1L)
        .withColumn("arm", col("user_id") % 2L)
      val arms = perUser.groupBy("arm")
        .agg(count(lit(1)).as("n"), sum("conv").as("x"))
      val p0 = col("x0").cast("double") / col("n0").cast("double")
      val p1 = col("x1").cast("double") / col("n1").cast("double")
      val pp = (col("x0") + col("x1")).cast("double") /
        (col("n0") + col("n1")).cast("double")
      val den = sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("n0").cast("double") + lit(1.0) / col("n1").cast("double")))
      arms.agg(
          sum(when(col("arm") === 0L, col("n"))).as("n0"),
          sum(when(col("arm") === 0L, col("x"))).as("x0"),
          sum(when(col("arm") === 1L, col("n"))).as("n1"),
          sum(when(col("arm") === 1L, col("x"))).as("x1"))
        // pooled p of 0 or 1 ⇒ zero variance ⇒ z undefined; report 0
        // (no detectable difference) instead of dividing by zero
        .withColumn("z_u", when(den === 0.0, 0L)
          .otherwise(floor((p0 - p1) / den * lit(1000.0)).cast("long")))
        .withColumn("significant", abs(col("z_u")) >= 1960L)
    },

    // X6: approximate quantiles (GK/QuantileSummaries sketch) — x3's
    // exact row-index quantiles need a per-stratum sort; the sketch
    // is what a 100 TB profile pass actually runs (mergeable partial
    // summaries, map-side combinable, bounded memory at any scale).
    // TOLERANCE-GATED (r17, VERDICT r16 #4): the estimate itself is
    // engine-specific, but its GUARANTEE is not — percentile_approx
    // at accuracy a returns a value whose RANK is within ε·n of the
    // target rank, ε = 1/a. The gated output is the exact group size
    // plus per-quantile booleans checking exactly that rank envelope
    // (rank range of the estimate from exact <·/≤· counts, target
    // rank p·n, slack ε·n + 1 for the rank-definition off-by-one);
    // the oracle pins n and TRUE. A sketch regression breaking its
    // published bound flips the boolean and fails the hash gate. The
    // exact quantile VALUES stay gated in x3_source_quantiles.
    "x6_approx_quantiles" -> { (s, dir) =>
      val o = table(s, dir, "orders").select("o_orderpriority", "o_totalprice")
      val est = o.groupBy("o_orderpriority")
        .agg(expr("percentile_approx(o_totalprice, array(0.5D, 0.9D), 1000)")
          .as("pq"))
        .select(col("o_orderpriority"),
          element_at(col("pq"), 1).as("__e50"), element_at(col("pq"), 2).as("__e90"))
      def okCols(p: Double, e: org.apache.spark.sql.Column,
                 name: String): Seq[org.apache.spark.sql.Column] = {
        val n = count(lit(1)).cast("double")
        val le = sum(when(col("o_totalprice") <= e, 1L).otherwise(0L)).cast("double")
        val lt = sum(when(col("o_totalprice") < e, 1L).otherwise(0L)).cast("double")
        val slack = n * 0.001 + 1.0
        Seq((le >= lit(p) * n - slack && lt <= lit(p) * n + slack).as(name))
      }
      o.join(broadcast(est), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          (okCols(0.5, col("__e50"), "p50_in_bound") ++
           okCols(0.9, col("__e90"), "p90_in_bound")): _*)
        .orderBy("o_orderpriority")
    },

    // X2: HLL approximate distinct — the sketch a 100 TB pipeline uses
    // where exact COUNT(DISTINCT) would shuffle every value (distinct
    // URLs/users per slice). HLL++ register merges are max-commutative,
    // so the estimate is deterministic for fixed data regardless of
    // partitioning. TOLERANCE-GATED (r17, VERDICT r16 #4): the
    // estimate is engine-specific but its accuracy CONTRACT is
    // public — rsd 0.02 ⇒ relative error within 0.08 (4σ) except
    // with negligible probability (~3e-5 per group; the r17 2.5σ /
    // 0.05 gate left ~1% per group on a fresh fixture or SF, enough
    // to flip the boolean and spuriously fail the hash gate with
    // nothing regressed — ADVICE r17). The gated output is the exact
    // distinct count (oracle-pinned) plus that bounded check as a
    // boolean; the raw estimate stays out of the hash. x19's linear-
    // counting twin keeps a fully value-gated mergeable sketch.
    // COST NOTE: the gated form necessarily pays the exact-distinct
    // shuffle it exists to avoid in production — that exact side IS
    // the check — so its bench row measures gate + sketch, not the
    // sketch kernel alone (r16→r17 comparisons should expect the
    // step); the sketch-only production form is this agg minus the
    // exact columns.
    "x2_approx_distinct" -> { (s, dir) =>
      IntervalsQ.events(s, dir)
        .groupBy("event_type")
        .agg(approx_count_distinct("user_id", rsd = 0.02).as("__approx"),
          countDistinct(col("user_id")).as("exact_users"),
          count(lit(1)).as("n"))
        .withColumn("within_bound",
          abs(col("__approx") - col("exact_users")).cast("double") <=
            col("exact_users").cast("double") * 0.08)
        .select("event_type", "n", "exact_users", "within_bound")
        .orderBy("event_type")
    }
  )

  val oracle: Map[String, String] = Map(
    "x20_gini" ->
      """WITH rev AS (SELECT l_suppkey AS s_suppkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rc
        |  FROM lineitem GROUP BY l_suppkey),
        |r2 AS (SELECT s.s_nationkey, rc,
        |  ROW_NUMBER() OVER (PARTITION BY s.s_nationkey ORDER BY rc, rev.s_suppkey) AS i
        |  FROM rev JOIN supplier s ON rev.s_suppkey = s.s_suppkey),
        |a AS (SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(rc) AS BIGINT) AS sr, CAST(SUM(i * rc) AS BIGINT) AS sir
        |  FROM r2 GROUP BY s_nationkey)
        |SELECT s_nationkey, n,
        |  CAST(floor((2.0 * CAST(sir AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sr AS DOUBLE))
        |    - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS gini_u
        |FROM a ORDER BY s_nationkey""".stripMargin,

    "c18_winsorize" ->
      """WITH e AS (SELECT event_type, event_id,
        |  CAST(floor(value * 100) AS BIGINT) AS vc FROM events WHERE value > 0),
        |r AS (SELECT event_type, vc,
        |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY vc, event_id) AS rn
        |  FROM e),
        |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM e GROUP BY event_type),
        |b AS (SELECT r.event_type,
        |  MIN(CASE WHEN rn = (n - 1) // 100 + 1 THEN vc END) AS lo,
        |  MAX(CASE WHEN rn = 99 * (n - 1) // 100 + 1 THEN vc END) AS hi
        |  FROM r JOIN n ON r.event_type = n.event_type
        |  WHERE rn = (n - 1) // 100 + 1 OR rn = 99 * (n - 1) // 100 + 1
        |  GROUP BY r.event_type)
        |SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN vc < lo OR vc > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
        |  CAST(SUM(GREATEST(LEAST(vc, hi), lo)) // COUNT(*) AS BIGINT) AS winsor_mean_c
        |FROM e JOIN b ON e.event_type = b.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "w11_decay_sum" ->
      """WITH e AS (SELECT event_type, epoch_ms(ts)//1000//86400 AS day, value
        |  FROM events WHERE value > 0),
        |mx AS (SELECT MAX(day) AS maxday FROM e),
        |t AS (SELECT event_type,
        |  CAST(floor(value * 100) AS BIGINT) AS vc,
        |  maxday - day AS days_ago FROM e, mx)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN days_ago >= 63 THEN 0
        |    ELSE vc // (CAST(1 AS BIGINT) << days_ago) END) AS BIGINT) AS decayed_u
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin,

    // x2/x6 (r17): the sketch estimates are engine-private, so the
    // oracle pins the EXACT side of each group plus TRUE for the
    // bounded-error booleans the Spark side computes in-engine — a
    // sketch drifting outside its published bound flips a boolean and
    // fails the hash gate (VERDICT r16 #4).
    "x2_approx_distinct" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS within_bound
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "x6_approx_quantiles" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  TRUE AS p50_in_bound, TRUE AS p90_in_bound
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "x21_salted_join_auto" ->
      """WITH d AS (SELECT DISTINCT event_type,
        |  CAST(LENGTH(event_type) AS BIGINT) AS w FROM events)
        |SELECT e.event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2)) * w) AS DOUBLE) AS weighted_value
        |FROM events e JOIN d USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "x19_linear_counting" ->
      """WITH e AS (SELECT epoch_ms(ts)//1000//86400 AS day, user_id FROM events),
        |db AS (SELECT DISTINCT day,
        |  ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 65536 AS b
        |  FROM e),
        |pd AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS v FROM db GROUP BY day
        |  UNION ALL
        |  SELECT -1, CAST(COUNT(DISTINCT b) AS BIGINT) FROM db),
        |ex AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact
        |  FROM e GROUP BY day
        |  UNION ALL
        |  SELECT -1, CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM e)
        |SELECT pd.day, pd.v,
        |  CAST(floor(1000.0 * 65536.0 *
        |    ln(65536.0 / (65536.0 - CAST(LEAST(v, 65535) AS DOUBLE)))) AS BIGINT) AS est_u,
        |  ex.exact
        |FROM pd JOIN ex ON pd.day = ex.day ORDER BY pd.day""".stripMargin,

    "x17_salted_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "x18_salted_join" ->
      """SELECT p.p_size, COUNT(*) AS n,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY p.p_size ORDER BY p.p_size""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "s8_scan_page" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin,

    "p1_filter" ->
      """SELECT l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem WHERE l_returnflag = 'R' AND l_discount > 0.05
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "j9_fk_graph" ->
      """SELECT r_name, n_name, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q3_join" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q6_selective" ->
      """SELECT
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "x1_json_props" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q7_yearly" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        |  COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY yr ORDER BY yr""".stripMargin,

    "a5_counts" ->
      """SELECT COUNT(*) AS n_rows,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem""".stripMargin,

    "a8_distinct_keys" ->
      """SELECT DISTINCT c_mktsegment AS segment FROM customer
        |ORDER BY segment""".stripMargin,

    "w5_topk_per_group" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "w7_funnel" ->
      """WITH s1 AS (SELECT user_id, MIN(ts) AS t0 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t0 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'view' AND e.ts > s1.t0 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS t0 FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s2.t0 GROUP BY e.user_id),
        |s4 AS (SELECT e.user_id, MIN(e.ts) AS t0 FROM events e
        |  JOIN s3 ON e.user_id = s3.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s3.t0 GROUP BY e.user_id)
        |SELECT stage, n_users FROM (
        |  SELECT '1_signup' AS stage, COUNT(*) AS n_users FROM s1
        |  UNION ALL SELECT '2_view', COUNT(*) FROM s2
        |  UNION ALL SELECT '3_click', COUNT(*) FROM s3
        |  UNION ALL SELECT '4_purchase', COUNT(*) FROM s4)
        |ORDER BY stage""".stripMargin,

    "w8_retention" ->
      """WITH w AS (SELECT user_id, (epoch_ms(ts)//1000)//604800 AS week FROM events),
        |f AS (SELECT user_id, MIN(week) AS cohort_week FROM w GROUP BY user_id),
        |a AS (SELECT DISTINCT cohort_week, week - cohort_week AS week_no, w.user_id
        |  FROM w JOIN f USING (user_id))
        |SELECT cohort_week, week_no, COUNT(*) AS n_users
        |FROM a GROUP BY cohort_week, week_no
        |ORDER BY cohort_week, week_no""".stripMargin,

    "x7_rollup" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderpriority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY ROLLUP (yr, o_orderpriority)
        |ORDER BY yr ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "m4_snapshot_diff" ->
      """WITH a AS (SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01' GROUP BY 1),
        |b AS (SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
        |    AND o_orderdate < TIMESTAMP '2001-01-01' GROUP BY 1),
        |d AS (SELECT COALESCE(a.custkey, b.custkey) AS custkey,
        |  CASE WHEN a.custkey IS NULL THEN 'added'
        |       WHEN b.custkey IS NULL THEN 'removed'
        |       WHEN a.n_orders <> b.n_orders OR a.total <> b.total THEN 'changed'
        |  END AS status,
        |  a.n_orders AS old_n_orders, a.total AS old_total,
        |  b.n_orders AS new_n_orders, b.total AS new_total
        |  FROM a FULL OUTER JOIN b ON a.custkey = b.custkey)
        |SELECT * FROM d WHERE status IS NOT NULL ORDER BY custkey""".stripMargin,

    "st9_stream_upsert" ->
      """SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "st9b_file_upsert" ->
      """SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "m7_incremental_agg" ->
      """SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "m15_compaction_plan" ->
      // next-fit packing as a running-sum window; the double division
      // under FLOOR is IEEE-identical in both engines (values < 2^53)
      """WITH f AS (SELECT o_orderkey AS file_id, o_orderpriority AS part,
        |  CAST(FLOOR(o_totalprice) AS BIGINT) AS size_b FROM orders),
        |c AS (SELECT file_id, part, size_b,
        |  SUM(size_b) OVER (PARTITION BY part ORDER BY file_id) AS cum FROM f),
        |b AS (SELECT part,
        |  CAST(FLOOR((cum - size_b) / 2000000.0) AS BIGINT) AS bin_no,
        |  size_b, file_id FROM c)
        |SELECT part, bin_no, COUNT(*) AS n_files,
        |  CAST(SUM(size_b) AS BIGINT) AS total_bytes,
        |  MIN(file_id) AS first_file, MAX(file_id) AS last_file
        |FROM b GROUP BY part, bin_no ORDER BY part, bin_no""".stripMargin,

    "m5_bucketed_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "m6_zorder" -> {
      val z = graft.operators.ZOrder.interleaveSql("px", "sx", 12)
      s"""WITH p AS (SELECT
        |  LEAST(CAST(floor(l_extendedprice / 32) AS BIGINT), 4095) AS px,
        |  CAST(floor(l_quantity * 80) AS BIGINT) AS sx
        |  FROM lineitem),
        |zc AS (SELECT px, sx, ($z) >> 16 AS cell FROM p)
        |SELECT cell, COUNT(*) AS n_rows,
        |  MIN(px) AS min_px, MAX(px) AS max_px,
        |  MIN(sx) AS min_sx, MAX(sx) AS max_sx,
        |  (MAX(px) - MIN(px) + 1) * (MAX(sx) - MIN(sx) + 1) AS bbox_area
        |FROM zc GROUP BY cell ORDER BY cell""".stripMargin
    },

    "x8_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
        |  COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
        |  COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "x13_time_profile" ->
      """SELECT ((epoch_ms(ts)//1000 // 86400) + 3) % 7 AS dow, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "w10_rate_spike" ->
      """WITH hourly AS (SELECT event_type, epoch_ms(ts)//1000 // 3600 AS h,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS total,
        |  CAST(COUNT(*) AS BIGINT) AS n_buckets
        |  FROM hourly GROUP BY 1)
        |SELECT h.event_type, h.h, h.n,
        |  2 * h.n * t.n_buckets AS lhs, 3 * t.total AS rhs
        |FROM hourly h JOIN tot t ON t.event_type = h.event_type
        |WHERE 2 * h.n * t.n_buckets >= 3 * t.total
        |ORDER BY h.event_type, h.h""".stripMargin,

    "x16_bloom_semijoin" ->
      """WITH keys AS (SELECT DISTINCT p_partkey FROM part WHERE p_size = 1),
        |mm AS (SELECT GREATEST(10 * CAST(COUNT(*) AS BIGINT), 1) AS m FROM keys),
        |kb AS (SELECT DISTINCT bit FROM keys, mm, UNNEST(range(0, 3)) AS t(i),
        |  LATERAL (SELECT ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' ||
        |    CAST(p_partkey AS VARCHAR)), 1, 8))::BIGINT % m AS bit) b),
        |pk AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_rows
        |  FROM lineitem GROUP BY l_partkey),
        |pr AS (SELECT l_partkey, n_rows,
        |    ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' ||
        |      CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT % m AS bit
        |  FROM pk, mm, UNNEST(range(0, 3)) AS t(i)),
        |fl AS (SELECT l_partkey, n_rows,
        |    CASE WHEN SUM(CASE WHEN kb.bit IS NULL THEN 0 ELSE 1 END) = 3
        |      THEN 1 ELSE 0 END AS flagged
        |  FROM pr LEFT JOIN kb ON pr.bit = kb.bit
        |  GROUP BY l_partkey, n_rows),
        |au AS (SELECT fl.*, CASE WHEN keys.p_partkey IS NULL THEN 0 ELSE 1 END
        |    AS member
        |  FROM fl LEFT JOIN keys ON fl.l_partkey = keys.p_partkey)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_probe_keys,
        |  CAST(SUM(n_rows) AS BIGINT) AS n_probe_rows,
        |  CAST(SUM(CASE WHEN flagged = 1 THEN n_rows ELSE 0 END) AS BIGINT)
        |    AS n_flagged_rows,
        |  CAST(SUM(CASE WHEN flagged = 1 AND member = 1 THEN n_rows ELSE 0 END)
        |    AS BIGINT) AS n_true_rows,
        |  CAST(SUM(CASE WHEN flagged = 1 AND member = 0 THEN n_rows ELSE 0 END)
        |    AS BIGINT) AS n_false_pos_rows,
        |  CAST(SUM(CASE WHEN flagged = 0 AND member = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_false_neg_keys
        |FROM au""".stripMargin,

    "x12_ab_test" ->
      """WITH pu AS (SELECT user_id,
        |  MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicked,
        |  MAX(CASE WHEN event_type = 'purchase' AND value >= 75.0
        |    THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |a AS (SELECT user_id % 2 AS arm, conv FROM pu WHERE clicked = 1),
        |ar AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(conv) AS BIGINT) AS x FROM a GROUP BY arm),
        |w AS (SELECT
        |  CAST(SUM(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n0,
        |  CAST(SUM(CASE WHEN arm = 0 THEN x END) AS BIGINT) AS x0,
        |  CAST(SUM(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n1,
        |  CAST(SUM(CASE WHEN arm = 1 THEN x END) AS BIGINT) AS x1
        |  FROM ar),
        |d AS (SELECT n0, x0, n1, x1,
        |  sqrt((CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
        |    * (1.0 - CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
        |    * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))) AS den
        |  FROM w),
        |zz AS (SELECT n0, x0, n1, x1,
        |  CASE WHEN den = 0.0 THEN 0 ELSE
        |  CAST(floor(
        |    (CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE)
        |      - CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |    / den * 1000.0) AS BIGINT) END AS z_u
        |  FROM d)
        |SELECT n0, x0, n1, x1, z_u, abs(z_u) >= 1960 AS significant
        |FROM zz""".stripMargin,

    "w9_zscore_outliers" ->
      """WITH st AS (SELECT event_type, COUNT(*) AS n,
        |  SUM(CAST(value AS DECIMAL(18,2))) AS sx,
        |  SUM(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS sxx
        |  FROM events GROUP BY event_type)
        |SELECT event_id, e.event_type, value,
        |  CAST(floor((value - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |    / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
        |    * 1000.0) AS BIGINT) AS z_u
        |FROM events e JOIN st ON e.event_type = st.event_type
        |WHERE floor((value - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |    / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
        |    * 1000.0) >= 3000
        |ORDER BY event_id""".stripMargin,

    "x4_histogram" ->
      """SELECT o_orderpriority,
        |  CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket, COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority, bucket
        |ORDER BY o_orderpriority, bucket""".stripMargin,

    "x5_correlation" ->
      """WITH a AS (SELECT l_returnflag, COUNT(*) AS n,
        |  SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |  SUM(CAST(l_discount AS DECIMAL(18,2))) AS sy,
        |  SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS sxx,
        |  SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS sxy,
        |  SUM(CAST(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |    * 1e6) AS BIGINT) AS corr_u
        |FROM a ORDER BY l_returnflag""".stripMargin,

    "w6_rolling" ->
      """SELECT event_id, user_id, epoch_ms(ts)//1000 AS t,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS roll_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY epoch_ms(ts)//1000, event_id ROWS 2 PRECEDING)
        |ORDER BY event_id""".stripMargin
  )
}
