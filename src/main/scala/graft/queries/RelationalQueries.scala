package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions

/** The relational substrate (SURVEY §2.2-2.7): scans, filters, joins,
  * aggregations, windows, top-k, set ops — exercised over the driver's
  * TPC-H-ish tables so every one has a DuckDB oracle.
  *
  * Determinism rules applied throughout:
  *  - every output is ORDER BY'd on a unique key in BOTH engines;
  *  - no raw double aggregates: sums/avgs are rounded (floating partial-agg
  *    order differs between engines AND between Spark runs). Money/value
  *    sums go further and use the exact-cents idiom —
  *    `sum(round(x * 100, 0)::BIGINT)` — so the aggregate is integer math
  *    and NO partition/merge order can flip a digit. The per-row
  *    round-half parity between Spark (HALF_UP) and DuckDB (C++
  *    half-away-from-zero) holds because every |x·100| here is < 2^52,
  *    where x.5 is exactly representable in a double;
  *  - counts are BIGINT both sides (DuckDB `count(*)` is BIGINT; its
  *    `sum(int)` is HUGEINT, so oracles cast).
  */
object RelationalQueries {

  val defs: Seq[QueryDef] = Seq(

    // ── A-family: aggregation (SURVEY §2.4) ────────────────────────────────
    QueryDef.sql("q1_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |       sum(round(l_quantity * 100, 0)::BIGINT)::BIGINT AS sum_qty_cents,
        |       sum(round(l_extendedprice * 100, 0)::BIGINT)::BIGINT AS sum_price_cents,
        |       sum(round(l_extendedprice * (1 - l_discount) * 100, 0)::BIGINT)::BIGINT AS sum_disc_price_cents,
        |       round(avg(l_discount), 6) AS avg_disc,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(round(col("l_quantity") * 100, 0).cast("long")).as("sum_qty_cents"),
          sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("sum_price_cents"),
          sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
            .cast("long")).as("sum_disc_price_cents"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    QueryDef.sql("a4_event_type_stats",
      """SELECT event_type,
        |       count(*) AS n,
        |       sum(round(value * 100, 0)::BIGINT)::BIGINT AS sum_value_cents,
        |       count(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100, 0).cast("long")).as("sum_value_cents"),
          countDistinct("user_id").as("n_users"))
        .orderBy("event_type")
    },

    // ── P-family: filter + projection pushdown (SURVEY §2.2) ───────────────
    QueryDef.sql("p1_filter_project",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > 100000 AND o_orderstatus = 'O'
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_totalprice") > 100000 && col("o_orderstatus") === "O")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // ── J-family: joins (SURVEY §2.3) ──────────────────────────────────────
    QueryDef.sql("j1_hit_lookup",
      """SELECT doc_id, source, lang, n_chars
        |FROM documents
        |WHERE doc_id IN (5, 17, 42, 99, 123, 256, 499)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // Reference shape: hit-id set → batched doc lookup
      // (/root/reference/query/search.py:94-101). The hit set is a tiny
      // in-memory relation → broadcast hash join, no shuffle of documents.
      import s.implicits._
      val hits = Seq(5L, 17L, 42L, 99L, 123L, 256L, 499L).toDF("doc_id")
      Tables.documents(s, dir)
        .join(broadcast(hits), "doc_id")
        .select("doc_id", "source", "lang", "n_chars")
        .orderBy("doc_id")
    },

    QueryDef.sql("j6_anti_join",
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_custkey NOT IN
        |      (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      // S5/J6 incremental-ingest skip as a left-anti join
      // (/root/reference/database/db_manager.py:349-374).
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    QueryDef.sql("j_star_revenue",
      """SELECT n_name,
        |       sum(round(l_extendedprice * (1 - l_discount) * 100, 0)::BIGINT)::BIGINT AS revenue_cents,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin) { (s, dir) =>
      // Star join: fact lineitem ⋈ orders shuffles on the join key; the
      // small dims (customer at this SF, nation always) broadcast — at
      // 100 TB customer stops broadcasting and AQE picks shuffle-hash.
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
            .cast("long")).as("revenue_cents"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    },

    // ── q5-style local-supplier volume: six-table join with a cross-table
    //    equality (c_nationkey = s_nationkey) — the deepest join shape in
    //    the substrate; region/nation broadcast, fact-side joins shuffle ────
    QueryDef.sql("q5_local_supplier",
      """SELECT n_name,
        |       sum(round(l_extendedprice * (1 - l_discount) * 100, 0)::BIGINT)::BIGINT AS revenue_cents,
        |       count(*) AS n_items
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name IN ('ASIA', 'EUROPE')
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, dir),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name").isin("ASIA", "EUROPE"))
        .groupBy("n_name")
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
            .cast("long")).as("revenue_cents"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    },

    // ── q18-style large-volume orders: HAVING-filtered agg drives a
    //    semi-join back onto the fact — the agg output (not the fact) is
    //    the build side at any scale ─────────────────────────────────────────
    QueryDef.sql("q18_large_orders",
      """WITH big AS (
        |  SELECT l_orderkey, sum(round(l_quantity * 100, 0)::BIGINT)::BIGINT AS sum_qty_cents
        |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 220)
        |SELECT c_name, o_orderkey, round(o_totalprice, 2) AS o_totalprice, sum_qty_cents
        |FROM big
        |JOIN orders   ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      // HAVING keeps the raw sum: quantity is integer-valued, so the double
      // sum is exact and the predicate deterministic either way
      val big = Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(sum(round(col("l_quantity") * 100, 0).cast("long")).as("sum_qty_cents"),
          sum("l_quantity").as("_raw_qty"))
        .filter(col("_raw_qty") > 220).drop("_raw_qty")
      big.join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"), col("sum_qty_cents"))
        .orderBy("o_orderkey")
    },

    // ── T-family: top-k (SURVEY §2.6) ──────────────────────────────────────
    QueryDef.sql("t1_topk_orders",
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin) { (s, dir) =>
      // orderBy+limit → TakeOrderedAndProject: per-partition heap, driver
      // merge of 32 k-sized heaps — the distributed form of the heapq the
      // reference hand-rolls (/root/reference/embedding/bm25_manager.py:294-313).
      Tables.orders(s, dir)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },

    // ── W-family: windows (SURVEY §2.5) ────────────────────────────────────
    QueryDef.sql("w1_rank_per_customer",
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
        .orderBy("o_custkey", "rn")
    },

    QueryDef.sql("w3_running_sum",
      """SELECT user_id, event_id,
        |       sum(round(value * 100, 0)::BIGINT) OVER (PARTITION BY user_id
        |                              ORDER BY ts, event_id)::BIGINT AS running_cents
        |FROM events
        |WHERE user_id < 50
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      Tables.events(s, dir)
        .filter(col("user_id") < 50)
        .withColumn("running_cents",
          sum(round(col("value") * 100, 0).cast("long")).over(w))
        .select("user_id", "event_id", "running_cents")
        .orderBy("user_id", "event_id")
    },

    // ── U-family: set ops (SURVEY §2.7) ────────────────────────────────────
    QueryDef.sql("u2_union_distinct",
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
        |  UNION
        |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000)
        |ORDER BY custkey""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir).filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("custkey"))
        .union(Tables.customer(s, dir).filter(col("c_acctbal") > 9000)
          .select(col("c_custkey").as("custkey")))
        .distinct()
        .orderBy("custkey")
    },

    // ── U: intersect / except (SURVEY §2.7 "built-in if needed") ──────────
    QueryDef.sql("u3_intersect_except",
      """WITH big_orders AS (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000),
        |rich AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000),
        |in_both AS (SELECT custkey FROM big_orders INTERSECT SELECT custkey FROM rich),
        |only_rich AS (SELECT custkey FROM rich EXCEPT SELECT custkey FROM big_orders)
        |SELECT 'both' AS grp, custkey FROM in_both
        |UNION ALL
        |SELECT 'only_rich' AS grp, custkey FROM only_rich
        |ORDER BY grp, custkey""".stripMargin) { (s, dir) =>
      val bigOrders = Tables.orders(s, dir).filter(col("o_totalprice") > 150000)
        .select(col("o_custkey").as("custkey"))
      val rich = Tables.customer(s, dir).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey"))
      bigOrders.intersect(rich).withColumn("grp", lit("both"))
        .unionByName(rich.except(bigOrders).withColumn("grp", lit("only_rich")))
        .select("grp", "custkey")
        .orderBy("grp", "custkey")
    },

    // ── TPC-H Q3 shape: shipping priority — segment-filtered customer dim
    //    broadcasts as a semi-join; date filters push to both fact scans ────
    QueryDef.sql("q3_shipping_priority",
      """SELECT l_orderkey,
        |       sum(round(l_extendedprice * (1 - l_discount) * 100, 0)::BIGINT)::BIGINT AS revenue_cents,
        |       epoch_us(o_orderdate)::BIGINT AS orderdate_us
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
        .join(broadcast(Tables.customer(s, dir)
            .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .join(Tables.lineitem(s, dir)
            .filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
          .cast("long")).as("revenue_cents"))
        .select(col("l_orderkey"), col("revenue_cents"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("orderdate_us"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey"))
        .limit(10)
    },

    // ── W5: trailing 7-day revenue via a RANGE window frame over integer
    //    epoch-seconds (identical frame semantics in both engines; revenue
    //    carried as exact integer cents).
    //    CONTRACT (rerankHead-style, GlobalWindowContractSpec): the global
    //    `Window.orderBy` runs on the POST-AGGREGATION daily grid — one row
    //    per calendar day, so cardinality is bounded by the date span
    //    (thousands of rows at ANY corpus scale), never by corpus size.
    //    Feeding event-grain rows through this frame would single-partition
    //    the corpus; at that grain, partition by a coarse time key (e.g.
    //    month) with a boundary-overlap merge instead. ──────────────────────
    QueryDef.sql("w5_trailing_revenue",
      """WITH daily AS (
        |  SELECT epoch(date_trunc('day', o_orderdate))::BIGINT AS day_s,
        |         sum(round(o_totalprice * 100, 0)::BIGINT)::BIGINT AS daily_cents
        |  FROM orders GROUP BY 1)
        |SELECT day_s, daily_cents,
        |       sum(daily_cents) OVER (ORDER BY day_s
        |         RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW)::BIGINT AS trailing7_cents
        |FROM daily ORDER BY day_s""".stripMargin) { (s, dir) =>
      val daily = Tables.orders(s, dir)
        .groupBy(unix_timestamp(date_trunc("day", col("o_orderdate"))).as("day_s"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("daily_cents"))
      daily
        .withColumn("trailing7_cents", sum("daily_cents").over(
          Window.orderBy(col("day_s")).rangeBetween(-6 * 86400L, 0L)))
        .orderBy("day_s")
    },

    // ── TPC-H Q6 shape: forecast revenue (pure filter-aggregate, fully
    //    pushed to the scan) ────────────────────────────────────────────────
    QueryDef.sql("q6_forecast_revenue",
      """SELECT sum(round(l_extendedprice * l_discount * 100, 0)::BIGINT)::BIGINT AS revenue_cents,
        |       count(*)::BIGINT AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.09
        |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.02, 0.09) && col("l_quantity") < 24)
        .agg(sum(round(col("l_extendedprice") * col("l_discount") * 100, 0)
            .cast("long")).as("revenue_cents"),
          count(lit(1)).as("n"))
    },

    // ── Correlated scalar subquery (Catalyst decorrelation; SURVEY §4
    //    "constant folding / join reorder / subquery decorrelation built-
    //    in") — served through spark.sql to exercise the SQL surface ───────
    QueryDef.sql("p9_correlated_subquery",
      """SELECT c_custkey, round(c_acctbal, 2) AS acctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey) * 1.5
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      s.sql(
        """SELECT c_custkey, round(c_acctbal, 2) AS acctbal
          |FROM customer_v c
          |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer_v c2
          |                   WHERE c2.c_nationkey = c.c_nationkey) * 1.5
          |ORDER BY c_custkey""".stripMargin)
    },

    // ── J8: as-of (point-in-time) join — for each purchase, the latest view
    //    at-or-before it per user. Spark side is the single-shuffle
    //    union-sort-fill operator; the oracle uses DuckDB's native ASOF ────
    QueryDef.sql("j8_asof_join",
      """WITH v AS (
        |  SELECT user_id, epoch_us(ts)::BIGINT AS ts, round(max(value), 2) AS value
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |p AS (
        |  SELECT event_id, user_id, epoch_us(ts)::BIGINT AS ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts AS purchase_us,
        |       v.ts AS asof_ts, v.value AS asof_value
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
      // right side pre-aggregated per (user, ts): AsofJoin's determinism
      // contract (ties at one timestamp must have a single winner).
      // Comparison in MICROS on both sides — DuckDB reads the nanos parquet
      // timestamps truncated to micro precision.
      val ev = Tables.events(s, dir) // ts is LongType nanos (nanosAsLong)
        .withColumn("ts_us", expr("ts div 1000"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "ts_us").agg(round(max("value"), 2).as("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_us")
      graft.operators.AsofJoin.asofLast(purchases, views, "user_id", "ts_us",
          Seq("ts_us", "value"))
        .select(col("event_id"), col("user_id"), col("ts_us").as("purchase_us"),
          col("asof_ts_us").as("asof_ts"), col("asof_value"))
        .orderBy("event_id")
    },

    // ── A9: cube (all grouping-set combinations; SURVEY §2.4 family) ──────
    QueryDef.sql("a9_cube",
      """SELECT coalesce(event_type, 'ALL') AS etype,
        |       coalesce((user_id % 10)::VARCHAR, 'ALL') AS cohort,
        |       count(*)::BIGINT AS n,
        |       sum(round(value * 100, 0)::BIGINT)::BIGINT AS sum_value_cents
        |FROM events
        |GROUP BY CUBE (event_type, user_id % 10)
        |ORDER BY etype, cohort""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .cube(col("event_type"), (col("user_id") % 10).as("cohort0"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100, 0).cast("long")).as("sum_value_cents"))
        .select(coalesce(col("event_type"), lit("ALL")).as("etype"),
          coalesce(col("cohort0").cast("string"), lit("ALL")).as("cohort"),
          col("n"), col("sum_value_cents"))
        .orderBy("etype", "cohort")
    },

    // ── A10: pivot (wide aggregation; oracle is the CASE-sum expansion) ───
    QueryDef.sql("a10_pivot",
      """SELECT user_id % 10 AS cohort,
        |       count(CASE WHEN event_type = 'click' THEN 1 END)::BIGINT AS click,
        |       count(CASE WHEN event_type = 'error' THEN 1 END)::BIGINT AS error,
        |       count(CASE WHEN event_type = 'purchase' THEN 1 END)::BIGINT AS purchase,
        |       count(CASE WHEN event_type = 'signup' THEN 1 END)::BIGINT AS signup,
        |       count(CASE WHEN event_type = 'view' THEN 1 END)::BIGINT AS view
        |FROM events GROUP BY 1 ORDER BY cohort""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy((col("user_id") % 10).as("cohort"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))
        .orderBy("cohort")
    },

    // ── TPC-H Q4 shape: late shipments per priority — EXISTS becomes a
    //    left-semi join; the fact side is pre-filtered before the semi so
    //    only qualifying lineitem keys ever shuffle ──────────────────────────
    QueryDef.sql("q4_priority_late",
      """SELECT o_orderpriority, count(*)::BIGINT AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },

    // ── TPC-H Q7 shape: cross-nation trade volume by year — the nation dims
    //    broadcast twice under different aliases; the fact joins shuffle ────
    QueryDef.sql("q7_nation_volume",
      """SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
        |       year(l_shipdate)::INT AS l_year,
        |       sum(round(l_extendedprice * (1 - l_discount) * 100, 0)::BIGINT)::BIGINT AS revenue_cents
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ns ON s_nationkey = ns.n_nationkey
        |JOIN nation nc ON c_nationkey = nc.n_nationkey
        |WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        |    OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val ns = Tables.nation(s, dir)
        .select(col("n_nationkey").as("ns_key"), col("n_name").as("supp_nation"))
      val nc = Tables.nation(s, dir)
        .select(col("n_nationkey").as("nc_key"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(ns), col("s_nationkey") === col("ns_key"))
        .join(broadcast(nc), col("c_nationkey") === col("nc_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("int").as("l_year"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
          .cast("long")).as("revenue_cents"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // ── TPC-H Q10 shape: returned-item revenue per customer, top 20 — agg
    //    first, then TakeOrderedAndProject; the customer dim joins AFTER the
    //    top-k so only 20 rows probe it ─────────────────────────────────────
    QueryDef.sql("q10_returned_items",
      """WITH ret AS (
        |  SELECT o_custkey,
        |         sum(round(l_extendedprice * (1 - l_discount) * 100, 0)::BIGINT)::BIGINT AS revenue_cents
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |  GROUP BY o_custkey
        |  ORDER BY revenue_cents DESC, o_custkey LIMIT 20)
        |SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal, revenue_cents
        |FROM ret JOIN customer ON c_custkey = o_custkey
        |ORDER BY revenue_cents DESC, c_custkey""".stripMargin) { (s, dir) =>
      val ret = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
          .cast("long")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("o_custkey"))
        .limit(20)
      ret.join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("acctbal"), col("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("c_custkey"))
    },

    // ── TPC-H Q14 shape: promo revenue share — conditional aggregation over
    //    one join; cents-exact integer sums make the ratio deterministic ────
    QueryDef.sql("q14_promo_share",
      """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
        |         THEN round(l_extendedprice * (1 - l_discount) * 100, 0)::BIGINT
        |         ELSE 0 END)::DOUBLE
        |       / sum(round(l_extendedprice * (1 - l_discount) * 100, 0)::BIGINT)::DOUBLE,
        |       6) AS promo_share_pct,
        |       count(*)::BIGINT AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-07-01'""".stripMargin) { (s, dir) =>
      val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
        .cast("long")
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
        .join(Tables.part(s, dir).select("p_partkey", "p_type"),
          col("l_partkey") === col("p_partkey"))
        .agg(
          round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", cents).otherwise(lit(0L))).cast("double") /
            sum(cents).cast("double"), 6).as("promo_share_pct"),
          count(lit(1)).as("n_items"))
    },

    // ── TPC-H Q15 shape: top supplier(s) by revenue — the scalar max
    //    subquery broadcasts one row back against the per-supplier agg ──────
    QueryDef.sql("q15_top_supplier",
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         sum(round(l_extendedprice * (1 - l_discount) * 100, 0)::BIGINT)::BIGINT AS total_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_cents
        |FROM rev JOIN supplier ON s_suppkey = l_suppkey
        |WHERE total_cents = (SELECT max(total_cents) FROM rev)
        |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
          .cast("long")).as("total_cents"))
      val top = rev.agg(max("total_cents").as("max_cents"))
      rev.join(broadcast(top), col("total_cents") === col("max_cents"))
        .join(Tables.supplier(s, dir), col("s_suppkey") === col("l_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_cents"))
        .orderBy("s_suppkey")
    },

    // ── TPC-H Q16 shape: supplier diversity per part bucket — distinct agg
    //    over the lineitem bridge (no partsupp table at this schema), with a
    //    NOT-IN brand exclusion pushed to the part scan ──────────────────────
    QueryDef.sql("q16_part_suppliers",
      """SELECT p_type, p_size, count(DISTINCT l_suppkey)::BIGINT AS n_suppliers
        |FROM part JOIN lineitem ON l_partkey = p_partkey
        |WHERE p_brand NOT IN ('Brand#1', 'Brand#2') AND p_size IN (1, 4, 9, 16, 25)
        |GROUP BY p_type, p_size
        |ORDER BY n_suppliers DESC, p_type, p_size""".stripMargin) { (s, dir) =>
      Tables.part(s, dir)
        .filter(!col("p_brand").isin("Brand#1", "Brand#2") &&
          col("p_size").isin(1, 4, 9, 16, 25))
        .join(Tables.lineitem(s, dir).select("l_partkey", "l_suppkey"),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("n_suppliers"))
        .orderBy(col("n_suppliers").desc, col("p_type"), col("p_size"))
    },

    // ── TPC-H Q19 shape: disjunctive join predicates — each OR branch pairs
    //    brand with quantity/size bands; Catalyst extracts the common
    //    l_partkey = p_partkey equi-condition so this stays a hash join with
    //    a residual filter, never a nested loop ──────────────────────────────
    QueryDef.sql("q19_disjunctive",
      """SELECT sum(round(l_extendedprice * (1 - l_discount) * 100, 0)::BIGINT)::BIGINT AS revenue_cents,
        |       count(*)::BIGINT AS n
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#9' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
        |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.part(s, dir), col("p_partkey") === col("l_partkey"))
        .filter(
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) && col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#9" && col("p_size").between(10, 30) && col("l_quantity").between(10, 40)) ||
          (col("p_brand") === "Brand#15" && col("p_size").between(20, 50) && col("l_quantity").between(20, 50)))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
            .cast("long")).as("revenue_cents"),
          count(lit(1)).as("n"))
    },

    // ── TPC-H Q22 shape: well-funded customers with no orders — scalar avg
    //    subquery (broadcast 1 row) + left-anti join against orders ─────────
    QueryDef.sql("q22_no_orders",
      """WITH cutoff AS (SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0)
        |SELECT c_nationkey,
        |       count(*)::BIGINT AS n_customers,
        |       sum(round(c_acctbal * 100, 0)::BIGINT)::BIGINT AS balance_cents
        |FROM customer
        |WHERE c_acctbal > (SELECT a FROM cutoff)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      val cust = Tables.customer(s, dir)
      val cutoff = cust.filter(col("c_acctbal") > 0)
        .agg(avg("c_acctbal").as("a"))
      cust
        .join(broadcast(cutoff), col("c_acctbal") > col("a"))
        .join(Tables.orders(s, dir).select("o_custkey"),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_customers"),
          sum(round(col("c_acctbal") * 100, 0).cast("long")).as("balance_cents"))
        .orderBy("c_nationkey")
    },

    // ── W6: analytic-function breadth — ntile / percent_rank / cume_dist /
    //    lead / first_value share ONE window sort (same partition+order key),
    //    so the plan has a single exchange + sort for all five ───────────────
    QueryDef.sql("w6_analytics",
      """SELECT o_orderkey, o_orderpriority,
        |       ntile(4) OVER w AS quartile,
        |       round(percent_rank() OVER w, 6) AS pct_rank,
        |       round(cume_dist() OVER w, 6) AS cume,
        |       lead(o_orderkey) OVER w AS next_key,
        |       first_value(o_orderkey) OVER w AS top_key
        |FROM orders
        |WHERE o_totalprice > 250000
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, pct_rank, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .filter(col("o_totalprice") > 250000)
        .select(col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"),
          lead("o_orderkey", 1).over(w).as("next_key"),
          first("o_orderkey").over(w).as("top_key"))
        .orderBy("o_orderpriority", "pct_rank", "o_orderkey")
    },

    // ── A17: KMV distinct-count sketch — a DETERMINISTIC approximate
    //    aggregate (shared polyHash ⇒ the oracle reproduces the estimate
    //    exactly). Bounded k-long buffer per group with map-side combine:
    //    each partition ships ≤ k values per group to the shuffle, where
    //    count(DISTINCT) ships every distinct value ──────────────────────────
    QueryDef.sql("a17_kmv_distinct", {
      val k = 64
      s"""WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
         |h AS (SELECT event_type,
         |             ${OracleSql.polyHashSql("sha256('u' || user_id::VARCHAR)")} AS h
         |      FROM du),
         |ranked AS (SELECT event_type, h,
         |                  row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |           FROM (SELECT DISTINCT event_type, h FROM h)),
         |kept AS (SELECT event_type, count(*)::INT AS n_kept, max(h)::BIGINT AS kth_hash
         |         FROM ranked WHERE rn <= $k GROUP BY 1),
         |exact AS (SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_n
         |          FROM events GROUP BY 1),
         |est AS (SELECT event_type, n_kept, kth_hash,
         |               CASE WHEN n_kept < $k THEN n_kept::DOUBLE
         |                    ELSE round(${k - 1} * 1000000007.0 / kth_hash::DOUBLE, 4)
         |               END AS est
         |        FROM kept)
         |SELECT event_type, n_kept, kth_hash, est, exact_n,
         |       round(abs(est - exact_n::DOUBLE) / exact_n::DOUBLE * 100, 2) AS err_pct
         |FROM est JOIN exact USING (event_type)
         |ORDER BY event_type""".stripMargin
    }) { (s, dir) =>
      val k = 64
      val hashed = Tables.events(s, dir)
        .select(col("event_type"), col("user_id"),
          graft.operators.Sketches.uniformHash(
            concat(lit("u"), col("user_id").cast("string"))).as("h"))
      val sk = hashed.groupBy("event_type")
        .agg(graft.operators.Sketches.kmv(k)(col("h")).as("sk"),
          countDistinct("user_id").as("exact_n"))
      sk.select(col("event_type"),
          col("sk.n_kept").as("n_kept"), col("sk.kth_hash").as("kth_hash"),
          graft.operators.Sketches.estimate(col("sk"), k).as("est"),
          col("exact_n"))
        .withColumn("err_pct",
          round(abs(col("est") - col("exact_n").cast("double")) /
            col("exact_n").cast("double") * 100, 2))
        .orderBy("event_type")
    },

    // ── A: rollup (multi-level aggregation; SURVEY §2.4 "built-in") ───────
    QueryDef.sql("a8_rollup_revenue",
      """SELECT coalesce(r_name, 'ALL') AS region,
        |       coalesce(n_name, 'ALL') AS nation,
        |       sum(round(c_acctbal * 100, 0)::BIGINT)::BIGINT AS balance_cents,
        |       count(*)::BIGINT AS customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region, nation""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(sum(round(col("c_acctbal") * 100, 0).cast("long")).as("balance_cents"),
          count(lit(1)).as("customers"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("balance_cents"), col("customers"))
        .orderBy("region", "nation")
    })
}
