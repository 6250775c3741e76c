package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.Realtime

/** Batch-equivalent forms of the streaming operators (SURVEY.md §2.9) — the
  * same code paths (flatMapGroupsWithState, semi-joins, tumbling windows)
  * run in batch mode so DuckDB can oracle them; the genuinely-streaming
  * behaviors (TTL expiry, once-only re-delivery, watermarks) are covered by
  * ScalaTest with MemoryStream.
  */
object StreamingQueries {

  val all: Seq[Q] = Seq(

    // T2 completeness join, batch-run through the REAL flatMapGroupsWithState
    // operator: headers (orders + expected distinct-part count) and lines
    // (lineitem) are merged into one keyed event stream; a consolidated row
    // is emitted once per complete order.
    //
    // DOCUMENTED BENCH TRADE: this entry deliberately pays the typed-state
    // encoder boundary (one object round-trip per event row) that the real
    // streaming operator pays, instead of a pure-SQL rewrite that would ace
    // the bench while testing nothing of T2/T3. Expect it several× slower
    // than DuckDB's relational equivalent — that cost is the operator under
    // test, not engine waste; q22sql_order_completeness below is the same
    // semantics in pure relational form and isolates the engine's share.
    Q("q22_order_completeness",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val expected = li.groupBy(col("l_orderkey"))
          .agg(countDistinct(col("l_partkey")).cast("int").as("num_products"))
        val headers = Tables.orders(s, d)
          .join(expected, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderkey").as("orderId"), col("o_custkey").as("customerId"),
            col("num_products").as("numProducts"))
          .as[Realtime.OrderHeader]
          .map(h => Realtime.OrderEvent(h.orderId, Some(h), None))
        val lines = li
          .select(col("l_orderkey").as("orderId"), col("l_partkey").as("productId"))
          .as[Realtime.OrderLine]
          .map(l => Realtime.OrderEvent(l.orderId, None, Some(l)))
        Realtime.completenessJoin(headers.union(lines))
          .toDF()
          .select(col("orderId").as("order_id"), col("customerId").as("customer_id"),
            col("numProducts").as("num_products"),
            concat_ws(",", expr("transform(productIds, x -> CAST(x AS STRING))"))
              .as("product_ids"))
          .orderBy(col("order_id"))
      },
      Some("""WITH dl AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
             SELECT dl.l_orderkey AS order_id,
                    MIN(o_custkey) AS customer_id,
                    CAST(COUNT(*) AS INTEGER) AS num_products,
                    string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_partkey) AS product_ids
             FROM dl JOIN orders ON o_orderkey = dl.l_orderkey
             GROUP BY dl.l_orderkey ORDER BY order_id""")),

    // q22's semantics in pure relational form (distinct → join → hash agg,
    // no typed state, no encoder boundary): the bench companion that
    // separates the flatMapGroupsWithState operator's cost (q22) from the
    // engine's cost on the same work (this). Same oracle.
    Q("q22sql_order_completeness",
      (s, d) => {
        val dl = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        dl.join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("l_orderkey"))
          .agg(
            min(col("o_custkey")).as("customer_id"),
            count(lit(1)).cast("int").as("num_products"),
            concat_ws(",",
              expr("transform(array_sort(collect_list(l_partkey)), x -> CAST(x AS STRING))"))
              .as("product_ids"))
          .select(col("l_orderkey").as("order_id"), col("customer_id"),
            col("num_products"), col("product_ids"))
          .orderBy(col("order_id"))
      },
      Some("""WITH dl AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
             SELECT dl.l_orderkey AS order_id,
                    MIN(o_custkey) AS customer_id,
                    CAST(COUNT(*) AS INTEGER) AS num_products,
                    string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_partkey) AS product_ids
             FROM dl JOIN orders ON o_orderkey = dl.l_orderkey
             GROUP BY dl.l_orderkey ORDER BY order_id""")),

    // T4 eligibility: stream-static membership — events from high-balance
    // customers with an allowed event type, via broadcast left_semi joins
    // (the Redis SISMEMBER replacement).
    Q("q23_eligibility",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id").as("customerId"),
            col("event_type").as("paymentId"), col("value"))
        val diamond = Tables.customer(s, d)
          .filter(col("c_acctbal") > 9900)
          .select(col("c_custkey").as("customerId"))
        val allowed = {
          import s.implicits._
          Seq("purchase", "signup").toDF("paymentId")
        }
        Realtime.eligibility(ev, diamond, allowed)
          .select(col("event_id"), col("customerId").as("user_id"),
            col("paymentId").as("event_type"), col("value"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, event_type, value
             FROM events e
             WHERE EXISTS (SELECT 1 FROM customer c
                           WHERE c.c_custkey = e.user_id AND c.c_acctbal > 9900)
               AND event_type IN ('purchase', 'signup')
             ORDER BY event_id""")),

    // Event-time tumbling windows (the capability the reference lacks):
    // 1-hour windows × event_type, counts + exact decimal sums. Batch form
    // of Realtime.windowedCounts; watermark semantics tested in ScalaTest.
    Q("q24_windowed_agg",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(25,10)")).cast("double").as("sum_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type")),
      Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
                    CAST(COUNT(*) AS BIGINT) AS n_events,
                    CAST(SUM(CAST(value AS DECIMAL(25,10))) AS DOUBLE) AS sum_value
             FROM events
             GROUP BY 1, 2 ORDER BY window_start, event_type"""))
  )
}
