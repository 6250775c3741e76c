package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions
import graft.operators.Similarity
import graft.sources.Tables

/** The SQL-text surface (COVERAGE.md §2.11): a session built with
  * GraftExtensions serves registered queries as plain `spark.sql` text over
  * temp views, with results identical to the DataFrame forms, and the
  * injected graft_dot64 + NativeDotRewrite active for SQL users. */
class SqlSurfaceSpec extends SparkSpec {

  /** Fresh session sharing the test SparkContext, with GraftExtensions
    * applied (extensions only take effect at session construction). */
  private def withExtSession[A](f: SparkSession => A): A = {
    val prev = spark // materialize the shared fixture first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try f(ext)
    finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  private val d = "/root/testdata/sf0.001"

  test("registered queries run as SQL text over temp views, matching the DataFrame forms") {
    withExtSession { s =>
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      Tables.orders(s, d).createOrReplaceTempView("orders")

      // q01 shape: scan → filter → project
      val sql01 = s.sql(
        """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
          |       l_extendedprice * (1 - l_discount) AS net_price
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_quantity > 45
          |ORDER BY l_orderkey, l_linenumber""".stripMargin)
      val df01 = SparkEntry.queries("q01_scan_filter_project")(s, d)
      assert(sql01.collect().toSeq == df01.collect().toSeq)

      // q27 shape: one-scan conditional aggregation
      val sql27 = s.sql(
        """SELECT CASE WHEN MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) = 1
          |            THEN 'high_and_urgent' ELSE 'high_only' END AS segment,
          |       o_custkey AS custkey
          |FROM orders GROUP BY o_custkey
          |HAVING MAX(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) = 1
          |ORDER BY segment, custkey""".stripMargin)
      val df27 = SparkEntry.queries("q27_set_ops")(s, d)
      assert(sql27.collect().toSeq == df27.collect().toSeq)
    }
  }

  test("GraftExtensions injects graft_dot64 for SQL text and rewrites the HOF dot") {
    withExtSession { s =>
      Tables.embeddings(s, d).limit(50)
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
        .createOrReplaceTempView("qemb")

      // the injected function is directly callable from SQL text
      val direct = s.sql("SELECT vec_id, graft_dot64(q, q) AS d FROM qemb ORDER BY vec_id")
      val viaApi = s.table("qemb")
        .select(col("vec_id"),
          graft.functions.GraftFunctions.longArrayDot(col("q"), col("q")).as("d"))
        .orderBy("vec_id")
      assert(direct.collect().toSeq == viaApi.collect().toSeq)

      // the injected matrix-dot is SQL-callable (constant matrix) and
      // agrees with graft_dot64 against the same constant row
      val ones = (1 to 64).map(_ => "1L").mkString(",")
      val mat = s.sql(
        s"""SELECT vec_id,
           |  graft_matdot(q, array(array($ones), array($ones))) AS dd,
           |  graft_dot64(q, array($ones)) AS d
           |FROM qemb ORDER BY vec_id""".stripMargin)
      assert(mat.collect().forall(r =>
        r.getSeq[Long](1) == Seq(r.getLong(2), r.getLong(2))))

      // the injected optimizer rule rewrites the idiomatic HOF form written
      // by a SQL user into the native expression — plan-asserted
      val hof = s.sql(
        """SELECT vec_id,
          |  aggregate(zip_with(q, q, (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS d
          |FROM qemb ORDER BY vec_id""".stripMargin)
      assert(hof.queryExecution.optimizedPlan.toString.contains("graft_dot64"))
      assert(hof.collect().toSeq == direct.collect().toSeq)

      // the injected KMV aggregate is SQL-callable and dedupes planted copies
      val kmv = s.sql(
        """SELECT graft_kmv(h, 16).n_seen AS n FROM (
          |  SELECT CAST(conv(substr(md5(CAST(id % 10 AS STRING)), 1, 15), 16, 10)
          |    AS BIGINT) AS h
          |  FROM range(1000))""".stripMargin).collect().head.getLong(0)
      assert(kmv == 10L) // 1000 rows, 10 distinct hashes, set semantics
    }
  }

  test("SQL over versioned gold skips manifest-rejected files in the executed plan") {
    withExtSession { s =>
      import graft.pipeline.{DataSkipping, Medallion}
      val root = java.nio.file.Files
        .createTempDirectory("graft-sql-gold").toString + "/tbl"
      val df = s.range(1000).select(col("id").as("k"),
        (col("id") % 13).cast("double").as("v"))
      Medallion.publishGold(s, df.repartitionByRange(4, col("k")), root)
      assert(DataSkipping.indexGoldCurrent(s, root, Seq("k")) == 4)
      // plain SQL text over a view of the published table — no
      // readGoldSkipping call anywhere in this path
      Medallion.readGold(s, root).createOrReplaceTempView("gold_tbl")
      val q = s.sql("SELECT k, v FROM gold_tbl WHERE k >= 900 ORDER BY k")
      val loc = q.queryExecution.optimizedPlan.collectFirst {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
            if lr.relation.isInstanceOf[
              org.apache.spark.sql.execution.datasources.HadoopFsRelation] =>
          lr.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation].location
      }
      assert(loc.exists(_.isInstanceOf[graft.plans.PrunedFileIndex]),
        "gold SQL read must plan through the manifest-pruned file index")
      assert(loc.get.inputFiles.length == 1,
        s"k>=900 selects one of 4 range-split files, planned ${loc.get.inputFiles.length}")
      assert(q.collect().map(_.getLong(0)).toSeq == (900L until 1000L))
    }
  }
}
