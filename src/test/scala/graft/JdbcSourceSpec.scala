package graft

import java.nio.file.Files
import java.sql.DriverManager
import org.apache.spark.sql.functions._
import graft.pipeline.Medallion

/** REAL JDBC integration (S1): Spark's built-in JDBC source against an
  * embedded Derby database — the one JDBC driver this environment ships.
  * Covers the reference's bounded-partition read shape
  * (`bronze_dimension_fact_load.py:46-57`): parallel range slices on the
  * partition column, filter pushdown into remote SQL, and the
  * JDBC → watermark → bronze-append composition. */
class JdbcSourceSpec extends SparkSpec {

  private lazy val dbDir = Files.createTempDirectory("derby_src").toString + "/db"
  private lazy val url = s"jdbc:derby:$dbDir;create=true"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def seed(): Unit = withConn { c =>
    val st = c.createStatement()
    st.executeUpdate(
      "CREATE TABLE orders_src (id INT PRIMARY KEY, v VARCHAR(20), updated_at TIMESTAMP)")
    val ps = c.prepareStatement("INSERT INTO orders_src VALUES (?, ?, ?)")
    (1 to 100).foreach { i =>
      ps.setInt(1, i)
      ps.setString(2, s"row$i")
      ps.setTimestamp(3, java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 08:00:00"))
      ps.addBatch()
    }
    ps.executeBatch()
    st.close(); ps.close()
  }

  private lazy val seeded = { seed(); true }

  test("bounded-partition JDBC read: parallel range slices, all rows") {
    assert(seeded)
    val df = Medallion.readJdbc(spark, url, "orders_src",
      partitionColumn = "id", lowerBound = 1L, upperBound = 101L, numPartitions = 4)
    assert(df.count() == 100)
    // the bounded read genuinely parallelizes: one range query per slice
    assert(df.rdd.getNumPartitions == 4)
    assert(df.columns.map(_.toLowerCase).toSeq == Seq("id", "v", "updated_at"))
  }

  test("filters and column pruning push into the remote SQL") {
    assert(seeded)
    val df = Medallion.readJdbc(spark, url, "orders_src", "id", 1L, 101L, 2)
      .filter(col("ID") > 50)
      .select(col("ID"))
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("GreaterThan(ID,50)"),
      s"filter did not push into JDBC scan:\n$physical")
    assert(df.count() == 50)
  }

  test("JDBC source composes with the watermarked bronze append") {
    assert(seeded)
    val target = Files.createTempDirectory("brz_jdbc").toString + "/orders"
    def src = {
      val d = Medallion.readJdbc(spark, url, "orders_src", "id", 1L, 201L, 4)
      d.toDF(d.columns.map(_.toLowerCase): _*)
    }
    assert(Medallion.bronzeIncremental(spark, src, "updated_at", target) == 100L)
    // late-arriving source rows BEYOND the watermark: only the delta lands
    withConn { c =>
      val ps = c.prepareStatement("INSERT INTO orders_src VALUES (?, ?, ?)")
      Seq(101, 102).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"row$i")
        ps.setTimestamp(3, java.sql.Timestamp.valueOf("2024-02-05 09:00:00"))
        ps.addBatch()
      }
      ps.executeBatch(); ps.close()
    }
    assert(Medallion.bronzeIncremental(spark, src, "updated_at", target) == 2L)
    assert(spark.read.parquet(target).count() == 102L)
  }
}
