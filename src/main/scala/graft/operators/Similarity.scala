package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.GraftFunctions

/** Vector-similarity operators over an embedding column (`array<float>`):
  * exact brute-force top-k / near-dup pairs, and a deterministic
  * random-hyperplane LSH path for approximate search at corpus scale.
  *
  * Training-data-pipeline extension (the reference has no vector ops).
  *
  * Determinism: exact paths compute dot products in fixed-point integer
  * arithmetic via zip_with+aggregate — integer addition is exact and
  * order-independent, so results are bit-identical across engines and
  * partitionings (a double sum would depend on reduction order). The LSH
  * path derives its hyperplanes from md5, so signatures are reproducible
  * run-to-run with no RNG state.
  *
  * Scale design: queries are broadcast against a partitioned candidate set
  * (no shuffle of the big side); ranking uses a per-query window (keys =
  * queries, each partition holds one query's candidates). The all-pairs
  * near-dup is quadratic by nature — production path is [[annCandidates]]
  * bucketing, with exact re-scoring only inside buckets.
  */
object Similarity {

  /** Deterministic fixed-point dot product: each float is quantized to
    * floor(x·2^20) (exact — double×power-of-two then floor), products and
    * sums are 64-bit integer math, the result is scaled back by 2^40.
    * Every step is exact in both Spark and DuckDB, so the resulting double
    * is bit-identical across engines and partitionings. (Float→DECIMAL casts
    * are NOT portable — the engines round the binary value differently.)
    * Quantization error ≤ ~1e-4 on unit vectors — irrelevant for ranking
    * and thresholding, which is what this feeds. */
  def dotFixedPoint(a: Column, b: Column): Column =
    expr(s"""aggregate(
      zip_with(${a.toString}, ${b.toString},
        (x, y) -> floor(CAST(x AS DOUBLE) * 1048576.0D) * floor(CAST(y AS DOUBLE) * 1048576.0D)),
      0L, (acc, v) -> acc + v)""") / lit(1099511627776.0d)

  /** Quantize a float vector to fixed-point longs ONCE — pair-wise dots then
    * reduce to multiply+sum (`dotQuantized`). On an all-pairs join this cuts
    * per-pair lambda work to a third vs [[dotFixedPoint]]. */
  def quantize(vec: Column): Column =
    expr(s"transform(${vec.toString}, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0D) AS BIGINT))")

  /** Dot of two pre-[[quantize]]d vectors, scaled back to the double dot. */
  def dotQuantized(a: Column, b: Column): Column =
    expr(s"""aggregate(zip_with(${a.toString}, ${b.toString}, (x, y) -> x * y),
      0L, (acc, v) -> acc + v)""") / lit(1099511627776.0d)

  /** Double-precision cosine for non-oracled paths (unit vectors ⇒ dot). */
  def dotDouble(a: Column, b: Column): Column =
    expr(s"""aggregate(
      zip_with(${a.toString}, ${b.toString}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
      CAST(0 AS DOUBLE), (acc, v) -> acc + v)""")

  def cosineDouble(a: Column, b: Column): Column =
    dotDouble(a, b) / (sqrt(dotDouble(a, a)) * sqrt(dotDouble(b, b)))

  /** Exact brute-force top-k by dot product: each query (broadcast, small)
    * against every candidate (partitioned, huge). Deterministic tiebreak on
    * neighbor id. Self-matches excluded. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     queryPred: Column, k: Int): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val queries = emb.filter(queryPred)
      .select(col(idCol).as("query_id"), quantize(col(vecCol)).as("__qv"))
    val cands = emb.select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("__cv"))
    val scored = cands.crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("__dot",
        GraftFunctions.longArrayDot(col("__qv"), col("__cv")) / lit(1099511627776.0d))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__dot").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("__dot").as("dot"))
  }

  /** Exact near-dup pairs: all (a < b) pairs with dot ≥ threshold.
    * Quadratic — fine for verification scale; at corpus scale call
    * [[annCandidates]] first and re-score only bucket-mates. */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val a = emb.select(col(idCol).as("vec_a"), quantize(col(vecCol)).as("__va"))
    val b = emb.select(col(idCol).as("vec_b"), quantize(col(vecCol)).as("__vb"))
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("__dot",
        GraftFunctions.longArrayDot(col("__va"), col("__vb")) / lit(1099511627776.0d))
      .filter(col("__dot") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("__dot").as("dot"))
  }

  /** Deterministic ±1 hyperplane component, derived from md5 (first hex
    * char of md5("plane:pos") ≥ '8') — reproducible run-to-run, no RNG. */
  private def planeComp(plane: Int, pos: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$plane:$pos".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xf) >= 8) 1L else -1L
  }

  /** Random-hyperplane LSH signature per vector: bit i = sign of the
    * projection onto plane i. Zero shuffles: each vector is quantized once,
    * then dotted against `planes` literal ±1 arrays with the native
    * codegen'd graft_dot64 — one scan, per-row work only (the previous
    * posexplode + broadcast-join + 16 conditional sums shape shuffled
    * N×dim rows and ran interpreted). */
  def hyperplaneSignatures(emb: DataFrame, idCol: String, vecCol: String,
                           planes: Int, dim: Int): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val bits = (0 until planes).map { p =>
      val arr = (0 until dim).map(j => s"${planeComp(p, j)}L").mkString(", ")
      when(expr(s"graft_dot64(__qv, array($arr))") >= 0, lit("1")).otherwise(lit("0"))
    }
    emb.select(col(idCol), quantize(col(vecCol)).as("__qv"))
      .select(col(idCol), concat(bits: _*).as("signature"))
  }

  /** Banded ANN candidate pairs: vectors sharing any band of the LSH
    * signature. Same banding shape as [[Dedup.lshCandidatePairs]]. */
  def annCandidates(sig: DataFrame, idCol: String,
                    bands: Int, bitsPerBand: Int): DataFrame = {
    val bandRows = (0 until bands).map { b =>
      sig.select(col(idCol), lit(b).as("band"),
        substring(col("signature"), b * bitsPerBand + 1, bitsPerBand).as("band_key"))
    }.reduce(_ unionByName _)
    Dedup.lshCandidatePairs(bandRows, idCol)
  }

  /** Approximate top-k: LSH-bucketed candidates re-scored exactly (double
    * cosine), ranked per query. The scale path — each query only scores
    * its bucket-mates instead of the full corpus. */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryPred: Column, k: Int,
              planes: Int = 16, dim: Int = 64,
              bands: Int = 4): DataFrame = {
    val sig = hyperplaneSignatures(emb, idCol, vecCol, planes, dim)
    val cand = annCandidates(sig, idCol, bands, planes / bands)
    val sym = cand.unionByName(
      cand.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    val queries = emb.filter(queryPred)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val cands = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = queries
      .join(sym, queries("query_id") === sym("doc_a"))
      .join(cands, sym("doc_b") === cands("neighbor_id"))
      .withColumn("__dot", dotDouble(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__dot").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("__dot").as("dot"))
  }
}
