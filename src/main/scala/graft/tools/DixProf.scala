package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.operators.{Dedup, DedupIndex}
import graft.sources.Tables

/** Scratch profiler for DedupIndex.probe stage costs (not registered
  * anywhere; run by hand while tuning). Mirrors probe()'s current
  * internals over a 500-doc micro-batch against the sf1 store. */
object DixProf {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
    graft.Bench.scratchDir().foreach(b.config("spark.local.dir", _))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dd = Tables.documents(spark, "/dev/shm/sf1")
    val corpus = dd.filter(col("doc_id") % 5 =!= 0)
    val batch = dd.filter(col("doc_id") % 100 === 0)
    val dir = graft.Scratch.tempDir("dixprof") + "/ix"
    t("build+write") {
      DedupIndex.write(DedupIndex.build(corpus, "doc_id", "text"), dir)
    }
    val ix = t("read") { DedupIndex.read(spark, dir) }

    val bSh = Dedup.shingleRows(batch, "doc_id", "text", ix.shingleN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bSigs = Dedup.minhashSignatures(bSh, "doc_id", ix.k, withSize = true)
      .withColumnRenamed("doc_id", "id").persist(StorageLevel.MEMORY_AND_DISK)
    t("batch shingle+sign (500 docs)") { bSigs.count() }
    val rpb = ix.k / ix.bands
    val bBand = Dedup.lshBandRows(bSigs, "id", ix.bands, rpb)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val hotKeys = bBand.select(col("band"), col("band_key")).distinct()
    val cHot = Dedup.lshBandRows(ix.sigs, "id", ix.bands, rpb)
      .join(hotKeys, Seq("band", "band_key"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("corpus hot band rows") { println(s"  cHot=${cHot.count()}") }
    val okKeys = cHot.select(col("band"), col("band_key"))
      .unionAll(bBand.select(col("band"), col("band_key")))
      .groupBy(col("band"), col("band_key")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= 100).select(col("band"), col("band_key"))
    val cross = cHot.join(okKeys, Seq("band", "band_key"), "left_semi")
      .select(col("band"), col("band_key"), col("id").as("__cid"))
      .join(bBand.join(okKeys, Seq("band", "band_key"), "left_semi")
        .select(col("band"), col("band_key"), col("id").as("__bid")),
        Seq("band", "band_key"))
      .select(least(col("__cid"), col("__bid")).as("doc_a"),
        greatest(col("__cid"), col("__bid")).as("doc_b"))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    t("cross candidates") { println(s"  cross=${cross.count()}") }
    val candIds = cross.select(col("doc_a").as("id"))
      .unionAll(cross.select(col("doc_b").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pbs = t("candidate pb collect") {
      candIds.select(pmod(hash(col("id")), lit(64)).as("pb")).distinct()
        .collect().map(_.getAs[Int]("pb")).toSeq
    }
    println(s"  pbs=${pbs.size} of 64")
    val corpusCand = ix.shingles.filter(col("pb").isin(pbs: _*))
      .select(col("id"), col("shingle"))
      .join(candIds, Seq("id"), "left_semi")
    val candSh = corpusCand
      .unionByName(bSh.withColumnRenamed("doc_id", "id")
        .join(candIds, Seq("id"), "left_semi"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("candidate shingles (pruned)") { println(s"  candSh=${candSh.count()}") }
    val allSigs = ix.sigs.unionByName(bSigs)
    val pairs = Dedup.jaccardForPairs(cross, candSh, "id",
        minJaccard = 0.1,
        precomputedSizes = Some(allSigs.select(col("id"), col("n"))))
      .filter(col("jaccard") >= 0.1)
    t("jaccard verify") { println(s"  pairs=${pairs.count()}") }
    val exactHit = batch
      .join(ix.hashes.select(col("text_md5").as("__h")).distinct(),
        md5(batch("text")) === col("__h"), "left_semi")
      .select(col("doc_id").as("id"))
    t("exact probe") { println(s"  exact=${exactHit.count()}") }
    t("full probe (end to end)") {
      DedupIndex.probe(ix, batch, "doc_id", "text",
        threshold = 0.1, maxBucketSize = 100).filter(col("keep")).count()
    }
    spark.stop()
  }
}
