package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.operators.{Dedup, Similarity}

/** Dev utility: measures the sketch operators' actual precision/recall
  * against their exact twins so the driver-gate bounds (round 6) are set
  * from data, not guesses. Not part of the driver contract.
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = new Tables(spark, dir)
    val docs = t.documents
    val emb = t.embeddings

    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    // minhash vs exact ngram, threshold 0.2 and 0.5
    for (thr <- Seq(0.2, 0.5)) {
      val exact = pairSet(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = thr, minCommon = 2))
      val exact1 = pairSet(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = thr, minCommon = 1))
      val mh = pairSet(Dedup.minhashPairs(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 16, bands = 4, jaccardThreshold = thr))
      println(s"[gate] minhash t=$thr: |exact mc2|=${exact.size} |exact mc1|=${exact1.size} " +
        s"|mh|=${mh.size} |mh∩exact|=${(mh & exact).size} |mh\\exact1|=${(mh -- exact1).size} " +
        s"recall_vs_mc2=${(mh & exact).size.toDouble / math.max(exact.size, 1)}")
    }

    // simhash 4-chunk production vs 8-chunk guaranteed superset
    val s4 = pairSet(Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 6, chunks = 4))
    val s8 = pairSet(Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 6, chunks = 8))
    println(s"[gate] simhash: |4ch|=${s4.size} |8ch|=${s8.size} |4∩8|=${(s4 & s8).size} " +
      s"|4\\8|=${(s4 -- s8).size} recall=${(s4 & s8).size.toDouble / math.max(s8.size, 1)}")

    // lsh / ivf per-query hits vs exact knn (k=3, queries vec_id<8)
    val q = emb.filter(col("vec_id") < 8)
    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val knn = topSet(Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 3))
    val lsh = topSet(Similarity.lshTopK(emb, q, "vec_id", "embedding", dim = 64, k = 3))
    val ivf = topSet(Similarity.ivfTopK(emb, q, "vec_id", "embedding",
      k = 3, nlist = 16, nprobe = 4))
    def perQ(s: Set[(Long, Long)]) =
      (0L until 8L).map(i => (knn.filter(_._1 == i) & s.filter(_._1 == i)).size).mkString(",")
    println(s"[gate] knn=${knn.size} lsh hits/q=${perQ(lsh)} ivf hits/q=${perQ(ivf)} " +
      s"lsh_recall=${(knn & lsh).size.toDouble / knn.size} ivf_recall=${(knn & ivf).size.toDouble / knn.size}")

    // embed: strong-pair recall within the bounded subset vec_id < 256
    val sub = emb.filter(col("vec_id") < 256)
    val v = sub.select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val a = v.select(col("id").as("id_a"), col("vec").as("va"))
    val b = v.select(col("id").as("id_b"), col("vec").as("vb"))
    val allPairs = a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("va"), col("vb")))
    println("[gate] embed max cos in subset: " +
      allPairs.agg(max(col("cos"))).collect()(0).getDouble(0))
    val lshPairs = pairSet(Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      dim = 64, threshold = 0.2)
      .filter(col("id_a") < 256 && col("id_b") < 256))
    for (strong <- Seq(0.2, 0.25, 0.3, 0.35)) {
      val strongSet = pairSet(allPairs.filter(col("cos") >= strong))
      println(s"[gate] embed strong>=$strong: |strong|=${strongSet.size} " +
        s"|lsh∩strong|=${(lshPairs & strongSet).size} " +
        s"recall=${(lshPairs & strongSet).size.toDouble / math.max(strongSet.size, 1)}")
    }

    // semantic (SemDeDup cells): strong-pair recall vs nlist/replicas,
    // across strong thresholds (the cell split rate falls as cos rises)
    for (nlist <- Seq(8, 16); reps <- Seq(2, 3)) {
      val sem = pairSet(Similarity.semanticNearDupPairs(emb, "vec_id",
          "embedding", threshold = 0.2, nlist = nlist, assignReplicas = reps)
        .filter(col("id_a") < 256 && col("id_b") < 256))
      for (strong <- Seq(0.3, 0.35, 0.4, 0.45)) {
        val strongSet = pairSet(allPairs.filter(col("cos") >= strong))
        println(s"[gate] semantic nlist=$nlist reps=$reps strong=$strong: " +
          s"${(sem & strongSet).size}/${strongSet.size} " +
          s"recall=${(sem & strongSet).size.toDouble / math.max(strongSet.size, 1)}")
      }
    }
    spark.stop()
  }
}
