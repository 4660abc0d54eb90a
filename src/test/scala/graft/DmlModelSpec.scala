package graft

import org.apache.spark.sql.functions._
import graft.sources.GraftArray

/** Randomized model check of the DML surface: a random interleaving of
  * upsert / dim-DELETE / attribute-DELETE (row-level) / UPDATE / MERGE
  * / INSERT OVERWRITE / TRUNCATE / consolidate / vacuum is replayed
  * against a plain in-memory map, and the table must equal the model
  * after EVERY step. Catches interaction bugs no single-path spec
  * would (e.g. tombstone ordering vs consolidation vs overwrite).
  * Deterministic seeds — failures reproduce. */
class DmlModelSpec extends SparkSpec {
  import spark.implicits._

  private def mkCat(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_mdl").toString
    val cat = "gm" + scala.util.Random.alphanumeric.take(4).mkString.toLowerCase
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  private def runScenario(seed: Long, steps: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val (cat, wh) = mkCat()
    val uri = s"$wh/t"
    spark.sql(s"""CREATE TABLE $cat.t (k BIGINT, v DOUBLE)
      |TBLPROPERTIES('graft.dimensions'='k')""".stripMargin)
    var model = Map.empty[Long, Double]
    val keys = 0L until 40L
    // (commit ts, model at that instant) — verified via `t@ts` reads.
    // Cleared on vacuum: reclaiming superseded fragments deliberately
    // trades pre-consolidation history (documented vacuum semantics).
    val snapshots = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[Long, Double])]

    def checkEq(step: String): Unit = {
      val actual = spark.table(s"$cat.t").as[(Long, Double)]
        .collect().toMap
      assert(actual == model,
        s"seed=$seed after $step:\n actual=${actual.toSeq.sorted}\n " +
          s"model=${model.toSeq.sorted}")
      GraftArray.fragments(spark, uri).map(_.timestamp).maxOption
        .foreach(ts => snapshots += ((ts, model)))
      // recorded instants must still read exactly — sample 2 per step
      // (checking all of them is O(steps²) table reads)
      rnd.shuffle(snapshots.toSeq).take(2).foreach { case (ts, m) =>
        val at = spark.sql(s"SELECT * FROM $cat.`t@$ts`")
          .as[(Long, Double)].collect().toMap
        assert(at == m,
          s"seed=$seed after $step: time travel @$ts diverged:\n " +
            s"actual=${at.toSeq.sorted}\n model=${m.toSeq.sorted}")
      }
    }

    for (step <- 1 to steps) {
      val op = rnd.nextInt(10)
      op match {
        case 0 | 1 | 2 => // upsert batch (INSERT is an upsert)
          val rows = Seq.fill(rnd.nextInt(6) + 1)(
            (keys(rnd.nextInt(keys.size)), rnd.nextInt(100).toDouble))
            .distinctBy(_._1)
          rows.toDF("k", "v").writeTo(s"$cat.t").append()
          model = model ++ rows
        case 3 => // dim-range DELETE (metadata tombstone)
          val lo = rnd.nextInt(40).toLong
          val hi = lo + rnd.nextInt(10)
          spark.sql(s"DELETE FROM $cat.t WHERE k >= $lo AND k <= $hi")
          model = model.filter { case (k, _) => k < lo || k > hi }
        case 4 => // attribute DELETE (row-level, coordinate files)
          val cut = rnd.nextInt(100).toDouble
          spark.sql(s"DELETE FROM $cat.t WHERE v >= $cut")
          model = model.filter { case (_, v) => v < cut }
        case 5 => // UPDATE (row-level upsert of new versions)
          val m = rnd.nextInt(5) + 2
          spark.sql(s"UPDATE $cat.t SET v = v + 1000 WHERE k % $m = 0")
          model = model.map { case (k, v) =>
            k -> (if (k % m == 0) v + 1000 else v) }
        case 6 => // predicate INSERT OVERWRITE of a key range
          val lo = rnd.nextInt(40).toLong
          val hi = lo + rnd.nextInt(10)
          val rows = Seq.fill(rnd.nextInt(4) + 1)(
            (lo + rnd.nextInt((hi - lo + 1).toInt).toLong,
              rnd.nextInt(100).toDouble)).distinctBy(_._1)
          rows.toDF("k", "v").writeTo(s"$cat.t")
            .overwrite(col("k") >= lo && col("k") <= hi)
          model = model.filter { case (k, _) => k < lo || k > hi } ++ rows
        case 7 => // MERGE: update/delete/insert in one statement
          val src = Seq.fill(rnd.nextInt(6) + 1)(
            (keys(rnd.nextInt(keys.size)),
              rnd.nextInt(120).toDouble - 10)).distinctBy(_._1)
          val v = s"mdl_src_$step"
          src.toDF("k", "nv").createOrReplaceTempView(v)
          spark.sql(
            s"""MERGE INTO $cat.t t USING $v u ON t.k = u.k
               |WHEN MATCHED AND u.nv < 0 THEN DELETE
               |WHEN MATCHED THEN UPDATE SET v = u.nv
               |WHEN NOT MATCHED AND u.nv >= 0 THEN INSERT (k, v)
               |  VALUES (u.k, u.nv)""".stripMargin)
          src.foreach { case (k, nv) =>
            if (model.contains(k)) {
              if (nv < 0) model -= k else model += k -> nv
            } else if (nv >= 0) model += k -> nv
          }
        case 8 => // TRUNCATE or full overwrite
          if (rnd.nextBoolean()) {
            spark.sql(s"TRUNCATE TABLE $cat.t")
            model = Map.empty
          } else {
            val rows = Seq.fill(rnd.nextInt(4) + 1)(
              (keys(rnd.nextInt(keys.size)), rnd.nextInt(100).toDouble))
              .distinctBy(_._1)
            spark.sql(s"INSERT OVERWRITE $cat.t VALUES " +
              rows.map { case (k, v) => s"($k, ${v}D)" }.mkString(", "))
            model = rows.toMap
          }
        case 9 => // maintenance must never change the visible state
          GraftArray.consolidate(spark, uri)
          if (GraftArray.vacuum(spark, uri) > 0)
            snapshots.clear() // vacuum trades history for space
      }
      checkEq(s"step $step (op $op)")
    }
  }

  test("random DML interleavings match the model") {
    (1L to 4L).foreach(runScenario(_, steps = 18))
  }
}
