package graft
import org.apache.spark.sql.SparkSession
object CatalogDrive {
  def main(args: Array[String]): Unit = {
    val wh = graft.core.TempDirs.fresh("drive_wh")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.catalog.g", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.g.warehouse", wh)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("CREATE TABLE g.arr (rows BIGINT, cols BIGINT, a BIGINT, s STRING) TBLPROPERTIES('graft.dimensions'='rows,cols')")
    spark.sql("INSERT INTO g.arr VALUES (1,1,10,'x'), (2,4,20,'y'), (5,5,30,'z')")
    println("== SELECT with dim filter ==")
    spark.sql("SELECT * FROM g.arr WHERE rows BETWEEN 1 AND 3 ORDER BY rows").show()
    println("== explain agg pushdown ==")
    spark.sql("SELECT count(*), sum(a), min(rows), max(cols) FROM g.arr").explain()
    spark.sql("SELECT count(*), sum(a), min(rows), max(cols) FROM g.arr").show()
    spark.sql("INSERT INTO g.arr VALUES (1,1,99,'upd')")
    println("== latest-wins after overlapping insert ==")
    spark.sql("SELECT * FROM g.arr ORDER BY rows, cols").show()
    println("== SHOW TABLES / time travel / metadata ==")
    spark.sql("SHOW TABLES IN g").show()
    graft.sources.GraftArray.putMetadata(spark, s"$wh/arr", Map("k"->"v"))
    spark.sql("SELECT * FROM g.`arr@metadata`").show()
    // probes
    try spark.sql("SELECT * FROM g.nope").collect()
    catch { case e: Exception => println("PROBE missing table => " + e.getMessage.take(90)) }
    try spark.sql("INSERT INTO g.arr VALUES (1,2,3)").collect()
    catch { case e: Exception => println("PROBE bad arity => " + e.getMessage.take(90)) }
    try spark.sql("SELECT * FROM g.`arr@notatimestamp`").collect()
    catch { case e: Exception => println("PROBE bad suffix => " + e.getMessage.take(90)) }
    try spark.sql("INSERT INTO g.arr VALUES (NULL,1,1,'n')").collect()
    catch { case e: Exception => println("PROBE null dim => " + e.getMessage.take(200)) }
    spark.stop()
  }
}
