package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.show(3, false)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.printSchema()
    import org.apache.spark.sql.functions._
    ev.select(to_json(struct(col("event_id"), col("event_type"), col("value")))).show(3, false)
    ev.select(get_json_object(col("props"), "$.k").cast("int").as("k")).show(3)
    // split semantics check
    spark.sql("SELECT split('a b c', ' ') AS s, split('a/b/', '/') AS t").show(false)
    spark.stop()
  }
}
