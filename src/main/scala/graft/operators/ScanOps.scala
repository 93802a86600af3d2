package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Scan/projection operators rounding out the reference inventory
  * (SURVEY.md §2.1/§2.4/§2.8): JSON-API payload drilling (S4), epoch
  * parsing with ms-autodetect and the UTC+8 shift (P5), HTML cleaning
  * chains (P8), and the substring-match section-assignment join (J4).
  */
object ScanOps {

  /** S4 — JSON-API list scan: drill a nested JSON payload column.
    * Reference: scrapers/simple/coinlive.py:32-35 (`data.list`),
    * wallstreetcn.py:31-34 (`data.items`). `from_json` gives the typed
    * struct (schema-on-read); the scalar path is `get_json_object`.
    */
  def jsonPayload(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", IntegerType)))
    spark.read.parquet(s"$sfDir/events.parquet")
      .select(
        col("event_id"),
        from_json(col("props"), schema).getField("k").cast("long").as("k"),
        get_json_object(col("props"), "$.k").cast("long").as("k_str"))
  }

  /** P5 — epoch parse with ms-autodetect (`ts/1000 if ts > 1e12`) and the
    * reference's fixed UTC+8 shift, as pure integer arithmetic (timestamp
    * rendering differs across engines; the semantics live in the math).
    * Reference: utils/spider_util.py:124-138; ms-detect stcn.py:51-61.
    */
  def epochParse(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("sec", unix_timestamp(col("ts")))
      // half the rows arrive in milliseconds — the autodetect input
      .withColumn("raw_epoch",
        when(col("event_id") % 2 === 0, col("sec") * 1000).otherwise(col("sec")))
      .withColumn("norm_s",
        when(col("raw_epoch") > 1000000000000L,
          floor(col("raw_epoch") / 1000).cast("long"))
          .otherwise(col("raw_epoch")))
      .select(
        col("event_id"), col("raw_epoch"), col("norm_s"),
        (col("norm_s") + 8L * 3600L).as("local_epoch_s"))

  /** P8 — HTML clean chain: drop script subtrees, strip tags, collapse
    * whitespace. The reference does this per source with bs4 `decompose()`
    * (e.g. scrapers/simple/cnyes.py:42-57, afp.py:50-51, iyiou.py:22-39);
    * here it is a codegen'd regexp_replace chain. The HTML is synthesized
    * around the document text so the oracle constructs the identical input.
    */
  def htmlClean(spark: SparkSession, sfDir: String): DataFrame = {
    val html = concat(
      lit("""<div class="article"><h1>t</h1><p>"""), col("text"),
      lit("""</p><script>var ad = 1;</script><img src="x.png"/></div>"""))
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id"),
        trim(regexp_replace(
          regexp_replace(
            regexp_replace(html, "(?s)<script.*?</script>", ""),
            "<[^>]+>", " "),
          "\\s+", " ")).as("clean_text"))
  }

  /** J4 — section assignment by substring match with priority: a tiny
    * rules table broadcast-joined with a LIKE predicate, longest/highest-
    * priority match wins. Reference: scrapers/browser/scmp.py:116-123
    * (first matching category in link).
    */
  def sectionAssign(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val paths = spark.read.parquet(s"$sfDir/events.parquet")
      .select(
        col("event_id"),
        when(col("event_id") % 10 === 0,
          concat(lit("/private/a"), col("event_id").cast("string")))
          .when(col("event_id") % 10 === 5,
            concat(lit("/private/open/a"), col("event_id").cast("string")))
          .otherwise(concat(lit("/articles/a"), col("event_id").cast("string")))
          .as("path"))
    val rules = Seq(
      ("/private/open", "open_archive", 3),
      ("/private", "restricted", 2),
      ("/articles", "news", 1)
    ).toDF("pattern", "section", "priority")
    val matched = paths
      .join(broadcast(rules), expr("path LIKE pattern || '%'"), "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_id").orderBy(desc("priority"))))
      .filter(col("rn") === 1)
    matched.select(
      col("event_id"), col("path"),
      coalesce(col("section"), lit("other")).as("section"))
  }
}
