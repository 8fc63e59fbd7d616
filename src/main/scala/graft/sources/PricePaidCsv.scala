package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reader for the reference's actual input format: the UK Land
  * Registry price-paid CSV (headerless, fully quoted), per the column
  * lists in the reference's lib_land_registry_data/lib_dataframe.py:1-56
  * (pp-complete: 16 cols ending in record_op; pp-monthly-update: same;
  * a no-ppd_cat 15-col variant exists for old files).
  *
  * Schema-first read: Spark never scans to infer types, so a 100 TB
  * ingest starts streaming immediately and malformed rows land in a
  * corrupt-record column instead of failing the job.
  */
object PricePaidCsv {

  /** transaction_unique_id … record_op, typed. price is integer pounds
    * in the source; transaction_date arrives as 'yyyy-MM-dd HH:mm'. */
  val columns: Seq[String] = Seq(
    "transaction_unique_id", "price", "transaction_date", "postcode",
    "property_type", "new_tag", "lease",
    "primary_address_object_name", "secondary_address_object_name",
    "street", "locality", "town_city", "district", "county",
    "ppd_cat", "record_op")

  val schema: StructType = StructType(
    columns.map {
      case "price" => StructField("price", LongType, nullable = true)
      case c => StructField(c, StringType, nullable = true)
    } :+ StructField("_corrupt", StringType, nullable = true))

  /** Raw typed read of a pp-complete / pp-monthly-update file. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "false")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)

  /** Normalized frame: parsed date, trimmed categorical columns —
    * the typed-ingest step the reference does per download
    * (database_verify.py format_dataframe). */
  def normalized(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .filter(col("_corrupt").isNull)
      .drop("_corrupt")
      .withColumn("transaction_date",
        to_date(try_to_timestamp(col("transaction_date"), lit("yyyy-MM-dd HH:mm"))))
      .withColumn("postcode", upper(trim(col("postcode"))))
      .withColumn("property_type", upper(trim(col("property_type"))))
      .withColumn("record_op", upper(trim(col("record_op"))))
}
