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

  /** Historical monthly files predate the ppd_cat column — 15 columns,
    * same order otherwise (lib_dataframe.py:21
    * df_pp_monthly_update_columns_no_ppd_cat). */
  val columnsNoPpdCat: Seq[String] = columns.filterNot(_ == "ppd_cat")

  private def schemaOf(cols: Seq[String]): StructType = StructType(
    cols.map {
      case "price" => StructField("price", LongType, nullable = true)
      case c => StructField(c, StringType, nullable = true)
    } :+ StructField("_corrupt", StringType, nullable = true))

  val schema: StructType = schemaOf(columns)
  val schemaNoPpdCat: StructType = schemaOf(columnsNoPpdCat)

  /** Raw typed read of a pp-complete / pp-monthly-update file.
    * `hasPpdCat = false` selects the 15-column historical layout; the
    * output schema is identical either way (ppd_cat null for
    * historical files), so a mixed-era backfill unions cleanly. */
  def read(spark: SparkSession, path: String, hasPpdCat: Boolean = true): DataFrame = {
    val raw = spark.read
      .schema(if (hasPpdCat) schema else schemaNoPpdCat)
      .option("header", "false")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)
    if (hasPpdCat) raw
    else raw.select(columns.map {
      case "ppd_cat" => lit(null).cast(StringType).as("ppd_cat")
      case c => col(c)
    } :+ col("_corrupt"): _*)
  }

  /** Normalized frame: parsed date, trimmed categorical columns —
    * the typed-ingest step the reference does per download
    * (database_verify.py format_dataframe). */
  def normalized(spark: SparkSession, path: String, hasPpdCat: Boolean = true): DataFrame =
    read(spark, path, hasPpdCat)
      .filter(col("_corrupt").isNull)
      .drop("_corrupt")
      .withColumn("transaction_date",
        to_date(try_to_timestamp(col("transaction_date"), lit("yyyy-MM-dd HH:mm"))))
      .withColumn("postcode", upper(trim(col("postcode"))))
      .withColumn("property_type", upper(trim(col("property_type"))))
      .withColumn("record_op", upper(trim(col("record_op"))))
}
