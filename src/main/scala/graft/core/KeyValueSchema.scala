package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** KeyValue schemas (reference: Schema.KeyValue, Schema.java:368-398) with the
  * two encodings of KeyValueEncodingType:
  *  - INLINE: key and value serialized together in the payload → one struct
  *    column `kv: struct(key, value)`;
  *  - SEPARATED: key travels in the message key field, value in the payload →
  *    two top-level columns.
  */
object KeyValueSchema {

  /** INLINE: pack typed key/value columns into a kv struct. */
  def inline(df: DataFrame, keyCols: Seq[String], valueCols: Seq[String]): DataFrame =
    df.withColumn("kv", struct(
      struct(keyCols.map(col): _*).as("key"),
      struct(valueCols.map(col): _*).as("value")))

  /** Unpack an INLINE kv struct back to columns. */
  def fromInline(df: DataFrame): DataFrame =
    df.select(col("kv.key.*") +: df.columns.filter(_ != "kv").map(col) :+
      col("kv.value.*"): _*)

  /** SEPARATED: key JSON into the envelope key slot, value JSON in payload. */
  def separated(df: DataFrame, keyCols: Seq[String], valueCols: Seq[String]): DataFrame =
    df.withColumn("key", to_json(struct(keyCols.map(col): _*)))
      .withColumn("value", to_json(struct(valueCols.map(col): _*)))

  /** Decode SEPARATED key/value JSON using their registered schemas. */
  def decodeSeparated(df: DataFrame, keySchema: StructType,
                      valueSchema: StructType): DataFrame =
    df.withColumn("key_rec", from_json(col("key"), keySchema))
      .withColumn("value_rec", from_json(col("value"), valueSchema))
}
