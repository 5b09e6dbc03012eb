package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** Custom typed aggregates — the UDAF surface (SURVEY §2d "UDF
  * surface"). pg's `string_agg(x, sep ORDER BY y)` guarantees element
  * order; Spark's collect_list does not, so exact pg semantics need a
  * typed Aggregator (SURVEY §7 "custom Catalyst work" table).
  *
  * Scale note: the buffer collects (sortKey, value) pairs per group —
  * fine for the bounded groups string_agg is used on (catalog strings,
  * per-key labels). Map-side partial aggregation still applies: the
  * reduce/merge path is associative and the sort happens once at
  * finish.
  */
object PgAggregates {

  /** string_agg(value, sortKey): values joined by `sep` in ascending
    * sortKey order (NULL values skipped like pg; ties keep merge
    * order, made deterministic by sorting on (sortKey, value)).
    */
  final class OrderedStringAgg(sep: String)
      extends Aggregator[(String, String), List[(String, String)], String] {
    override def zero: List[(String, String)] = Nil
    override def reduce(b: List[(String, String)], a: (String, String)): List[(String, String)] =
      if (a._1 == null) b else (a._2, a._1) :: b // store (sortKey, value)
    override def merge(b1: List[(String, String)], b2: List[(String, String)]): List[(String, String)] =
      b1 ::: b2
    override def finish(r: List[(String, String)]): String =
      if (r.isEmpty) null
      else r.sortBy(p => (Option(p._1).getOrElse(""), p._2)).map(_._2).mkString(sep)
    override def bufferEncoder: Encoder[List[(String, String)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** json_agg(to_jsonb(value), sortKey): json array of the pre-rendered
    * values in ascending sortKey order. A NULL rendered value means the
    * SQL value was NULL → pg json_agg includes it as json null. NULL
    * on empty groups (pg). */
  final class OrderedJsonAgg
      extends Aggregator[(String, String), List[(String, String)], String] {
    override def zero: List[(String, String)] = Nil
    override def reduce(b: List[(String, String)], a: (String, String)): List[(String, String)] =
      (a._2, if (a._1 == null) "null" else a._1) :: b // (sortKey, jsonText)
    override def merge(b1: List[(String, String)], b2: List[(String, String)]): List[(String, String)] =
      b1 ::: b2
    override def finish(r: List[(String, String)]): String =
      if (r.isEmpty) null
      else r.sortBy(p => (Option(p._1).getOrElse(""), p._2))
        .map(_._2).mkString("[", ", ", "]") // pg json_agg: "[1, 2]"
    override def bufferEncoder: Encoder[List[(String, String)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** json_object_agg(key, to_jsonb(value)): json object in ascending
    * key order (pg preserves input order; a distributed merge has no
    * input order, so key order is the deterministic choice — same
    * stance as OrderedStringAgg's tie rule). NULL keys error like pg;
    * NULL rendered values become json null. */
  final class OrderedJsonObjectAgg(jsonb: Boolean = false)
      extends Aggregator[(String, String), List[(String, String)], String] {
    override def zero: List[(String, String)] = Nil
    override def reduce(b: List[(String, String)], a: (String, String)): List[(String, String)] = {
      if (a._1 == null) throw new IllegalArgumentException(
        "json_object_agg: field name must not be null")
      (a._1, if (a._2 == null) "null" else a._2) :: b
    }
    override def merge(b1: List[(String, String)], b2: List[(String, String)]): List[(String, String)] =
      b1 ::: b2
    override def finish(r: List[(String, String)]): String =
      if (r.isEmpty) null
      // pg spacing is per-function: json_object_agg pads the braces
      // (`{ "a" : 1, "b" : 2 }`); jsonb_object_agg renders canonical
      // with jsonb's (length, bytes) key order and last-wins dedup
      else if (jsonb) {
        val dedup = scala.collection.mutable.LinkedHashMap[String, String]()
        r.reverse.foreach { case (k, v) => dedup(k) = v }
        dedup.toList.sortBy { case (k, _) =>
          val b = k.getBytes("UTF-8"); (b.length, b.map(x => (x & 0xff).toChar).mkString)
        }.map { case (k, v) => PgJsonExpressions.jsonQuote(k) + ": " + v }
          .mkString("{", ", ", "}")
      } else r.sortBy(p => (p._1, p._2))
        .map(p => PgJsonExpressions.jsonQuote(p._1) + " : " + p._2)
        .mkString("{ ", ", ", " }")
    override def bufferEncoder: Encoder[List[(String, String)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Register the pack into a session. */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("ordered_string_agg",
      functions.udaf(new OrderedStringAgg(","), Encoders.tuple(Encoders.STRING, Encoders.STRING)))
    spark.udf.register("ordered_json_agg",
      functions.udaf(new OrderedJsonAgg, Encoders.tuple(Encoders.STRING, Encoders.STRING)))
    spark.udf.register("ordered_json_object_agg",
      functions.udaf(new OrderedJsonObjectAgg(), Encoders.tuple(Encoders.STRING, Encoders.STRING)))
    spark.udf.register("ordered_jsonb_object_agg",
      functions.udaf(new OrderedJsonObjectAgg(jsonb = true),
        Encoders.tuple(Encoders.STRING, Encoders.STRING)))
  }
}
