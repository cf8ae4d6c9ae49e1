package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches plain join results on skewed data") {
    // 10k rows, 90% on one hot key
    val skewed = spark.range(10000)
      .select(when(col("id") % 10 === 0, col("id") % 5 + 10)
        .otherwise(lit(1L)).as("k"), col("id").as("payload"))
    val dim = Seq((1L, "hot"), (10L, "a"), (11L, "b"), (12L, "c"),
      (13L, "d"), (14L, "e"), (99L, "unmatched")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).groupBy(col("name"))
      .agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8)
      .groupBy(col("name"))
      .agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin preserves duplicate multiplicities") {
    val left = Seq(1L, 1L, 2L).toDF("k")
    val right = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "v")
    val out = Skew.saltedJoin(left, right, "k", salts = 4)
    // 2 left 1s x 2 right 1s + 1x1 for key 2 = 5 rows
    assert(out.count() == 5)
  }

  test("saltedAgg equals direct aggregation") {
    val df = spark.range(5000)
      .select((col("id") % 3).as("k"), col("id").as("v"))
    val direct = df.groupBy(col("k"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(df, "k", salts = 8)(
      _.agg(sum(col("v")).as("s"), count(lit(1)).as("n")))(
      _.agg(sum(col("s")).as("s"), sum(col("n")).as("n")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("keySkewProfile surfaces the hot key first") {
    val df = spark.range(1000)
      .select(when(col("id") < 900, lit(7L)).otherwise(col("id")).as("k"))
    val top = Skew.keySkewProfile(df, "k", topN = 1).head()
    assert(top.getLong(0) == 7L)
    assert(top.getLong(1) == 900L)
    assert(math.abs(top.getDouble(2) - 0.9) < 1e-9)
  }
}
