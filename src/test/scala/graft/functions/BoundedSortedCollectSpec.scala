package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.operators.Dedup

class BoundedSortedCollectSpec extends SparkSpec {
  import spark.implicits._

  test("≡ array_sort(collect_list) + [minSize, cap] size filter (property, nulls included)") {
    // random (group, value|null) rows with caps small enough that some
    // groups overflow: the fused aggregate must agree with the unfused
    // formulation on every group, including the NULL-skip and both filter
    // ends, across the partial→final merge path (4 shuffle partitions)
    val genRow = for {
      g <- Gen.choose(0, 5)
      v <- Gen.option(Gen.choose(0L, 20L))
    } yield (g, v)
    // cap range includes 0 and negative: non-positive caps must yield
    // the unfused formulation's empty result (every group NULL), not an
    // exception — the join strategies return empty for the same argument
    val prop = Prop.forAll(
      Gen.listOfN(60, genRow), Gen.choose(-1, 8), Gen.choose(0, 3)) {
      (rows: List[(Int, Option[Long])], cap: Int, minSize: Int) =>
        val df = rows.toDF("g", "v").repartition(4)
        val fused = df.groupBy(col("g"))
          .agg(Dedup.boundedSortedCollect(col("v"), minSize, cap).as("a"))
          .as[(Int, Option[Seq[Long]])].collect().toMap
        val unfused = df.groupBy(col("g"))
          .agg(array_sort(collect_list(col("v"))).as("a"))
          .withColumn("a",
            when(size(col("a")) >= minSize && size(col("a")) <= cap, col("a")))
          .as[(Int, Option[Seq[Long]])].collect().toMap
        fused == unfused
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("struct values sort field-by-field, matching array_sort") {
    val df = Seq((1, 5L, 9), (1, 2L, 7), (1, 2L, 3), (1, 8L, 1))
      .toDF("g", "doc", "sz").repartition(3)
    val fused = df.groupBy(col("g"))
      .agg(Dedup.boundedSortedCollect(struct(col("doc"), col("sz")), 2, 100).as("a"))
      .select(col("a")).as[Seq[(Long, Int)]].collect().head
    val unfused = df.groupBy(col("g"))
      .agg(array_sort(collect_list(struct(col("doc"), col("sz")))).as("a"))
      .select(col("a")).as[Seq[(Long, Int)]].collect().head
    assert(fused == Seq((2L, 3), (2L, 7), (5L, 9), (8L, 1)))
    assert(fused == unfused)
  }

  test("the aggregation buffer itself is bounded: overflow drops the backing array") {
    // the memory contract the operator scaladocs now claim: element cap+1
    // flips the buffer to an O(1) marker and RELEASES the values — an
    // over-cap group never holds more than cap elements, in update or merge
    val agg = BoundedSortedCollect(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.LongType, nullable = true), 2, 3)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    var buf = agg.createAggregationBuffer()
    (1L to 3L).foreach { v => row.update(0, v); buf = agg.update(buf, row) }
    assert(buf.values.length == 3 && !buf.overflowed)
    row.update(0, 4L)
    buf = agg.update(buf, row)
    assert(buf.overflowed && buf.values.isEmpty)
    // further updates stay O(1)
    buf = agg.update(buf, row)
    assert(buf.overflowed && buf.values.isEmpty)
    assert(agg.eval(buf) == null)
    // merge propagates the marker and drops the survivor's values too
    var ok = agg.createAggregationBuffer()
    row.update(0, 1L); ok = agg.update(ok, row)
    val merged = agg.merge(ok, buf)
    assert(merged.overflowed && merged.values.isEmpty)
    // merge overflow on combined size, without either side overflowed
    var a = agg.createAggregationBuffer()
    var b = agg.createAggregationBuffer()
    (1L to 2L).foreach { v => row.update(0, v); a = agg.update(a, row) }
    (3L to 4L).foreach { v => row.update(0, v); b = agg.update(b, row) }
    val m2 = agg.merge(a, b)
    assert(m2.overflowed && m2.values.isEmpty)
    // serialize/deserialize round-trips the marker in O(1) bytes
    val des = agg.deserialize(agg.serialize(m2))
    assert(des.overflowed && des.values.isEmpty)
    var c = agg.createAggregationBuffer()
    (5L to 6L).foreach { v => row.update(0, v); c = agg.update(c, row) }
    val desC = agg.deserialize(agg.serialize(c))
    assert(!desC.overflowed && desC.values.toSet == Set(6L, 5L))
  }
}
