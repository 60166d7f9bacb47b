package graft.queries

import graft.SparkSpec

/** Registry-wide plan guard: NO query in `SparkEntry.queries` may plan a
  * nested-loop or cartesian join, except the four that are quadratic BY
  * DESIGN and documented as such at their definition:
  *
  *  - q26_ann_topk   — the exact ANN baseline (it IS the recall oracle);
  *  - q31_embed_dup  — the exact cosine-pair form with a bounded query
  *                     side (q27/q39 are the corpus-scale paths);
  *  - q37_ann_ivf    — a broadcast cross join against the nlist-row
  *                     centroid table (dimension-sized build side; the
  *                     corpus side streams — not corpus²);
  *  - q65_semantic_contamination — the benchmark side is eval-suite-sized
  *                     and broadcasts whole; the corpus streams map-side
  *                     (|bench|·|corpus| dots, zero shuffles — never
  *                     corpus²; LSH bucketing is the big-bench path).
  *
  * Any other query acquiring a BroadcastNestedLoopJoin or CartesianProduct
  * is a scale regression — usually a lost equi-key or a dropped hint —
  * that sf0.001 correctness tests would never surface.
  */
class PlanSanitySpec extends SparkSpec {

  // q37 left this list when assignCells became a map-side literal-ranked
  // expression (the centroid cross join + per-id window was its only
  // nested loop); its plan is now cell-keyed equi-joins only
  private val quadraticByDesign =
    Set("q26_ann_topk", "q31_embed_dup", "q65_semantic_contamination")

  test("no undeclared nested-loop/cartesian joins across the whole registry") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if !quadraticByDesign(name) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val bad = Seq("BroadcastNestedLoopJoin", "CartesianProduct").filter(plan.contains)
        if (bad.nonEmpty) Some(s"$name: ${bad.mkString(",")}") else None
      case _ => None
    }
    assert(offenders.isEmpty, s"scale-hostile join plans:\n${offenders.mkString("\n")}")
  }

  test("every oracled query has a scalar-only output schema") {
    // The driver's compare stack sorts/factorizes pandas columns and dies
    // on array/struct/map cells ("unhashable type: numpy.ndarray") BEFORE
    // recording any result — an array-typed output column in an oracled
    // query is invisible locally and red at the gate (round-6 q50).
    // Rows-only queries are exempt: the driver only counts their rows.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val oracled = graft.SparkEntry.oracleSql.keySet
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if oracled(name) =>
        val complex = fn(spark, sfDir).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] => s"${f.name}: ${f.dataType.simpleString}"
        }
        if (complex.nonEmpty) Some(s"$name -> ${complex.mkString(", ")}") else None
      case _ => None
    }
    assert(offenders.isEmpty,
      s"oracled queries must emit only scalar columns (the driver compare " +
        s"cannot hash arrays/structs/maps):\n${offenders.mkString("\n")}")
  }

  test("every registered query is oracled or declared no-oracle-by-design") {
    // The correctness gate is oracleSql ∪ the no_oracle_by_design manifest
    // (rows+schema checked by tools/check_oracle.py). A query in neither
    // set would ship with NO check at all — make that unrepresentable.
    val queries = graft.SparkEntry.queries.keySet
    val oracled = graft.SparkEntry.oracleSql.keySet
    val declared = graft.SparkEntry.rowsOnlyByDesign.keySet
    val unchecked = queries -- oracled -- declared
    assert(unchecked.isEmpty,
      s"queries with neither a DuckDB oracle nor a no-oracle declaration: " +
        s"${unchecked.toSeq.sorted.mkString(", ")}")
    // and the reverse: no stale oracle/declaration for a removed query,
    // and no query both oracled AND declared oracle-free
    val stale = (oracled ++ declared) -- queries
    assert(stale.isEmpty,
      s"oracle/manifest entries for unregistered queries: ${stale.toSeq.sorted.mkString(", ")}")
    val both = oracled.intersect(declared)
    assert(both.isEmpty,
      s"queries both oracled and declared oracle-free: ${both.toSeq.sorted.mkString(", ")}")
    // declared schemas must match what the query actually emits
    val schemaDrift = graft.SparkEntry.rowsOnlyByDesign.toSeq.sortBy(_._1).flatMap {
      case (name, (_, cols)) =>
        val actual = graft.SparkEntry.queries(name)(spark, sfDir).schema.fields
          .map(f => (f.name, f.dataType.simpleString)).toSeq
        if (actual != cols) Some(s"$name: declared $cols, actual $actual") else None
    }
    assert(schemaDrift.isEmpty,
      s"no-oracle manifest schema drift:\n${schemaDrift.mkString("\n")}")
  }

  test("README footer's query counts match SparkEntry (prose can't drift)") {
    // the r11 verdict caught the footer saying "75 of 77" against a
    // 78-query surface — prose the oracle-manifest lint can't see; this
    // pins the one load-bearing sentence to the code's actual counts
    val footer = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val m = "\\((\\d+) oracle-checked of (\\d+) registered queries".r
      .findFirstMatchIn(footer)
    assert(m.isDefined, "README footer must contain '(<n> oracle-checked of <m> registered queries'")
    assert(m.get.group(1).toInt == graft.SparkEntry.oracleSql.size,
      s"README footer says ${m.get.group(1)} oracle-checked; " +
        s"SparkEntry.oracleSql has ${graft.SparkEntry.oracleSql.size}")
    assert(m.get.group(2).toInt == graft.SparkEntry.queries.size,
      s"README footer says ${m.get.group(2)} registered; " +
        s"SparkEntry.queries has ${graft.SparkEntry.queries.size}")
  }

  test("the quadratic-by-design whitelist still exists and still plans that way") {
    // if one of these stops planning a nested loop (e.g. q37 moves to a
    // bucketed assignment), celebrate — and shrink the whitelist
    quadraticByDesign.foreach { name =>
      val plan = graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"),
        s"$name no longer needs its whitelist entry")
    }
  }
}
