package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guard for global (partition-less) window call-sites — the shape that
  * moves ALL rows to one partition and so is only ever acceptable on
  * provably bounded inputs (the r7/r8 verdicts' rerankHead/w5 concern).
  *
  * Scans main sources for `Window.orderBy` (the partitioned form reads
  * `Window.partitionBy(...).orderBy(...)` and cannot match this literal)
  * and asserts the EXHAUSTIVE list of sites equals the documented
  * bounded-input set. A new site fails here until it either partitions or
  * documents its boundedness contract and is added to the expected map.
  */
class GlobalWindowContractSpec extends AnyFunSuite {

  test("every global Window.orderBy in main carries a bounded-input contract") {
    def scalaFiles(dir: java.io.File): Seq[java.io.File] = {
      val kids = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
      kids.filter(_.isFile).filter(_.getName.endsWith(".scala")) ++
        kids.filter(_.isDirectory).flatMap(scalaFiles)
    }
    val found = scalaFiles(new java.io.File("src/main/scala"))
      .map { f =>
        val text = new String(java.nio.file.Files.readAllBytes(f.toPath))
        // count CODE occurrences only — strip line comments and Scaladoc
        val code = text.linesIterator
          .filterNot(l => l.trim.startsWith("//") || l.trim.startsWith("*"))
          .mkString("\n")
        f.getName -> "Window\\.orderBy".r.findAllIn(code).size
      }
      .filter(_._2 > 0).toMap
    val expected = Map(
      // top-k-truncated fusion input (ranked's Scaladoc contract)
      "Fusion.scala" -> 1,
      // rerankHead's three ranks over ≤ bm25MaxResults + topK rows (its
      // Scaladoc contract, r7 verdict)
      "Rerank.scala" -> 3,
      // w5_trailing_revenue's post-aggregation daily grid (comment contract)
      "RelationalQueries.scala" -> 1)
    assert(found == expected,
      s"global-window call-sites changed: $found vs documented $expected — " +
        "a new Window.orderBy without partitionBy must either partition or " +
        "document a bounded-input contract and be added here")
  }
}
