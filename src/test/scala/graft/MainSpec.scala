package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Drives the CLI verb sequence end-to-end on a temp KB directory:
  * database → embed → bm25 → dedup → knn → query, through Main.run against
  * the suite's session (Main.main owns session lifecycle for real runs).
  */
class MainSpec extends SparkSpec {

  test("CLI verbs: database -> embed -> bm25 -> dedup -> knn -> query") {
    val in = Files.createTempDirectory("graft_cli_in").toString
    val kb = Files.createTempDirectory("graft_cli_kb").toString
    val words = (1 to 150).map(i => s"word$i").mkString(" ")
    Files.write(Paths.get(in, "a.txt"),
      s"spark joins and filters run fast $words".getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(in, "b.txt"), // dup of a
      s"spark joins and filters run fast $words".getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(in, "c.txt"),
      ("window functions rank rows " + (1 to 150).map(i => s"other$i").mkString(" "))
        .getBytes(StandardCharsets.UTF_8))

    Main.run(Array("database", kb, s"$in/*.txt"), spark)
    assert(spark.read.parquet(s"$kb/chunks").count() > 0)

    Main.run(Array("embed", kb), spark)
    val emb = spark.read.parquet(s"$kb/embeddings")
    assert(emb.count() == spark.read.parquet(s"$kb/chunks").count())

    Main.run(Array("bm25", kb), spark)
    assert(spark.read.parquet(s"$kb/bm25/postings").count() > 0)

    Main.run(Array("dedup", kb), spark)
    // a.txt and b.txt are identical → their chunks form exact-dup pairs
    assert(spark.read.parquet(s"$kb/dedup/exact").count() > 0,
      "identical files must produce exact-dup pairs")
    assert(spark.read.parquet(s"$kb/dedup/minhash_lsh").count() > 0,
      "identical files must survive LSH + jaccard verification")

    val firstId = emb.select("doc_id").orderBy("doc_id").head().getLong(0)
    Main.run(Array("knn", kb, firstId.toString, "3"), spark)

    Main.run(Array("components", kb), spark)
    val comp = spark.read.parquet(s"$kb/dedup/components")
    assert(comp.count() > 0, "dup pairs must produce component assignments")
    // identical a.txt/b.txt chunks land in one group: some component has >1 node
    assert(comp.groupBy("component").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).count() > 0)

    Main.run(Array("pq", kb), spark)
    val codes = spark.read.parquet(s"$kb/pq_codes")
    assert(codes.count() == emb.count(), "every vector must be PQ-encoded")

    Main.run(Array("query", kb, "fast spark joins and filters"), spark)
    assert(spark.read.parquet(s"$kb/logs").count() == 1, "query must be logged")
  }
}
