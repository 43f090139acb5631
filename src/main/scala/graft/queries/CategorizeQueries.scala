package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}
import graft.categorize.Categorize

/** Categorization-stage queries (SURVEY §2.9 M9-M11, §2.4 A4/A5, §2.8 F15).
  */
object CategorizeQueries {
  import OracleSql.plainTokSql

  /** Chunk view of `documents`: (sourcedoc, sid, doc_id, text) — same
    * derivation as w2_context_window.
    */
  private val chunksCte =
    """chunks AS (
      |  SELECT doc_id, text, source AS sourcedoc,
      |         (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1)::INT AS sid
      |  FROM documents)""".stripMargin

  /** M9 sampling + keyword categorization, shared CTE chain (defines
    * `cats`: sourcedoc, primary_category, categories).
    */
  private val catsCte: String = {
    val taxonomy = Categorize.Taxonomy.toSeq.sortBy(_._1)
    val structs = taxonomy.map { case (cat, kws) =>
      val lst = kws.map(k => s"'$k'").mkString("[", ",", "]")
      s"{'hits': len(list_filter($lst, m -> list_contains(toks, m))), 'cat': '$cat'}"
    }.mkString("[", ", ", "]")
    s"""WITH $chunksCte,
       |ranked AS (
       |  SELECT sourcedoc, sid, text,
       |         row_number() OVER (PARTITION BY sourcedoc ORDER BY sid) AS rn,
       |         count(*) OVER (PARTITION BY sourcedoc) AS cnt
       |  FROM chunks),
       |sampled AS (
       |  SELECT sourcedoc, text FROM ranked
       |  WHERE rn <= 3 OR rn > cnt - 3
       |     OR (rn > (cnt - 3) / 2.0 AND rn <= (cnt - 3) / 2.0 + 3)),
       |toksd AS (
       |  SELECT sourcedoc,
       |         ${plainTokSql("string_agg(text, ' ')")} AS toks
       |  FROM sampled GROUP BY sourcedoc),
       |scored AS (
       |  SELECT sourcedoc, list_filter($structs, s -> s.hits >= 1) AS kept
       |  FROM toksd),
       |cats AS (
       |  SELECT sourcedoc,
       |         list_max(kept).cat AS primary_category,
       |         list_sort(list_transform(kept, s -> s.cat)) AS categories
       |  FROM scored WHERE len(kept) > 0)""".stripMargin
  }

  /** Spark side of the same chain. */
  private def catsDf(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    val chunks = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("source").as("sourcedoc"),
        (row_number().over(w) - 1).cast("int").as("sid"))
    Categorize.keywordCategorize(Categorize.sampleChunks(chunks), "text")
  }

  val defs: Seq[QueryDef] = Seq(

    // ── M9: sampled keyword categorization per sourcedoc ──────────────────
    // categories list comma-joined (sorted labels, no commas in labels):
    // the driver's pandas comparator cannot sort array columns.
    QueryDef.sql("m9_categorize",
      s"""$catsCte
         |SELECT sourcedoc, primary_category,
         |       array_to_string(categories, ',') AS categories
         |FROM cats ORDER BY sourcedoc""".stripMargin) { (s, dir) =>
      catsDf(s, dir)
        .select(col("sourcedoc"), col("primary_category"),
          array_join(col("categories"), ",").as("categories"))
        .orderBy("sourcedoc")
    },

    // ── P3: category predicate — exact array membership (the deliberate
    //    upgrade over the reference's LIKE-substring, SURVEY §7 risk 6):
    //    documents restricted to sourcedocs whose derived categories overlap
    //    the filter set, the KbPipeline categoryFilter semantics ────────────
    QueryDef.sql("p3_category_filter",
      s"""$catsCte
         |SELECT d.doc_id, d.source
         |FROM documents d
         |JOIN (SELECT sourcedoc FROM cats
         |      WHERE list_has_any(categories, ['query-engine', 'storage'])) k
         |  ON d.source = k.sourcedoc
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val keep = catsDf(s, dir)
        .filter(arrays_overlap(col("categories"),
          lit(Array("query-engine", "storage"))))
        .select(col("sourcedoc"))
      val docs = Tables.documents(s, dir)
      docs.join(keep, docs("source") === keep("sourcedoc"))
        .select(docs("doc_id"), docs("source"))
        .orderBy("doc_id")
    },

    // ── A4: article counts per category ───────────────────────────────────
    QueryDef.sql("a4_category_counts",
      s"""$catsCte,
         |exploded AS (SELECT unnest(categories) AS category FROM cats)
         |SELECT category, count(*)::BIGINT AS n
         |FROM exploded GROUP BY category ORDER BY n DESC, category""".stripMargin) { (s, dir) =>
      catsDf(s, dir)
        .select(explode(col("categories")).as("category"))
        .groupBy("category").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("category"))
    },

    // ── M11: import-back — attach the derived categorization to every
    //    chunk row of its sourcedoc (broadcast left join replacing the
    //    reference's per-row UPDATE loop, categorize/import_to_db.py);
    //    uncategorized docs keep NULL columns ────────────────────────────
    QueryDef.sql("m11_import",
      s"""$catsCte
         |SELECT d.doc_id, d.source AS sourcedoc, c.primary_category,
         |       array_to_string(c.categories, ',') AS categories
         |FROM documents d LEFT JOIN cats c ON d.source = c.sourcedoc
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      Categorize.importCategories(Tables.chunksWithSid(s, dir), catsDf(s, dir))
        .select(col("doc_id"), col("sourcedoc"), col("primary_category"),
          array_join(col("categories"), ",").as("categories"))
        .orderBy("doc_id")
    },

    // ── M10: fuzzy category-label dedup via edit similarity ───────────────
    QueryDef.sql("m10_category_dedup", {
      val labels = Seq("Data Processing", "data processing", "data-processing",
        "Query Engine", "query engines", "storage", "Storage!", "perf", "performance")
      val vals = labels.map(l => s"('$l')").mkString(", ")
      s"""WITH labels(label) AS (VALUES $vals),
         |norm AS (SELECT label, lower(regexp_replace(label, '[^a-zA-Z0-9]+', ' ', 'g')) AS n
         |         FROM labels),
         |pairs AS (
         |  SELECT a.label, b.label AS label2,
         |         1.0 - levenshtein(a.n, b.n)::DOUBLE /
         |               greatest(len(a.n), len(b.n))::DOUBLE AS sim
         |  FROM norm a CROSS JOIN norm b)
         |SELECT label, min(label2) AS canonical
         |FROM pairs WHERE sim >= 0.85
         |GROUP BY label ORDER BY label""".stripMargin
    }) { (s, _) =>
      import s.implicits._
      val labels = Seq("Data Processing", "data processing", "data-processing",
        "Query Engine", "query engines", "storage", "Storage!", "perf", "performance")
        .toDF("label")
      Categorize.dedupLabels(labels).orderBy("label")
    },

    // ── M10 at corpus scale: blocked fuzzy matching over part names — the
    //    self-join is keyed on the name's last word, so candidate pairs
    //    exist only within blocks; Spark side uses the THRESHOLDED
    //    levenshtein (O(maxDist·len) early-abort) ────────────────────────────
    QueryDef.sql("m13_fuzzy_match",
      """WITH names AS (SELECT p_name, min(p_partkey)::BIGINT AS pid
        |               FROM part GROUP BY p_name),
        |b AS (SELECT p_name, pid, string_split(p_name, ' ')[-1] AS bk FROM names)
        |SELECT a.p_name AS name_a, c.p_name AS name_b,
        |       levenshtein(a.p_name, c.p_name)::INT AS dist
        |FROM b a JOIN b c ON a.bk = c.bk AND a.pid < c.pid
        |WHERE levenshtein(a.p_name, c.p_name) <= 3
        |ORDER BY name_a, name_b""".stripMargin) { (s, dir) =>
      val names = Tables.part(s, dir)
        .groupBy("p_name").agg(min("p_partkey").as("pid"))
      graft.operators.Dedup.fuzzyPairs(names, "pid", "p_name", maxDist = 3,
          element_at(split(col("p_name"), " "), -1))
        .select(col("s_a").as("name_a"), col("s_b").as("name_b"), col("dist"))
        .orderBy("name_a", "name_b")
    },

    // ── F15: JSON extraction/repair from LLM-ish output ───────────────────
    QueryDef.sql("f15_json_repair", {
      val samples = Seq(
        1 -> "Here are the categories: {\"cats\": [\"a\", \"b\",]} hope that helps!",
        2 -> "```json\n{\"cats\": [\"x\"], \"confidence\": 0.9,}\n```",
        3 -> "{\"already\": \"clean\"}")
      val vals = samples.map { case (i, t) =>
        s"($i, '${t.replace("'", "''").replace("\n", "' || chr(10) || '")}')"
      }.mkString(", ")
      s"""WITH raw(id, txt) AS (VALUES $vals)
         |SELECT id,
         |  regexp_replace(regexp_replace(txt, '(?s)^.*?(\\{.*\\}).*$$', '\\1'),
         |                 ',\\s*([}\\]])', '\\1', 'g') AS cleaned
         |FROM raw ORDER BY id""".stripMargin
    }) { (s, _) =>
      import s.implicits._
      Seq(
        (1, "Here are the categories: {\"cats\": [\"a\", \"b\",]} hope that helps!"),
        (2, "```json\n{\"cats\": [\"x\"], \"confidence\": 0.9,}\n```"),
        (3, "{\"already\": \"clean\"}"))
        .toDF("id", "txt")
        .select(col("id"), Categorize.extractJson(col("txt")).as("cleaned"))
        .orderBy("id")
    },

    // ── A5: chunk statistics ──────────────────────────────────────────────
    QueryDef.sql("a5_chunk_stats",
      s"""WITH t AS (SELECT doc_id,
         |  list_filter(string_split_regex(text, '\\s+'), t -> len(t) > 0) AS toks
         |  FROM documents),
         |starts AS (
         |  SELECT doc_id, toks,
         |         unnest(range(0, greatest(len(toks) - 10, 1), 20)) AS s
         |  FROM t),
         |ch AS (
         |  SELECT doc_id, len(list_slice(toks, s + 1, s + 30)) AS n
         |  FROM starts)
         |SELECT count(*)::BIGINT AS chunks, sum(n)::BIGINT AS total_tokens,
         |       round(avg(n), 4) AS avg_tokens, min(n)::BIGINT AS min_tokens,
         |       max(n)::BIGINT AS max_tokens
         |FROM ch""".stripMargin) { (s, dir) =>
      val chunks = graft.ingest.Chunker.chunkDocuments(
        Tables.documents(s, dir), "doc_id", "text")
      chunks.agg(
        count(lit(1)).as("chunks"),
        sum(size(graft.functions.TextFunctions.wsTokens(col("chunk_text"))))
          .cast("long").as("total_tokens"),
        round(avg(size(graft.functions.TextFunctions.wsTokens(col("chunk_text")))), 4)
          .as("avg_tokens"),
        min(size(graft.functions.TextFunctions.wsTokens(col("chunk_text"))))
          .cast("long").as("min_tokens"),
        max(size(graft.functions.TextFunctions.wsTokens(col("chunk_text"))))
          .cast("long").as("max_tokens"))
    })
}
