package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{GraftCatalog, Tables}

/**
 * Oracle-checked catalog behavior: these queries route testdata THROUGH a
 * freshly-created warehouse table (snapshot commits, time travel,
 * merge-on-read upserts + tombstone deletes) and read it back, so the
 * catalog's read/write semantics sit inside the driver's DuckDB hash gate
 * rather than only in ScalaTest. The oracle states what the final image
 * must be in terms of the ORIGINAL parquet table — independent
 * reimplementation, not a round-trip tautology.
 *
 * (The reference's equivalents: snapshot commit + time travel,
 * TrinoTableHandle.java:138; PK tables are Paimon merge-on-read.)
 */
object CatalogQueries {

  private def freshCat(s: SparkSession): GraftCatalog = new GraftCatalog(s,
    java.nio.file.Files.createTempDirectory("graft-query-wh").toString)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Two snapshot commits; read back the FIRST — time travel must see
    // exactly the even-id half despite the later append.
    "catalog_timetravel" -> ((s, dir) => {
      val cat = freshCat(s)
      cat.createSchema("q")
      val d = Tables(s, dir, "documents").select("doc_id", "lang", "n_chars")
      cat.createTable("q", "docs", d.schema)
      val snap1 = cat.append("q", "docs", d.filter(col("doc_id") % 2 === 0))
      cat.append("q", "docs", d.filter(col("doc_id") % 2 =!= 0))
      cat.read("q", "docs", snapshotId = Some(snap1)).orderBy("doc_id")
    }),
    // Incremental read between the two commits must surface ONLY the
    // second snapshot's delta (odd ids) — and open only its files.
    "catalog_incremental" -> ((s, dir) => {
      val cat = freshCat(s)
      cat.createSchema("q")
      val d = Tables(s, dir, "documents").select("doc_id", "source", "n_chars")
      cat.createTable("q", "docs", d.schema)
      val s1 = cat.append("q", "docs", d.filter(col("doc_id") % 2 === 0))
      val s2 = cat.append("q", "docs", d.filter(col("doc_id") % 2 =!= 0))
      cat.readIncremental("q", "docs", s1, s2).orderBy("doc_id")
    }),
    // PK table: full upsert, partial re-upsert (lang rewritten), tombstone
    // delete — the merge-on-read read must resolve newest-wins minus
    // deleted keys.
    "catalog_upsert_mor" -> ((s, dir) => {
      val cat = freshCat(s)
      cat.createSchema("q")
      val d = Tables(s, dir, "documents").select("doc_id", "lang")
      cat.createTable("q", "docs", d.schema, primaryKey = Seq("doc_id"))
      cat.upsert("q", "docs", d)
      cat.upsert("q", "docs",
        d.filter(col("doc_id") % 10 === 0).withColumn("lang", lit("UPDATED")))
      cat.deleteWhere("q", "docs", col("doc_id") % 7 === 3)
      cat.read("q", "docs").orderBy("doc_id")
    }),
  )

  def oracle: Map[String, String] = Map(
    "catalog_timetravel" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id % 2 = 0 ORDER BY doc_id""".stripMargin,
    "catalog_incremental" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE doc_id % 2 <> 0 ORDER BY doc_id""".stripMargin,
    "catalog_upsert_mor" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 10 = 0 THEN 'UPDATED' ELSE lang END AS lang
        |FROM documents WHERE doc_id % 7 <> 3 ORDER BY doc_id""".stripMargin,
  )
}
