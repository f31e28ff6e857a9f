package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Character-bigram language identifier — the richer companion to the
 * SQL-portable stopword scorer in TextQueries. Profiles are built from
 * small built-in seed corpora (common function words and particles), and
 * classification is cosine similarity between a document's bigram
 * histogram and each language profile.
 *
 * Runs as a typed per-partition map: profiles are tiny (a few hundred
 * entries per language) and broadcast implicitly via closure, so the
 * operator is shuffle-free and scales with the scan.
 */
object LangId {

  /** Seed text per language: high-frequency function words and endings. */
  private val seeds: Map[String, String] = Map(
    "en" -> ("the quick brown fox jumps over the lazy dog and this is a test of " +
      "the system which should work with every thing that we throw at it because " +
      "language is mostly made of small common words that appear everywhere"),
    "de" -> ("der schnelle braune fuchs springt ueber den faulen hund und das ist " +
      "ein test des systems welches mit allem funktionieren sollte was wir ihm geben " +
      "weil sprache meistens aus kleinen haeufigen woertern besteht die ueberall sind"),
    "es" -> ("el rapido zorro marron salta sobre el perro perezoso y esta es una " +
      "prueba del sistema que deberia funcionar con todo lo que le demos porque el " +
      "lenguaje esta hecho principalmente de palabras pequenas y comunes que aparecen"),
    "fr" -> ("le renard brun rapide saute par dessus le chien paresseux et ceci est " +
      "un test du systeme qui devrait fonctionner avec tout ce que nous lui donnons " +
      "parce que la langue est surtout faite de petits mots communs qui apparaissent"),
    "zh" -> ("zhe shi yi ge ce shi wo men de xi tong ying gai ke yi chu li suo you " +
      "de dong xi yin wei yu yan zhu yao shi you chang jian de xiao ci zu cheng de " +
      "ta men wu chu bu zai"))

  private def bigramHist(text: String): Map[String, Double] = {
    val norm = text.toLowerCase.replaceAll("[^a-z ]", " ").replaceAll("\\s+", " ").trim
    if (norm.length < 2) Map.empty
    else {
      val counts = norm.sliding(2).toSeq.groupBy(identity).map { case (g, xs) => g -> xs.size.toDouble }
      val total = math.sqrt(counts.values.map(v => v * v).sum)
      counts.map { case (g, v) => g -> v / total }
    }
  }

  private lazy val profiles: Map[String, Map[String, Double]] =
    seeds.map { case (lang, text) => lang -> bigramHist(text) }

  /** Cosine of two L2-normalized sparse histograms. */
  private def cosine(a: Map[String, Double], b: Map[String, Double]): Double =
    a.iterator.map { case (g, v) => v * b.getOrElse(g, 0.0) }.sum

  /** Classify one text: best-profile language, ties broken alphabetically. */
  def classify(text: String): String = {
    val h = bigramHist(text)
    if (h.isEmpty) "und"
    else profiles.toSeq
      .map { case (lang, p) => (lang, cosine(h, p)) }
      .sortBy { case (lang, score) => (-score, lang) }
      .head._1
  }

  /** DataFrame transformer: adds `pred_lang` from `textCol`. */
  def predict(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out: Dataset[(Long, String)] = df
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => (id, classify(text)) })
    out.toDF(idCol, "pred_lang")
  }
}
