package graft.tools

/** One-off generator for [[graft.BpeAssets]]: trains the committed
  * tokenizer (merges on the sf0.01 documents corpus, 40 merges) and
  * prints the Scala constant source. The committed constants are the
  * canonical asset — queries and the DuckDB oracle both derive from
  * them, so token ids are stable across scale factors and rounds.
  * Re-run + re-commit only when deliberately retraining. */
object GenBpeAssets {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(8)
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val merges = graft.operators.Bpe.fit(docs, "text", numMerges = 40)
    val chars = graft.operators.Bpe.baseChars(docs, "text")
    def esc(s: String) = s.flatMap {
      case '\\' => "\\\\"; case '"' => "\\\""; case c => c.toString
    }
    println("  val merges: Seq[(String, String)] = Seq(")
    println(merges.map { case (a, b) => s"""    ("${esc(a)}", "${esc(b)}")""" }
      .mkString(",\n"))
    println("  )")
    println("  val baseChars: Seq[String] = Seq(")
    println(chars.map(c => s""""${esc(c)}"""").grouped(12)
      .map(g => "    " + g.mkString(", ")).mkString(",\n"))
    println("  )")
    spark.stop()
  }
}
