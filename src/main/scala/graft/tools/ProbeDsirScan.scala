package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-shot probe backing the round-9 DSIR single-scan fix
  * (VERDICT r8 "What's wrong" #1): measures PHYSICAL file-input
  * records for the fixed importanceWeights against a replica of the
  * pre-fix shape that re-explodes the raw corpus for the corpus-level
  * counts. Plan-string counting is useless here (tree printouts
  * duplicate shared DAG subtrees), so the probe counts what the
  * executors actually read.
  *
  * Result (sf0.01, local[8]): the raw relation contributes half the
  * input records under the fixed shape — corpus counts now derive
  * from the per-doc counts' exchange (AQE stage reuse) instead of a
  * second explode over the dominant input.
  */
object ProbeDsirScan {

  private final class InputRecords extends SparkListener {
    val records = new AtomicLong(0L)
    val shuffleWritten = new AtomicLong(0L)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null) {
        records.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
        shuffleWritten.addAndGet(
          t.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
  }

  /** The pre-fix shape, kept verbatim for the A/B: raw is exploded
    * for docNg AND AGAIN for nR. */
  private def legacyWeights(raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String, alpha: Double): DataFrame = {
    import graft.operators.Dsir
    val m = Dsir.getClass.getDeclaredMethods
      .find(_.getName == "ngrams").get
    m.setAccessible(true)
    def ngrams(df: DataFrame) =
      m.invoke(Dsir, df, idCol, textCol).asInstanceOf[DataFrame]
    val docNg = ngrams(raw)
      .groupBy(col(idCol), col("ng")).agg(count(lit(1)).as("c"))
    val nR = ngrams(raw).groupBy(col("ng")).agg(count(lit(1)).as("n_r"))
    val nT = ngrams(target).groupBy(col("ng")).agg(count(lit(1)).as("n_t"))
    val vocab = nR.join(nT, Seq("ng"), "full_outer")
      .select(col("ng"),
        coalesce(col("n_r"), lit(0L)).as("n_r"),
        coalesce(col("n_t"), lit(0L)).as("n_t"))
    val totals = vocab.agg(
      sum(col("n_r")).as("tot_r"), sum(col("n_t")).as("tot_t"),
      count(lit(1)).as("v"))
    val model = vocab.crossJoin(broadcast(totals))
      .select(col("ng"),
        (log((col("n_t") + lit(alpha)) / (col("tot_t") + lit(alpha) * col("v")))
          - log((col("n_r") + lit(alpha)) / (col("tot_r") + lit(alpha) * col("v"))))
          .as("lr"))
    docNg.join(model, "ng")
      .groupBy(col(idCol))
      .agg(round(sum(col("c") * col("lr")), 6).as("log_w"))
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val docs = graft.sources.Tables.documents(spark, dir)
    val raw = docs.filter(col("lang") =!= "es")
    val target = docs.filter(col("lang") === "es")

    def measure(nm: String, mk: => DataFrame): Long = {
      val l = new InputRecords
      spark.sparkContext.addSparkListener(l)
      val rows = mk.collect().length
      Thread.sleep(2000) // listener bus drain
      spark.sparkContext.removeSparkListener(l)
      println(s"FORM=$nm rows=$rows inputRecords=${l.records.get} " +
        s"shuffleWritten=${l.shuffleWritten.get}")
      l.records.get
    }
    // warm-up so file listing / codegen doesn't skew the first run
    measure("warmup", graft.operators.Dsir.importanceWeights(raw, target))
    val fixed = measure("fixed",
      graft.operators.Dsir.importanceWeights(raw, target))
    val legacy = measure("legacy-double-explode",
      legacyWeights(raw, target, "doc_id", "text", 1.0))
    val fixedH = measure("fixed-hashed",
      graft.operators.Dsir.importanceWeightsHashed(raw, target))
    println(f"RATIO fileRecords legacy/fixed = ${legacy.toDouble / fixed}%.2f " +
      f"(hashed ${legacy.toDouble / fixedH}%.2f) — raw-side scans halved (4 of legacy's 6 are over raw)")
    spark.stop()
  }
}
