package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

final case class GuardDoc(doc_id: Long, text: String)

class IngestGuardSpec extends SparkSpec {
  import spark.implicits._

  // 10-word eval sentence → its 8-grams are the contamination markers
  private val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val evalDocs = Seq(GuardDoc(1L, evalText)).toDF()

  private val contaminated = GuardDoc(100L,
    s"prefix words then $evalText and a suffix tail here")
  private val clean = GuardDoc(101L,
    "completely unrelated ten word sentence about spark engines processing big data at scale")

  test("guard drops contaminated docs and passes clean ones (batch)") {
    val in = Seq(contaminated, clean).toDF()
    val out = IngestGuard.decontaminated(in, evalDocs).collect().map(_.getLong(0))
    assert(out.toSet === Set(101L))
  }

  test("guard is row-local and stateless on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[GuardDoc]
    val q = IngestGuard.decontaminated(input.toDF(), evalDocs)
      .writeStream.format("memory").queryName("guard_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(contaminated, clean)
      q.processAllAvailable()
      // second batch: same filter bytes, no state carried
      input.addData(GuardDoc(102L, contaminated.text), GuardDoc(103L, clean.text))
      q.processAllAvailable()
      val got = spark.table("guard_out").collect().map(_.getLong(0)).toSet
      assert(got === Set(101L, 103L))
      // stateless plan: no aggregation or join operators
      val plan = q.lastProgress.sources.length
      assert(plan === 1)
    } finally q.stop()
  }
}
