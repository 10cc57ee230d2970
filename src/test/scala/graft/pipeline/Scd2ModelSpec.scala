package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Model-based check: chained [[Scd2]] batches must equal an independent
  * in-memory reference fold of the SCD2 semantics over randomized (but
  * seeded — reproducible) change sequences covering insert / update /
  * no-op / delete / rebirth interleavings that hand-written cases miss. */
class Scd2ModelSpec extends SparkSpec {
  import spark.implicits._

  private case class V(bal: Double, from: Int, to: Option[Int], current: Boolean)

  /** The reference model: fold one batch (unique per key) at time t. */
  private def modelApply(state: Map[Long, List[V]],
      batch: Map[Long, (Double, Boolean)], t: Int): Map[Long, List[V]] =
    batch.foldLeft(state) { case (st, (k, (bal, del))) =>
      val versions = st.getOrElse(k, Nil)
      val (cur, closed) = versions.partition(_.current)
      cur.headOption match {
        case Some(c) if del =>
          st.updated(k, closed :+ c.copy(to = Some(t), current = false))
        case None if del => st
        case Some(c) if c.bal == bal => st
        case Some(c) =>
          st.updated(k, closed :+ c.copy(to = Some(t), current = false)
            :+ V(bal, t, None, current = true))
        case None =>
          st.updated(k, closed :+ V(bal, t, None, current = true))
      }
    }

  private def tsOf(day: Int) = to_timestamp(lit(f"2020-01-${day + 1}%02d 00:00:00"))
  private def dayOf(ts: java.sql.Timestamp): Int =
    ((ts.getTime - java.sql.Timestamp.valueOf("2020-01-01 00:00:00").getTime) /
      86400000L).toInt

  test("chained batches equal the reference model over seeded random sequences") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val keys = 1L to 4L
      // initial load at day 0: a random subset of keys
      val initKeys = keys.filter(_ => rnd.nextBoolean())
      val initRows = initKeys.map(k => (k, rnd.nextInt(3) * 10.0))
      var model: Map[Long, List[V]] = initRows
        .map { case (k, b) => k -> List(V(b, 0, None, current = true)) }.toMap
      var dim =
        if (initRows.isEmpty)
          Scd2.init(Seq.empty[(Long, Double)].toDF("id", "bal"), tsOf(0))
        else Scd2.init(initRows.toDF("id", "bal"), tsOf(0))

      for (day <- 1 to 3) {
        val batch = keys.filter(_ => rnd.nextBoolean())
          .map(k => k -> (rnd.nextInt(3) * 10.0, rnd.nextInt(4) == 0)).toMap
        model = modelApply(model, batch, day)
        val batchDf = batch.toSeq.map { case (k, (b, d)) => (k, b, d) }
          .toDF("id", "bal", "del")
        dim = Scd2(dim, batchDf, "id", tsOf(day), deleteCol = Some("del"))
      }

      val got = dim.collect().map { r =>
        (r.getAs[Long]("id"), r.getAs[Double]("bal"),
          dayOf(r.getAs[java.sql.Timestamp](Scd2.ValidFrom)),
          Option(r.getAs[java.sql.Timestamp](Scd2.ValidTo)).map(dayOf),
          r.getAs[Boolean](Scd2.IsCurrent))
      }.toSet
      val want = model.toSeq.flatMap { case (k, vs) =>
        vs.map(v => (k, v.bal, v.from, v.to, v.current))
      }.toSet
      assert(got === want, s"seed $seed diverged:\n got=$got\nwant=$want")
    }
  }
}
