package graft.sim

/** GENERATED DuckDB oracle for semantic deduplication (q111), built from
  * the trained coarse-quantizer centroids the same way
  * [[graft.text.BpeOracle]] is built from the learned merge table: the
  * k×dim centroid matrix (kilobytes, deterministic) is embedded as SQL
  * literals and DuckDB re-derives the ENTIRE pipeline from scratch —
  * nearest-centroid assignment, within-cluster cosine pairs, and the
  * drop rule — so the oracle is independent of every Spark-side choice
  * except the trained centroids themselves.
  *
  * Bit-determinism argument: centroid components are doubles serialized
  * via shortest-roundtrip `Double.toString`, which DuckDB parses back to
  * the identical double; both engines then evaluate the same sequential
  * dot-product / sqrt / divide over the same doubles (the q28 exact-cosine
  * oracle already pins `list_inner_product` ≡ the engine's codegen'd
  * DotProduct bit-for-bit), and exact score ties break on centroid id on
  * both sides. */
object SemDedupOracle {

  /** `Double.toString` is shortest-roundtrip, so DuckDB's literal parser
    * recovers the identical IEEE double (scientific notation included). */
  private def fmt(d: Double): String = d.toString

  def sql(centroids: Seq[(Long, Seq[Double])], tau: Double): String = {
    val rows = centroids.sortBy(_._1).map { case (cid, v) =>
      s"(CAST($cid AS BIGINT), CAST([${v.map(fmt).mkString(", ")}] AS DOUBLE[]))"
    }.mkString(",\n    ")
    s"""WITH cent(cid, cv) AS (VALUES
       |    $rows),
       |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
       |scored AS (
       |  SELECT vec_id, cid,
       |    list_inner_product(vec, cv)
       |      / (sqrt(list_inner_product(vec, vec)) * sqrt(list_inner_product(cv, cv))) AS score
       |  FROM v CROSS JOIN cent),
       |asg AS (
       |  SELECT vec_id, cid AS centroid_id FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
       |    FROM scored) WHERE rn = 1),
       |m AS (SELECT a.vec_id, a.centroid_id, v.vec FROM asg a JOIN v USING (vec_id)),
       |dropped AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM m a JOIN m b ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
       |  WHERE list_inner_product(a.vec, b.vec)
       |    / (sqrt(list_inner_product(a.vec, a.vec)) * sqrt(list_inner_product(b.vec, b.vec)))
       |    >= ${fmt(tau)})
       |SELECT m.vec_id, m.centroid_id FROM m
       |WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.vec_id = m.vec_id)""".stripMargin
  }
}
