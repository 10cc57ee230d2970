package graft.sources

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Consistency check ("fsck") of a Delta table directory — the
  * operational audit a mirror operator runs before trusting a table that
  * object-store lifecycle rules, partial uploads, or a buggy writer may
  * have damaged. Complements [[DeltaImport]] (which REFUSES broken logs
  * loudly at read time) by turning each failure class into a counted
  * report row instead of the first exception.
  *
  * Reference scope: the reference trusts the Delta library to validate
  * its own tables (delta_handler.py reads unconditionally); this is the
  * independent check a bridge that hand-writes `_delta_log` owes its
  * consumers.
  *
  * Checks (one row each — `check`, `status` ok/fail/info, `n`):
  *  - `snapshot_replay`      — does the log replay to a snapshot at all
  *  - `protocol_supported`   — reader features beyond this bridge's set
  *  - `adds_resolvable`      — live add actions whose data file is MISSING
  *  - `add_size_match`       — live files whose on-disk size differs from
  *                             the add's recorded `size`
  *  - `dv_files_resolvable`  — deletion-vector descriptors whose DV file
  *                             is missing (inline DVs always resolve)
  *  - `last_checkpoint`      — `_last_checkpoint` names checkpoint files
  *                             that all exist (classic, multi-part, v2)
  *  - `unreferenced_data_files` — on-disk parquet no live add references
  *                             (VACUUM candidates / orphaned writes;
  *                             `info`, not corruption — history and
  *                             in-flight writers legitimately leave these)
  *
  * Cost model: every check except the last reads only log metadata +
  * per-file `getFileStatus` on the LIVE set (file-count-sized, the same
  * class as a snapshot read's planning). `unreferenced_data_files` lists
  * the data tree — the VACUUM cost class — and is skipped unless
  * `deep = true`. At 100 TB run deep fsck on the VACUUM schedule, not per
  * read. */
object DeltaFsck {

  def apply(spark: SparkSession, tablePath: String,
      deep: Boolean = true): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(tablePath)
    val fs = root.getFileSystem(conf)
    val rows = mutable.ArrayBuffer.empty[(String, String, Long)]

    val snap =
      try Right(DeltaImport.snapshot(spark, tablePath))
      catch { case scala.util.control.NonFatal(e) => Left(e) }
    rows += (("snapshot_replay", if (snap.isRight) "ok" else "fail",
      if (snap.isRight) 0L else 1L))

    snap match {
      case Left(_) => () // nothing below is meaningful on a dead log
      case Right(s) =>
        val unsupported = s.protocol.toSeq
          .filter(_.minReaderVersion >= 3)
          .flatMap(_.readerFeatures)
          .filterNot(DeltaImport.supportedReaderFeatures)
        rows += (("protocol_supported",
          if (unsupported.isEmpty) "ok" else "fail", unsupported.size.toLong))

        // Live adds: existence + recorded size (one getFileStatus per live
        // file — planning-cost, not data-cost).
        var missing = 0L
        var sizeMismatch = 0L
        val liveAbs = s.files.map { f =>
          val p = DeltaImport.resolveFile(tablePath, f.path)
          val st = try Some(fs.getFileStatus(p))
            catch { case _: java.io.FileNotFoundException => None }
          st match {
            case None => missing += 1
            case Some(x) if f.size > 0L && x.getLen != f.size => sizeMismatch += 1
            case _ => ()
          }
          p.toUri.getPath
        }.toSet
        rows += (("adds_resolvable", if (missing == 0L) "ok" else "fail", missing))
        rows += (("add_size_match",
          if (sizeMismatch == 0L) "ok" else "fail", sizeMismatch))

        // DV descriptors: every on-disk vector must resolve (inline "i"
        // descriptors carry their bytes in the action itself).
        val dvMissing = s.files.flatMap(_.deletionVector)
          .filter(_.storageType != "i")
          .map(d => DeltaDeletionVectors.filePathOf(d, tablePath))
          .count(p => !fs.exists(p)).toLong
        rows += (("dv_files_resolvable",
          if (dvMissing == 0L) "ok" else "fail", dvMissing))

        // _last_checkpoint: the files it promises must exist — a reader
        // that trusts a dangling pointer does a full-log replay at best
        // and fails at worst.
        val lcPath = new Path(root, "_delta_log/_last_checkpoint")
        val lcMissing: Long =
          if (!fs.exists(lcPath)) -1L // no checkpoint declared: fine
          else {
            val in = fs.open(lcPath)
            val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
            val j = JsonMethods.parse(txt)
            implicit val fmts: Formats = DefaultFormats
            val v = (j \ "version").extract[Long]
            val parts = (j \ "parts") match {
              case JInt(p) => Some(p.toInt)
              case _ => None
            }
            val named: Seq[Path] = (j \ "checkpointSchema", parts) match {
              case (_, Some(p)) => (1 to p).map(i => new Path(root,
                f"_delta_log/$v%020d.checkpoint.$i%010d.$p%010d.parquet"))
              case _ =>
                val classic = new Path(root,
                  f"_delta_log/$v%020d.checkpoint.parquet")
                if (fs.exists(classic)) Seq(classic)
                else {
                  // v2 policy: any `<v>.checkpoint.<uuid>.(json|parquet)`
                  val glob = fs.globStatus(new Path(root,
                    f"_delta_log/$v%020d.checkpoint.*"))
                  if (glob != null && glob.nonEmpty) Seq(glob.head.getPath)
                  else Seq(classic) // report the classic name as missing
                }
            }
            named.count(p => !fs.exists(p)).toLong
          }
        rows += (("last_checkpoint",
          if (lcMissing <= 0L) "ok" else "fail", math.max(lcMissing, 0L)))

        // Deep scan: parquet bytes on disk no live add references — the
        // VACUUM candidate set plus any orphaned partial writes. Listing
        // cost = the data tree (run on the maintenance schedule at scale).
        if (deep) {
          var unreferenced = 0L
          val it = fs.listFiles(root, true)
          while (it.hasNext) {
            val st = it.next()
            val p = st.getPath.toUri.getPath
            val rel = p.stripPrefix(root.toUri.getPath).stripPrefix("/")
            val inLog = rel.startsWith("_delta_log/")
            val isCdc = rel.startsWith("_change_data/")
            if (!inLog && !isCdc && rel.endsWith(".parquet") &&
                !liveAbs.contains(p))
              unreferenced += 1
          }
          rows += (("unreferenced_data_files", "info", unreferenced))
        }
    }
    rows.toSeq.toDF("check", "status", "n")
  }
}
