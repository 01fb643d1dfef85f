package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (local iteration
    // only — the driver always passes exactly two args, running the full set)
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER lets the multi-JVM sweep run the same gate set
    // under `local-cluster[2,8,4096]` — real separate executor JVMs, real
    // closure serialization, no shared driver heap (tools/cluster_sweep.py
    // compares its hashes against local[N]). Executors launched by the
    // local-cluster Worker need the app classes (extraClassPath) and the
    // JDK17 module opens (extraJavaOptions) the driver JVM already has.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // InferFiltersFromGenerate inlines whole generator expressions into
      // pre-Generate filters — for our shingle explodes that re-evaluates
      // an O(doc) expression tree per row, interpreted (measured 7×).
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster")) {
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar")
        .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
      builder
        .config("spark.executor.extraClassPath",
          new java.io.File("target/scala-2.13/classes").getAbsolutePath)
        .config("spark.executor.extraJavaOptions", addOpens)
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "3500m"))
      ()
    }
    // SPARK_GRAFT_SPECULATION=1: pathological speculative execution —
    // speculate a copy of EVERY task that runs at least as long as the
    // median (quantile 0, multiplier 1). Only meaningful under
    // local-cluster (the local-mode scheduler never starts the
    // speculation thread); used by tools/cluster_sweep.py --speculation
    // to prove the hash-deterministic operators are stable when duplicate
    // attempts race and the committer picks first-wins.
    if (sys.env.get("SPARK_GRAFT_SPECULATION").contains("1")) {
      builder.config("spark.speculation", "true")
        .config("spark.speculation.interval", "50ms")
        .config("spark.speculation.multiplier", "1.0")
        .config("spark.speculation.quantile", "0.0")
      ()
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    def deleteRecursively(p: java.io.File): Unit = {
      Option(p.listFiles).foreach(_.foreach(deleteRecursively))
      p.delete()
    }
    // SWEEP HYGIENE (the one red row in round 5 was a stale cross-SF
    // artifact, not a code bug — two sweeps at different SFs shared one
    // outdir and one query's result dir survived from the wrong SF):
    // 1. an exclusive file lock serializes concurrent sweeps on the same
    //    outdir (auto-released on JVM exit, so a crashed run never wedges);
    // 2. an _SFDIR marker records which sfDir the artifacts came from, and
    //    a mismatch wipes every stale result dir before this run writes;
    // 3. each query writes to a hidden tmp dir, then renames into place —
    //    a reader never sees a half-written result;
    // 4. (r7, reader side) an _SF.txt marker INSIDE each query's result
    //    dir — written into the tmp dir, so it travels with the atomic
    //    rename — lets a reader verify per-result provenance: tools/
    //    check.py takes the same lock SHARED and fails loudly if any
    //    result dir's _SF.txt disagrees with the sweep-level _SFDIR.txt
    //    or with the sfDir it is comparing against. A compare can then
    //    never silently mix SFs even if invoked mid-rewrite.
    val lockCh = java.nio.channels.FileChannel.open(
      Paths.get(s"$outDir/_LOCK"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val lock = lockCh.lock()
    val sfMarker = Paths.get(s"$outDir/_SFDIR.txt")
    val prevSf =
      if (Files.exists(sfMarker)) Files.readString(sfMarker).trim else sfDir
    if (prevSf != sfDir)
      Option(new java.io.File(outDir).listFiles).foreach(_.foreach { f =>
        if (f.isDirectory) deleteRecursively(f)
      })
    Files.writeString(sfMarker, sfDir + "\n")
    // a failed query must be LOUD: delete its (possibly stale) result dir
    // so the gate reports it MISSING → FAIL, and record it in a marker
    // file. Without the delete, a previous run's matching parquet would
    // mask the crash as PASS; without clearing the marker, a fixed run
    // would still read as failed.
    Files.deleteIfExists(Paths.get(s"$outDir/_FAILED.txt"))
    // Canonical result digest (r8 forensics — the r5-r7 red rows were
    // hash-only divergences visible solely in the driver's environment):
    // SHA-256 over the result rows with columns sorted by name, every cell
    // rendered environment-independently (ints as decimal strings, doubles
    // as %.17e, timestamps as epoch micros), rows sorted as their encoded
    // lines. _HASH.txt rides inside the atomic rename like _SF.txt, so a
    // red driver artifact now localizes: driver _HASH.txt == local
    // _HASH.txt ⇒ the SPARK side is identical and the driver's ORACLE
    // side moved; != ⇒ the Spark side itself diverges in that env.
    def canonCell(v: Any): String = v match {
      case null => "\u0000NULL"
      case d: java.lang.Double =>
        // Locale.ROOT: the f interpolator uses the default locale, so a
        // non-English driver JVM would emit ',' decimal separators and
        // every _HASH.txt would diverge from check.py's C-locale form.
        if (d.isNaN) "NaN" else if (d.isInfinite) (if (d > 0) "Inf" else "-Inf")
        else String.format(java.util.Locale.ROOT, "%.17e", d)
      case f: java.lang.Float => canonCell(java.lang.Double.valueOf(f.toDouble))
      case b: Array[Byte] => "0x" + b.map(x => f"$x%02x").mkString
      case d: java.sql.Date =>
        // epoch days, not toString: java.sql.Date.toString renders in the
        // JVM default timezone — tz-independent integer form instead,
        // mirrored by check.py canon_cell ("d" + days-since-epoch).
        "d" + d.toLocalDate.toEpochDay.toString
      case t: java.sql.Timestamp =>
        val i = t.toInstant
        (i.getEpochSecond * 1000000L + i.getNano / 1000L).toString
      case bd: java.math.BigDecimal => bd.stripTrailingZeros.toPlainString
      case bd: scala.math.BigDecimal =>
        bd.underlying.stripTrailingZeros.toPlainString
      case s: Seq[_] => s.map(canonCell).mkString("[", ",", "]")
      case m: scala.collection.Map[_, _] =>
        m.map { case (k, x) => canonCell(k) + "=" + canonCell(x) }
          .toSeq.sorted.mkString("{", ",", "}")
      case r: org.apache.spark.sql.Row =>
        r.toSeq.map(canonCell).mkString("(", ",", ")")
      case other => other.toString
    }
    def digest(parquetDir: String): String = {
      val df = spark.read.parquet(parquetDir)
      val cols = df.columns.sorted
      val lines = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toSeq.map(canonCell).mkString("\u0001"))
      java.util.Arrays.sort(lines, java.util.Comparator.naturalOrder[String]())
      val md = java.security.MessageDigest.getInstance("SHA-256")
      lines.foreach { l => md.update(l.getBytes("UTF-8")); md.update('\n'.toByte) }
      md.digest().map(b => f"$b%02x").mkString
    }
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val tmp = s"$outDir/.tmp_$name"
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(tmp)
        Files.writeString(Paths.get(s"$tmp/_SF.txt"), sfDir + "\n")
        deleteRecursively(new java.io.File(s"$outDir/$name"))
        try Files.move(Paths.get(tmp), Paths.get(s"$outDir/$name"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
          Files.move(Paths.get(tmp), Paths.get(s"$outDir/$name"))
        }
        // digest AFTER the rename: Spark's file index silently ignores
        // dot-prefixed (hidden) dirs, so reading the .tmp_ path yields
        // nothing. The marker lands moments after the move — a crash in
        // between leaves a result dir with _SF.txt but no _HASH.txt,
        // which check.py reports as 'absent' in forensics (never a
        // verdict change).
        // digest is FORENSICS, never the verdict (check.py treats an
        // absent _HASH.txt as 'absent', not a failure) — so a digest-only
        // crash (exotic type, OOM on the collect) must not turn an
        // otherwise-green gate red. Own try/catch: log and continue.
        try Files.writeString(Paths.get(s"$outDir/$name/_HASH.txt"),
          digest(s"$outDir/$name") + "\n")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name digest skipped: ${e.getMessage}")
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        deleteRecursively(new java.io.File(tmp))
        deleteRecursively(new java.io.File(s"$outDir/$name"))
        failures += name
      }
    }
    if (failures.nonEmpty)
      Files.writeString(Paths.get(s"$outDir/_FAILED.txt"),
        failures.mkString("\n") + "\n")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    lock.release(); lockCh.close()
    spark.stop()
  }
}
