package graft

/** Fresh-JVM single-query measurement — [[Bench]]'s second opinion for
  * >2× outliers. A contaminated suite sample (GC debt, page-cache
  * eviction, host contention mid-suite) does not reproduce in a clean
  * process; a real regression does.
  *
  * `main` protocol: args = (sfDir, queryName); warm-up at sf0.001, then
  * min-of-3 timed runs; prints exactly one line `BENCHONE <sec>`.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = Sessions.get("graft-bench-one")
    val fn = SparkEntry.queries(name)
    fn(spark, "/root/testdata/sf0.001").count() // warm codegen/classes
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    spark.stop()
    println(f"BENCHONE ${times.min}%.3f")
  }

  /** Launch [[main]] in a fresh JVM. Classpath = this class's location +
    * the Spark jars directory (sbt's own java.class.path is just the
    * launcher, so it cannot be inherited); JVM flags mirror build.sbt's
    * JDK-17 module opens. Returns None if the subprocess fails — the
    * caller then keeps the in-suite sample. */
  def inFreshJvm(sfDir: String, query: String,
                 timeoutSec: Long = 300L): Option[Double] =
    try {
      val classes = getClass.getProtectionDomain.getCodeSource
        .getLocation.toURI.getPath
      val sparkJars = sys.env.getOrElse("SPARK_JARS_DIR", "/opt/spark/jars")
      val javaExe = Paths.javaBin
      val opens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar")
        .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val cmd = Seq(javaExe) ++ opens ++ Seq(
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
        "-cp", s"$classes:$sparkJars/*",
        "graft.BenchOne", sfDir, query)
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      // drain stdout on a daemon thread: a blocking readAllBytes on this
      // thread would defeat the waitFor timeout when the subprocess hangs
      val buf = new java.io.ByteArrayOutputStream()
      val outRef = new java.util.concurrent.atomic.AtomicReference("")
      val reader = new Thread(() => {
        // transferTo appends as bytes arrive, so whatever drained before
        // a kill/IO error is preserved rather than discarded
        try p.getInputStream.transferTo(buf)
        catch { case _: Throwable => () }
        finally outRef.set(buf.toString("UTF-8"))
      })
      reader.setDaemon(true)
      reader.start()
      val done = p.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
      // kill BEFORE joining the reader: a hung subprocess keeps the pipe
      // open, so the reader can only reach EOF once the process dies
      if (!done) p.destroyForcibly()
      // bounded join on BOTH paths: even after a clean exit, a surviving
      // grandchild holding the inherited stdout fd keeps transferTo from
      // seeing EOF — an unbounded join would wedge the bench driver
      reader.join(5000)
      // if the join timed out (reader still draining / wedged on a
      // grandchild's fd), outRef was never set — fall back to a snapshot
      // of whatever has drained so far (ByteArrayOutputStream.toString is
      // synchronized, safe against the concurrent transferTo)
      val out =
        if (reader.isAlive) buf.toString("UTF-8") else outRef.get()
      if (!done) None
      else if (p.exitValue() != 0) None
      else """BENCHONE ([0-9.]+)""".r.findFirstMatchIn(out)
        .map(_.group(1).toDouble)
    } catch { case _: Throwable => None }

  private object Paths {
    def javaBin: String = {
      val home = System.getProperty("java.home")
      val cand = java.nio.file.Paths.get(home, "bin", "java")
      if (java.nio.file.Files.isExecutable(cand)) cand.toString else "java"
    }
  }
}
